"""EnCodec codec: numerical parity vs HuggingFace transformers.EncodecModel.

This is a true cross-implementation test: a randomly-initialized HF
EncodecModel (the torch port of the codec the reference loads via audiocraft,
pretransforms.py:198-254) is converted with convert_encodec_state_dict and the
native JAX codec must reproduce its encoder embeddings, RVQ codes, and decoded
audio on CPU.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from friendly_stable_audio_tools_tpu.models.encodec_codec import (  # noqa: E402
    EncodecCodec, EncodecCodecModule,
)
from friendly_stable_audio_tools_tpu.utils.torch_import import (  # noqa: E402
    convert_encodec_state_dict,
)

SMALL_CFG = dict(
    audio_channels=1, num_filters=8, hidden_size=16,
    upsampling_ratios=(4, 2), codebook_size=32, num_quantizers=2,
    kernel_size=7, last_kernel_size=7, residual_kernel_size=3,
    num_residual_layers=1, dilation_growth_rate=2, compress=2,
    num_lstm_layers=2, use_conv_shortcut=False, causal=False,
    pad_mode="reflect", sampling_rate=16000,
)


@pytest.fixture(scope="module")
def hf_and_jax():
    from transformers import EncodecConfig, EncodecModel

    torch.manual_seed(0)
    # num_quantizers is a derived property: 1000*bw // (frame_rate * nbits)
    # = 1000*20 // (2000 * 5) = 2
    config = EncodecConfig(
        audio_channels=1, num_filters=8, hidden_size=16, codebook_size=32,
        upsampling_ratios=[4, 2], num_residual_layers=1,
        residual_kernel_size=3, dilation_growth_rate=2, compress=2,
        kernel_size=7, last_kernel_size=7, num_lstm_layers=2,
        use_causal_conv=False, use_conv_shortcut=False, pad_mode="reflect",
        norm_type="weight_norm", sampling_rate=16000, normalize=False,
        target_bandwidths=[20.0],
    )
    assert config.num_quantizers == 2
    hf = EncodecModel(config).eval()
    # HF initializes codebooks to zeros (EncodecEuclideanCodebook); give them
    # real entries so assignment is meaningful
    with torch.no_grad():
        for layer in hf.quantizer.layers:
            layer.codebook.embed.normal_()
    sd = {k: v for k, v in hf.state_dict().items()}

    params = convert_encodec_state_dict(sd, SMALL_CFG)
    module = EncodecCodecModule(SMALL_CFG)
    return hf, module, jax.tree_util.tree_map(jnp.asarray, {"params": params})


@pytest.mark.slow
def test_converter_tree_matches_init(hf_and_jax):
    _, module, variables = hf_and_jax
    ref = module.init(jax.random.PRNGKey(0), jnp.zeros((1, 16, 1)))
    flat = lambda t: {
        "/".join(map(str, p)): np.asarray(v).shape
        for p, v in jax.tree_util.tree_flatten_with_path(t)[0]
    }
    fr, fg = flat(ref), flat(variables)
    assert fr.keys() == fg.keys(), (
        sorted(set(fr) - set(fg))[:6], sorted(set(fg) - set(fr))[:6])
    for k in fr:
        assert fr[k] == fg[k], (k, fr[k], fg[k])


def test_encoder_embeddings_match(hf_and_jax):
    hf, module, variables = hf_and_jax
    rng = np.random.RandomState(1)
    x = rng.randn(2, 1, 64).astype(np.float32) * 0.3

    with torch.no_grad():
        ref = hf.encoder(torch.from_numpy(x)).numpy()  # [B, C, L]
    got = module.apply(variables, jnp.asarray(x.transpose(0, 2, 1)), method="encode")
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref,
                               atol=1e-4, rtol=1e-4)


def test_codes_and_decode_match(hf_and_jax):
    hf, module, variables = hf_and_jax
    rng = np.random.RandomState(2)
    x = rng.randn(1, 1, 64).astype(np.float32) * 0.3

    with torch.no_grad():
        emb = hf.encoder(torch.from_numpy(x))
        ref_codes = hf.quantizer.encode(emb)  # [Q, B, L]
        ref_audio = hf.decoder(hf.quantizer.decode(ref_codes)).numpy()

    got_codes = module.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                             method="tokenize")  # [B, L, Q]
    np.testing.assert_array_equal(
        np.asarray(got_codes).transpose(2, 0, 1), ref_codes.numpy())

    z = module.apply(variables, got_codes, method="from_codes")
    got_audio = module.apply(variables, z, method="decode")
    np.testing.assert_allclose(np.asarray(got_audio).transpose(0, 2, 1), ref_audio,
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_pretransform_audiocraft(tmp_path):
    """Factory + local_path loading + [B, Q, L] token layout, full-size preset."""
    from safetensors.numpy import save_file

    from friendly_stable_audio_tools_tpu.models.factory import (
        create_pretransform_from_config,
    )
    from friendly_stable_audio_tools_tpu.utils.common import _flatten_dict

    codec = EncodecCodec("facebook/encodec_32khz")
    params = codec.init(jax.random.PRNGKey(0))
    ckpt = tmp_path / "encodec_32khz.jax.safetensors"
    save_file({k: np.ascontiguousarray(np.asarray(v))
               for k, v in _flatten_dict(params).items()}, str(ckpt))

    pt = create_pretransform_from_config(
        {"type": "audiocraft_pretrained",
         "config": {"model_type": "facebook/encodec_32khz",
                    "local_path": str(ckpt)}},
        sample_rate=32000,
    )
    assert pt.is_discrete and pt.downsampling_ratio == 640
    assert pt.num_quantizers == 4 and pt.codebook_size == 2048

    x = jnp.zeros((1, 1, 1280), jnp.float32)
    tokens = pt.tokenize(x)
    assert tokens.shape == (1, 4, 2)
    audio = pt.decode_tokens(tokens)
    assert audio.shape[0] == 1 and audio.shape[1] == 1
    assert np.isfinite(np.asarray(audio)).all()

    with pytest.raises(AssertionError):
        pt.encode(x)
