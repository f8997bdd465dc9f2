"""Pretrained DAC codec: architecture, converter, and pretransform plumbing.

The converter is validated structurally: a synthetic state dict is built with
the descript-audio-codec key naming/shapes (dac.model.dac.DAC, the model the
reference loads at pretransforms.py:136-195), converted, and required to match
the flax init tree exactly (same paths, same shapes). The weight-norm folding
and layout transposes themselves are covered numerically by the Oobleck
converter tests (same helpers).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from friendly_stable_audio_tools_tpu.models.dac_codec import DACCodec
from friendly_stable_audio_tools_tpu.utils.torch_import import (
    convert_dac_codec_state_dict,
)

RNG = np.random.RandomState(0)


def _wn_conv(sd, prefix, out_ch, in_ch, k, transposed=False):
    if transposed:  # torch ConvTranspose1d: (in, out, k); weight_norm dim=0 -> g (in,1,1)
        sd[f"{prefix}.weight_v"] = RNG.randn(in_ch, out_ch, k).astype(np.float32)
        sd[f"{prefix}.weight_g"] = np.abs(RNG.randn(in_ch, 1, 1)).astype(np.float32) + 0.5
    else:  # Conv1d: (out, in, k); g (out,1,1)
        sd[f"{prefix}.weight_v"] = RNG.randn(out_ch, in_ch, k).astype(np.float32)
        sd[f"{prefix}.weight_g"] = np.abs(RNG.randn(out_ch, 1, 1)).astype(np.float32) + 0.5
    sd[f"{prefix}.bias"] = RNG.randn(out_ch).astype(np.float32) * 0.01


def _snake(sd, prefix, ch):
    sd[f"{prefix}.alpha"] = np.abs(RNG.randn(1, ch, 1)).astype(np.float32) + 0.5


def _residual_unit(sd, prefix, dim, dilation):
    _snake(sd, f"{prefix}.block.0", dim)
    _wn_conv(sd, f"{prefix}.block.1", dim, dim, 7)
    _snake(sd, f"{prefix}.block.2", dim)
    _wn_conv(sd, f"{prefix}.block.3", dim, dim, 1)


def make_descript_state_dict(encoder_dim=64, encoder_rates=(2, 4, 5, 8),
                             decoder_dim=1536, decoder_rates=(8, 5, 4, 2),
                             n_codebooks=12, codebook_size=1024, codebook_dim=8):
    """Random weights under the descript-audio-codec state-dict naming."""
    sd = {}
    # --- encoder: block = [WNConv1d, EncoderBlock*, Snake1d, WNConv1d]
    d = encoder_dim
    _wn_conv(sd, "encoder.block.0", d, 1, 7)
    for i, stride in enumerate(encoder_rates):
        d *= 2
        bp = f"encoder.block.{1 + i}.block"
        for j, dil in enumerate((1, 3, 9)):
            _residual_unit(sd, f"{bp}.{j}", d // 2, dil)
        _snake(sd, f"{bp}.3", d // 2)
        _wn_conv(sd, f"{bp}.4", d, d // 2, 2 * stride)
    latent_dim = d
    _snake(sd, f"encoder.block.{1 + len(encoder_rates)}", d)
    _wn_conv(sd, f"encoder.block.{2 + len(encoder_rates)}", latent_dim, d, 3)

    # --- quantizer
    for i in range(n_codebooks):
        qp = f"quantizer.quantizers.{i}"
        _wn_conv(sd, f"{qp}.in_proj", codebook_dim, latent_dim, 1)
        _wn_conv(sd, f"{qp}.out_proj", latent_dim, codebook_dim, 1)
        sd[f"{qp}.codebook.weight"] = RNG.randn(codebook_size, codebook_dim).astype(np.float32)

    # --- decoder: model = [WNConv1d, DecoderBlock*, Snake1d, WNConv1d, Tanh]
    _wn_conv(sd, "decoder.model.0", decoder_dim, latent_dim, 7)
    ch = decoder_dim
    for i, rate in enumerate(decoder_rates):
        bp = f"decoder.model.{1 + i}.block"
        _snake(sd, f"{bp}.0", ch)
        _wn_conv(sd, f"{bp}.1", ch // 2, ch, 2 * rate, transposed=True)
        for j, dil in enumerate((1, 3, 9)):
            _residual_unit(sd, f"{bp}.{2 + j}", ch // 2, dil)
        ch //= 2
    _snake(sd, f"decoder.model.{1 + len(decoder_rates)}", ch)
    _wn_conv(sd, f"decoder.model.{2 + len(decoder_rates)}", 1, ch, 7)
    return sd


@pytest.fixture(scope="module")
def codec_and_params():
    codec = DACCodec("16khz", "8kbps")
    sd = make_descript_state_dict()
    params = convert_dac_codec_state_dict(sd, n_blocks=4)
    return codec, params


@pytest.mark.slow
def test_converter_tree_matches_init_exactly(codec_and_params):
    codec, params = codec_and_params
    ref = DACCodec("16khz", "8kbps").init(jax.random.PRNGKey(0))
    flat_ref = {"/".join(p for p in map(str, path)): v.shape
                for path, v in jax.tree_util.tree_flatten_with_path(ref)[0]}
    flat_got = {"/".join(p for p in map(str, path)): np.asarray(v).shape
                for path, v in jax.tree_util.tree_flatten_with_path(params)[0]}
    assert flat_ref.keys() == flat_got.keys(), (
        sorted(set(flat_ref) - set(flat_got))[:5], sorted(set(flat_got) - set(flat_ref))[:5])
    for k in flat_ref:
        assert flat_ref[k] == flat_got[k], (k, flat_ref[k], flat_got[k])


def test_roundtrip_shapes_and_finite(codec_and_params):
    codec, params = codec_and_params
    codec.params = jax.tree_util.tree_map(jnp.asarray, params)
    x = jnp.asarray(RNG.randn(1, 640 * 2, 1), jnp.float32) * 0.1

    latents = codec.encode_nwc(x)
    assert latents.shape == (1, 1280 // 320, 1024)
    codes = codec.tokenize_nwc(x)
    assert codes.shape == (1, 1280 // 320, 12)
    assert int(codes.max()) < 1024 and int(codes.min()) >= 0
    # torch ConvTranspose1d with rate 5 gives (L-1)*5 - 2*ceil(5/2) + 10 = 5L-1
    # per stage, so the 16khz decoder is 8 samples short of L*320 — faithful to
    # dac.model.dac.Decoder (descript trims in decompress())
    audio = codec.decode_nwc(codec.from_codes_nwc(codes))
    assert audio.shape == (1, 1272, 1)
    assert np.isfinite(np.asarray(audio)).all()


def test_quantizer_cosine_assignment_dequantizes_raw_entries():
    """DAC assignment is on L2-normalized vectors but dequantize returns the
    raw codebook entry (dac.nn.quantize.VectorQuantize.decode_latents)."""
    from friendly_stable_audio_tools_tpu.models.bottleneck import VectorQuantizer

    vq = VectorQuantizer(input_dim=4, codebook_size=8, codebook_dim=4, normalize=True)
    params = vq.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 4)))
    cb = np.asarray(params["params"]["codebook"])

    # a vector that is a scaled copy of codebook entry 5: cosine assignment
    # must pick entry 5 regardless of magnitude, and return cb[5] exactly
    x = jnp.asarray(cb[5] * 7.0)[None, None, :]
    out, codes, _, _ = vq.apply(params, x)
    assert int(codes[0, 0]) == 5
    np.testing.assert_allclose(np.asarray(out[0, 0]), cb[5], rtol=1e-5)


@pytest.mark.slow
def test_pretransform_dac_pretrained(tmp_path):
    """PretrainedDACPretransform: factory construction, checkpoint load via
    local_path, [B, C, T] tokenize/decode_tokens parity surface."""
    from safetensors.numpy import save_file

    from friendly_stable_audio_tools_tpu.models.factory import (
        create_pretransform_from_config,
    )
    from friendly_stable_audio_tools_tpu.utils.common import _flatten_dict

    params = convert_dac_codec_state_dict(make_descript_state_dict(), n_blocks=4)
    ckpt = tmp_path / "dac_16khz.jax.safetensors"
    save_file({k: np.ascontiguousarray(v) for k, v in _flatten_dict(params).items()},
              str(ckpt))

    pt = create_pretransform_from_config(
        {"type": "dac_pretrained",
         "config": {"model_type": "16khz", "model_bitrate": "8kbps",
                    "local_path": str(ckpt)}},
        sample_rate=16000,
    )
    assert pt.is_discrete and pt.downsampling_ratio == 320
    assert pt.encoded_channels == 1024 and pt.num_quantizers == 12

    x = jnp.asarray(RNG.randn(2, 1, 640), jnp.float32) * 0.1
    z = pt.encode(x)
    assert z.shape == (2, 1024, 2)
    y = pt.decode(z)
    assert y.shape == (2, 1, 632)  # odd-rate transposed convs (see above)
    tokens = pt.tokenize(x)
    assert tokens.shape == (2, 12, 2)
    audio = pt.decode_tokens(tokens)
    assert audio.shape == (2, 1, 632)
    assert np.isfinite(np.asarray(audio)).all()
