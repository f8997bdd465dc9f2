"""torch->JAX conversion for the LM and Dance Diffusion model types.

Synthetic state dicts are built with the reference's torch naming
(lm.py:38-102 / diffusion.py:376-479 + blocks.py:14-76 nested SkipBlock
layout) and must convert onto the flax init trees exactly (paths + shapes).
"""

import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, "tests")

from friendly_stable_audio_tools_tpu.utils.torch_import import (  # noqa: E402
    convert_dance_unet_state_dict, convert_lm_state_dict,
)

RNG = np.random.RandomState(0)


def _flat(tree):
    return {"/".join(map(str, p)): np.asarray(v).shape
            for p, v in jax.tree_util.tree_flatten_with_path(tree)[0]}


def _linear(sd, key, out_f, in_f, bias=False):
    sd[f"{key}.weight"] = RNG.randn(out_f, in_f).astype(np.float32)
    if bias:
        sd[f"{key}.bias"] = RNG.randn(out_f).astype(np.float32)


# ---------------------------------------------------------------------------
# LM
# ---------------------------------------------------------------------------


def make_lm_state_dict(dim=32, depth=2, cond_dim=16, n_q=2, codebook_size=32):
    sd = {}
    for i in range(n_q):
        sd[f"lm.embeddings.{i}.weight"] = RNG.randn(codebook_size + 1, dim).astype(np.float32)
        _linear(sd, f"lm.quantizer_heads.{i}", codebook_size, dim, bias=True)
    p = "lm.backbone.model"
    _linear(sd, f"{p}.project_in", dim, dim)
    _linear(sd, f"{p}.project_out", dim, dim)
    for l in range(depth):
        lp = f"{p}.layers.{l}"
        sd[f"{lp}.pre_norm.gamma"] = RNG.randn(dim).astype(np.float32)
        _linear(sd, f"{lp}.self_attn.to_qkv", dim * 3, dim)
        _linear(sd, f"{lp}.self_attn.to_out", dim, dim)
        sd[f"{lp}.cross_attend_norm.gamma"] = RNG.randn(dim).astype(np.float32)
        _linear(sd, f"{lp}.cross_attn.to_q", dim, dim)
        _linear(sd, f"{lp}.cross_attn.to_kv", dim, cond_dim)
        _linear(sd, f"{lp}.cross_attn.to_out", dim, dim)
        sd[f"{lp}.ff_norm.gamma"] = RNG.randn(dim).astype(np.float32)
        _linear(sd, f"{lp}.ff.ff.0.proj", dim * 8, dim, bias=True)
        _linear(sd, f"{lp}.ff.ff.2", dim, dim * 4, bias=True)
    return sd


def test_lm_converter_matches_init_tree():
    from test_lm import TINY_LM_CONFIG
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config

    model = create_model_from_config(TINY_LM_CONFIG, init_rng=jax.random.PRNGKey(0))
    converted = convert_lm_state_dict(make_lm_state_dict())
    fr, fg = _flat(model.params), _flat(converted)
    assert fr.keys() == fg.keys(), (
        sorted(set(fr) - set(fg))[:6], sorted(set(fg) - set(fr))[:6])
    for k in fr:
        assert fr[k] == fg[k], (k, fr[k], fg[k])


def test_lm_torch_import_end_to_end(tmp_path, monkeypatch):
    """load_torch_checkpoint_into_model(model_type=lm) through npz."""
    # synthetic checkpoint: the hash-fallback tokenizer is fine here
    monkeypatch.setenv("FSAT_ALLOW_FALLBACK_TOKENIZER", "1")
    from test_lm import TINY_LM_CONFIG
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.utils.torch_import import (
        load_torch_checkpoint_into_model,
    )

    model = create_model_from_config(TINY_LM_CONFIG, init_rng=jax.random.PRNGKey(0))
    sd = make_lm_state_dict()
    # trainable LUT conditioner params live in reference LM checkpoints
    # (conditioners.py:408-468): token_embedder under conditioner.conditioners
    lut = model.conditioner.conditioners["prompt"]
    vocab, dim = np.asarray(lut.params["token_embedder"]["embedding"]).shape
    sd["conditioner.conditioners.prompt.token_embedder.weight"] = (
        RNG.randn(vocab, dim).astype(np.float32))
    np.savez(tmp_path / "lm.npz", **sd)
    load_torch_checkpoint_into_model(model, str(tmp_path / "lm.npz"), TINY_LM_CONFIG)
    got = np.asarray(model.params["embed0"]["embedding"])
    np.testing.assert_allclose(got, sd["lm.embeddings.0.weight"])
    got_head = np.asarray(model.params["head1"]["kernel"])
    np.testing.assert_allclose(got_head, sd["lm.quantizer_heads.1.weight"].T)
    got_lut = np.asarray(lut.params["token_embedder"]["embedding"])
    np.testing.assert_allclose(
        got_lut, sd["conditioner.conditioners.prompt.token_embedder.weight"])


# ---------------------------------------------------------------------------
# Dance Diffusion U-Net
# ---------------------------------------------------------------------------

DD = dict(io_channels=2, depth=3, n_attn_layers=1, channels=(32, 32, 64),
          strides=(2, 2), use_snake=True)


def _dd_conv(sd, key, out_c, in_c, k, bias=True):
    sd[f"{key}.weight"] = RNG.randn(out_c, in_c, k).astype(np.float32)
    if bias:
        sd[f"{key}.bias"] = RNG.randn(out_c).astype(np.float32)


def _dd_resconv(sd, key, c_in, c_mid, c_out, is_last=False, k=5):
    _dd_conv(sd, f"{key}.main.0", c_mid, c_in, k)
    sd[f"{key}.main.1.weight"] = RNG.randn(c_mid).astype(np.float32)
    sd[f"{key}.main.1.bias"] = RNG.randn(c_mid).astype(np.float32)
    sd[f"{key}.main.2.alpha"] = RNG.randn(1, c_mid, 1).astype(np.float32)
    _dd_conv(sd, f"{key}.main.3", c_out, c_mid, k)
    if not is_last:
        sd[f"{key}.main.4.weight"] = RNG.randn(c_out).astype(np.float32)
        sd[f"{key}.main.4.bias"] = RNG.randn(c_out).astype(np.float32)
        sd[f"{key}.main.5.alpha"] = RNG.randn(1, c_out, 1).astype(np.float32)
    if c_in != c_out:
        _dd_conv(sd, f"{key}.skip", c_out, c_in, 1, bias=False)


def _dd_attn(sd, key, c):
    sd[f"{key}.norm.weight"] = RNG.randn(c).astype(np.float32)
    sd[f"{key}.norm.bias"] = RNG.randn(c).astype(np.float32)
    _dd_conv(sd, f"{key}.qkv_proj", c * 3, c, 1)
    _dd_conv(sd, f"{key}.out_proj", c, c, 1)


def make_dance_unet_state_dict(prefix="model.model.", cond_dim=0):
    """Torch DiffusionAttnUnet1D(depth=3, channels=(32,32,64), n_attn=1,
    use_snake): net = [in0,in1,in2, SkipBlock(level2), out0,out1,out2];
    SkipBlock.main = [down, in0,a0,in1,a1,in2,a2, inner, out0,a3,out1,a4,
    out2,a5, up] (attn at levels >= depth-n_attn = 2)."""
    io, chans = 2, DD["channels"]
    sd = {f"{prefix}timestep_embed.weight": RNG.randn(8, 1).astype(np.float32)}
    p = f"{prefix}net"
    c = chans[0]
    in_c = io + cond_dim + 16
    _dd_resconv(sd, f"{p}.0", in_c, c, c)
    _dd_resconv(sd, f"{p}.1", c, c, c)
    _dd_resconv(sd, f"{p}.2", c, c, c)
    _dd_resconv(sd, f"{p}.4", c * 2, c, c)
    _dd_resconv(sd, f"{p}.5", c, c, c)
    _dd_resconv(sd, f"{p}.6", c, c, io, is_last=True)
    for lvl, tp_ in ((2, f"{p}.3.main"), (3, f"{p}.3.main.7.main")):
        c = chans[lvl - 1]
        c_prev = chans[lvl - 2]
        # cubic resample (learned_resample=False): main.0/main.14 have no params
        _dd_resconv(sd, f"{tp_}.1", c_prev, c, c)
        _dd_attn(sd, f"{tp_}.2", c)
        _dd_resconv(sd, f"{tp_}.3", c, c, c)
        _dd_attn(sd, f"{tp_}.4", c)
        _dd_resconv(sd, f"{tp_}.5", c, c, c)
        _dd_attn(sd, f"{tp_}.6", c)
        _dd_resconv(sd, f"{tp_}.8", c * 2, c, c)
        _dd_attn(sd, f"{tp_}.9", c)
        _dd_resconv(sd, f"{tp_}.10", c, c, c)
        _dd_attn(sd, f"{tp_}.11", c)
        _dd_resconv(sd, f"{tp_}.12", c, c, c_prev)
        _dd_attn(sd, f"{tp_}.13", c_prev)
    return sd


def test_dance_unet_converter_matches_init_tree():
    from friendly_stable_audio_tools_tpu.models.dance_diffusion import (
        DiffusionAttnUnet1D,
    )

    import jax.numpy as jnp

    net = DiffusionAttnUnet1D(**DD)
    ref = net.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 2)),
                   jnp.zeros((1,)))["params"]
    converted = convert_dance_unet_state_dict(
        make_dance_unet_state_dict(), "model.model.", depth=DD["depth"])
    fr, fg = _flat(ref), _flat(converted)
    assert fr.keys() == fg.keys(), (
        sorted(set(fr) - set(fg))[:8], sorted(set(fg) - set(fr))[:8])
    for k in fr:
        assert fr[k] == fg[k], (k, fr[k], fg[k])


@pytest.mark.slow
def test_diffae_torch_import():
    """load_torch_checkpoint_into_model(model_type=diffusion_autoencoder):
    oobleck encoder + DAU1d diffusion decoder (reference autoencoders.py:
    648-690 naming: encoder.* / diffusion.model.*)."""
    from test_torch_import import build_torch_oobleck_encoder
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.utils.torch_import import (
        load_torch_checkpoint_into_model,
    )
    import tempfile, os

    config = {
        "model_type": "diffusion_autoencoder",
        "sample_size": 256,
        "sample_rate": 16000,
        "audio_channels": 2,
        "model": {
            "encoder": {"type": "oobleck", "config": {
                "in_channels": 2, "channels": 4, "c_mults": [1, 2],
                "strides": [2, 4], "latent_dim": 8}},
            "diffusion": {"type": "DAU1d", "config": {
                "io_channels": 2, "depth": 3, "n_attn_layers": 1,
                "channels": [32, 32, 64], "strides": [2, 2],
                "cond_dim": 8, "use_snake": True}},
            "latent_dim": 8,
            "downsampling_ratio": 8,
            "io_channels": 2,
        },
    }
    model = create_model_from_config(config, init_rng=jax.random.PRNGKey(0))

    tenc = build_torch_oobleck_encoder(in_ch=2, channels=4, c_mults=(1, 2),
                                       strides=(2, 4), latent=8)
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    sd.update(make_dance_unet_state_dict(prefix="diffusion.model.", cond_dim=8))

    with tempfile.TemporaryDirectory() as td:
        path = os.path.join(td, "diffae.npz")
        np.savez(path, **sd)
        load_torch_checkpoint_into_model(model, path, config)

    got = np.asarray(model.diffusion.params["timestep_embed"]["weight"])
    np.testing.assert_allclose(got, sd["diffusion.model.timestep_embed.weight"])
    got_enc = np.asarray(model.params["encoder"]["conv_in"]["bias"])
    np.testing.assert_allclose(got_enc, sd["encoder.layers.0.bias"], rtol=1e-6)
