"""Converter: torch-layout state dicts -> flax trees.

Validated two ways: (1) structural — converted trees slot into flax-init
params with zero mismatches for tiny models; (2) numeric — a hand-built
torch Sequential mirroring the reference Oobleck block produces identical
outputs through the converted JAX model.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import torch

from friendly_stable_audio_tools_tpu.utils.common import _flatten_dict
from friendly_stable_audio_tools_tpu.utils.torch_import import (
    convert_autoencoder_state_dict,
    convert_dit_state_dict,
    convert_t5_encoder,
)


def _wn(conv):
    return torch.nn.utils.weight_norm(conv)


class SnakeBeta(torch.nn.Module):
    def __init__(self, c):
        super().__init__()
        self.alpha = torch.nn.Parameter(torch.zeros(c))
        self.beta = torch.nn.Parameter(torch.zeros(c))

    def forward(self, x):
        a = torch.exp(self.alpha)[None, :, None]
        b = torch.exp(self.beta)[None, :, None]
        return x + (1.0 / (b + 1e-9)) * torch.sin(x * a) ** 2


def build_torch_oobleck_encoder(in_ch=2, channels=4, c_mults=(1, 2), strides=(2, 4), latent=8):
    """Mirror of the reference OobleckEncoder structure (autoencoders.py:119-153)
    for converter validation."""
    import math

    def residual_unit(c, d):
        return torch.nn.Sequential(
            SnakeBeta(c), _wn(torch.nn.Conv1d(c, c, 7, dilation=d, padding=(d * 6) // 2)),
            SnakeBeta(c), _wn(torch.nn.Conv1d(c, c, 1)),
        )

    class RU(torch.nn.Module):
        def __init__(self, c, d):
            super().__init__()
            self.layers = residual_unit(c, d)

        def forward(self, x):
            return x + self.layers(x)

    class Block(torch.nn.Module):
        def __init__(self, cin, cout, s):
            super().__init__()
            self.layers = torch.nn.Sequential(
                RU(cin, 1), RU(cin, 3), RU(cin, 9), SnakeBeta(cin),
                _wn(torch.nn.Conv1d(cin, cout, 2 * s, stride=s, padding=math.ceil(s / 2))),
            )

        def forward(self, x):
            return self.layers(x)

    cm = [1] + list(c_mults)
    layers = [_wn(torch.nn.Conv1d(in_ch, cm[0] * channels, 7, padding=3))]
    for i in range(len(cm) - 1):
        layers.append(Block(cm[i] * channels, cm[i + 1] * channels, strides[i]))
    layers += [SnakeBeta(cm[-1] * channels), _wn(torch.nn.Conv1d(cm[-1] * channels, latent, 3, padding=1))]

    class Enc(torch.nn.Module):
        def __init__(self):
            super().__init__()
            self.layers = torch.nn.Sequential(*layers)

        def forward(self, x):
            return self.layers(x)

    return Enc()


def test_oobleck_encoder_conversion_numerically_exact():
    torch.manual_seed(0)
    tenc = build_torch_oobleck_encoder()
    x = torch.randn(1, 2, 64)
    with torch.no_grad():
        ref = tenc(x).numpy()

    sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    converted = convert_autoencoder_state_dict(sd, n_enc_blocks=2, n_dec_blocks=0)

    from friendly_stable_audio_tools_tpu.models.autoencoders import OobleckEncoder

    jenc = OobleckEncoder(in_channels=2, channels=4, latent_dim=8, c_mults=(1, 2),
                          strides=(2, 4), use_snake=True)
    init = jenc.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 2)))["params"]
    # structural match
    init_keys = set(_flatten_dict(init))
    conv_keys = set(_flatten_dict(converted["encoder"]))
    assert init_keys == conv_keys, (sorted(init_keys - conv_keys), sorted(conv_keys - init_keys))

    got = jenc.apply({"params": jax.tree_util.tree_map(jnp.asarray, converted["encoder"])},
                     jnp.asarray(x.numpy().transpose(0, 2, 1)))
    np.testing.assert_allclose(np.asarray(got).transpose(0, 2, 1), ref, rtol=1e-4, atol=1e-4)


def test_dit_conversion_numeric_note():
    """The DiT converter's numeric end-to-end check lives in
    tests/test_transformer_torch_parity.py::test_dit_matches_torch_reference
    (it reuses that file's torch reference modules). This placeholder pins
    the import surface so a rename there fails loudly here too."""
    from friendly_stable_audio_tools_tpu.models.dit import DiffusionTransformer  # noqa: F401

    assert callable(convert_dit_state_dict)


@pytest.mark.parametrize("ff_proj", ["relu", "gated-gelu"])
def test_t5_conversion_numeric(ff_proj):
    """Tiny random-init HF T5EncoderModel -> convert_t5_encoder -> the native
    flax T5Encoder reproduces HF outputs (reference pairing:
    conditioners.py:261-346). Covers rescaled-attention absence (T5 attention
    is UNscaled), relative-position buckets, RMSNorm placement, and both FF
    variants (t5 relu / flan gated-gelu), with a padded attention mask."""
    from transformers import T5Config as HFT5Config
    from transformers import T5EncoderModel

    from friendly_stable_audio_tools_tpu.models.t5 import T5Config, T5Encoder

    hf_cfg = HFT5Config(
        vocab_size=100, d_model=16, d_kv=4, d_ff=32, num_layers=2,
        num_heads=4, feed_forward_proj=ff_proj, dropout_rate=0.0,
        relative_attention_num_buckets=8, relative_attention_max_distance=20,
    )
    torch.manual_seed(0)
    hf = T5EncoderModel(hf_cfg).eval()

    ids = torch.tensor([[5, 17, 42, 3, 0, 0], [9, 1, 2, 4, 8, 99]])
    mask = torch.tensor([[1, 1, 1, 1, 0, 0], [1, 1, 1, 1, 1, 1]])
    with torch.no_grad():
        ref = hf(input_ids=ids, attention_mask=mask).last_hidden_state.numpy()

    params = convert_t5_encoder({k: v.numpy() for k, v in hf.state_dict().items()})
    cfg = T5Config(vocab_size=100, d_model=16, d_kv=4, d_ff=32, num_layers=2,
                   num_heads=4, feed_forward_proj=ff_proj,
                   relative_attention_num_buckets=8, relative_attention_max_distance=20)
    enc = T5Encoder(cfg)
    init = enc.init(jax.random.PRNGKey(0), jnp.zeros((1, 4), jnp.int32))["params"]
    assert set(_flatten_dict(init)) == set(_flatten_dict(params))
    got = enc.apply({"params": jax.tree_util.tree_map(jnp.asarray, params)},
                    jnp.asarray(ids.numpy()),
                    attention_mask=jnp.asarray(mask.numpy()).astype(bool))
    valid = mask.numpy().astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], ref[valid], rtol=1e-4, atol=1e-4)


def test_convert_checkpoint_end_to_end(tmp_path):
    """convert_checkpoint: torch safetensors + model_config.json ->
    JAX safetensors whose encoder weights round-trip numerically."""
    from safetensors.numpy import save_file

    from friendly_stable_audio_tools_tpu.utils.torch_import import convert_checkpoint
    from friendly_stable_audio_tools_tpu.models.utils import load_ckpt_state_dict

    torch.manual_seed(1)
    tenc = build_torch_oobleck_encoder(in_ch=2, channels=4, c_mults=(1, 2), strides=(2, 4), latent=8)
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    torch_path = str(tmp_path / "model.safetensors")
    save_file(sd, torch_path)

    model_config = {
        "model_type": "autoencoder",
        "sample_size": 64,
        "sample_rate": 16000,
        "audio_channels": 2,
        "model": {
            "encoder": {"type": "oobleck", "config": {
                "in_channels": 2, "channels": 4, "c_mults": [1, 2], "strides": [2, 4],
                "latent_dim": 8, "use_snake": True}},
            "decoder": {"type": "oobleck", "config": {
                "out_channels": 2, "channels": 4, "c_mults": [1, 2], "strides": [2, 4],
                "latent_dim": 4, "use_snake": True}},
            "bottleneck": {"type": "vae"},
            "latent_dim": 4, "downsampling_ratio": 8, "io_channels": 2,
        },
        "training": {},
    }
    import json as _json
    cfg_path = str(tmp_path / "model_config.json")
    with open(cfg_path, "w") as f:
        _json.dump(model_config, f)

    out_path = str(tmp_path / "model.jax.safetensors")
    convert_checkpoint(torch_path, cfg_path, out_path)

    flat = load_ckpt_state_dict(out_path)
    # encoder conv_in weight-norm v must match the torch tensor exactly
    v_torch = sd["encoder.layers.0.weight_v"].transpose(2, 1, 0)
    np.testing.assert_array_equal(flat["encoder/conv_in/v"], v_torch)
    # decoder keys exist (left at init since the sd had no decoder)
    assert any(k.startswith("decoder/") for k in flat)
