"""gradio `preview_every` path (reference gradio.py:93-207): per-step
spectrogram previews collected through the sampler callback. Tests the
interface-layer function directly (the gradio package itself is optional and
only needed by create_ui)."""

import jax
import numpy as np

from friendly_stable_audio_tools_tpu.interface import gradio as ui
from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config

TINY_CFG = {
    "model_type": "diffusion_cond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "pretransform": {
            "type": "autoencoder",
            "config": {
                "encoder": {"type": "oobleck", "config": {
                    "in_channels": 2, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
                    "latent_dim": 16, "use_snake": True}},
                "decoder": {"type": "oobleck", "config": {
                    "out_channels": 2, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
                    "latent_dim": 8, "use_snake": True}},
                "bottleneck": {"type": "vae"},
                "latent_dim": 8, "downsampling_ratio": 8, "io_channels": 2,
            },
        },
        "conditioning": {
            "configs": [
                {"id": "prompt", "type": "lut", "config": {"tokenizer_name": "t5-base", "max_length": 8}},
                {"id": "seconds_total", "type": "number", "config": {"min_val": 0, "max_val": 512}},
            ],
            "cond_dim": 16,
        },
        "diffusion": {
            "type": "dit",
            "cross_attention_cond_ids": ["prompt", "seconds_total"],
            "global_cond_ids": ["seconds_total"],
            "config": {
                "io_channels": 8, "embed_dim": 32, "depth": 2, "num_heads": 4,
                "cond_token_dim": 16, "global_cond_dim": 16,
                "transformer_type": "continuous_transformer", "global_cond_type": "prepend",
            },
        },
        "io_channels": 8,
    },
}


def test_generate_cond_preview_every():
    ui.load_model(model_config=TINY_CFG)
    res = ui.generate_cond("test tone", seconds_total=1, steps=6, preview_every=2,
                           cfg_scale=3.0, seed=0)
    assert isinstance(res, tuple) and len(res) == 2
    (sr, audio), previews = res
    assert sr == 16000
    assert audio.dtype == np.int16
    # steps where (i - 1) % 2 == 0 for i in 0..5 -> i in {1, 3, 5}
    assert len(previews) == 3
    for fig, label in previews:
        assert "sigma=" in label
    assert "Step 1" in previews[0][1]


def test_generate_cond_no_preview_returns_audio_only():
    ui.load_model(model_config=TINY_CFG)
    res = ui.generate_cond("test tone", seconds_total=1, steps=4, preview_every=None,
                           cfg_scale=3.0, seed=0)
    assert isinstance(res, tuple) and len(res) == 2
    sr, audio = res
    assert sr == 16000 and audio.dtype == np.int16


UNCOND_CFG = {
    "model_type": "diffusion_uncond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "pretransform": TINY_CFG["model"]["pretransform"],
        "type": "dit",
        "config": {
            "in_channels": 8, "embed_dim": 32, "depth": 2, "num_heads": 4,
            "transformer_type": "continuous_transformer",
        },
        "io_channels": 8,
    },
}


def test_generate_uncond_preview_every():
    """Uncond preview parity (reference gradio.py:210-306 takes
    preview_every; sigma defaults 0.03/1000 per :214-216)."""
    import inspect

    sig = inspect.signature(ui.generate_uncond)
    assert sig.parameters["sigma_min"].default == 0.03
    assert sig.parameters["sigma_max"].default == 1000

    ui.load_model(model_config=UNCOND_CFG)
    res = ui.generate_uncond(steps=6, preview_every=2, seed=0)
    assert isinstance(res, tuple) and len(res) == 2
    (sr, audio), previews = res
    assert sr == 16000 and audio.dtype == np.int16
    assert len(previews) == 3
    assert "Step 1" in previews[0][1] and "sigma=" in previews[0][1]

    # no preview -> plain audio tuple
    res = ui.generate_uncond(steps=4, seed=0)
    assert isinstance(res, tuple) and len(res) == 2
    sr, audio = res
    assert sr == 16000 and audio.dtype == np.int16
