"""End-to-end latent diffusion generation through the config-driven factory."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
from friendly_stable_audio_tools_tpu.inference.generation import (
    generate_diffusion_cond,
    generate_diffusion_uncond,
    build_mask,
)

TINY_VAE = {
    "encoder": {
        "type": "oobleck",
        "config": {
            "in_channels": 2, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
            "latent_dim": 16, "use_snake": True,
        },
    },
    "decoder": {
        "type": "oobleck",
        "config": {
            "out_channels": 2, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
            "latent_dim": 8, "use_snake": True,
        },
    },
    "bottleneck": {"type": "vae"},
    "latent_dim": 8,
    "downsampling_ratio": 8,
    "io_channels": 2,
}

TINY_COND_CONFIG = {
    "model_type": "diffusion_cond",
    "sample_size": 1024,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "pretransform": {"type": "autoencoder", "config": TINY_VAE},
        "conditioning": {
            "configs": [
                {"id": "prompt", "type": "lut",
                 "config": {"tokenizer_name": "t5-base", "max_length": 8}},
                {"id": "seconds_total", "type": "number",
                 "config": {"min_val": 0, "max_val": 512}},
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
                "project_cond_tokens": True, "project_global_cond": True,
                "transformer_type": "continuous_transformer",
                "global_cond_type": "prepend",
            },
        },
        "io_channels": 8,
    },
}


@pytest.fixture(scope="module")
def cond_model():
    return create_model_from_config(TINY_COND_CONFIG, init_rng=jax.random.PRNGKey(0))


def test_factory_builds_cond_model(cond_model):
    assert cond_model.io_channels == 8
    assert cond_model.pretransform.downsampling_ratio == 8
    assert cond_model.min_input_length == 8


CONDITIONING = [
    {"prompt": "warm synth pad", "seconds_total": 10},
    {"prompt": "drum loop", "seconds_total": 5},
]


# sampler MATH is covered fast by test_sampler_golden/_torch_crosscheck;
# this parametrization checks generation-path integration, so the exotic
# solvers ride the slow tier
@pytest.mark.parametrize(
    "sampler",
    ["dpmpp-3m-sde", "k-euler", "k-dpmpp-2s-ancestral",
     pytest.param("dpmpp-2m-sde", marks=pytest.mark.slow),
     pytest.param("k-heun", marks=pytest.mark.slow),
     pytest.param("k-lms", marks=pytest.mark.slow),
     pytest.param("k-dpm-2", marks=pytest.mark.slow),
     pytest.param("k-dpm-fast", marks=pytest.mark.slow),
     pytest.param("k-dpm-adaptive", marks=pytest.mark.slow)])
def test_generate_diffusion_cond_samplers(cond_model, sampler):
    audio = generate_diffusion_cond(
        cond_model,
        steps=4,
        cfg_scale=3.0,
        conditioning=CONDITIONING,
        sample_size=1024,
        seed=42,
        sampler_type=sampler,
        sigma_min=0.3,
        sigma_max=50,
    )
    assert audio.shape == (2, 2, 1024)
    assert np.isfinite(np.asarray(audio)).all()


def test_generate_deterministic_seed(cond_model):
    kw = dict(steps=3, cfg_scale=2.0, conditioning=CONDITIONING[:1], sample_size=1024,
              sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=50)
    a1 = generate_diffusion_cond(cond_model, seed=7, **kw)
    a2 = generate_diffusion_cond(cond_model, seed=7, **kw)
    a3 = generate_diffusion_cond(cond_model, seed=8, **kw)
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a2))
    assert np.abs(np.asarray(a1) - np.asarray(a3)).max() > 1e-6


def test_generate_variation_init_audio(cond_model):
    init = np.random.default_rng(0).standard_normal((2, 1024)).astype(np.float32) * 0.1
    audio = generate_diffusion_cond(
        cond_model, steps=3, cfg_scale=2.0, conditioning=CONDITIONING[:1],
        sample_size=1024, seed=1, sampler_type="dpmpp-3m-sde",
        init_audio=(16000, init), init_noise_level=5.0, sigma_min=0.3, sigma_max=50,
    )
    assert audio.shape == (1, 2, 1024)


def test_generate_inpainting_mask(cond_model):
    init = np.random.default_rng(0).standard_normal((2, 1024)).astype(np.float32) * 0.1
    mask_args = {
        "cropfrom": 0.0, "pastefrom": 0.0, "pasteto": 100.0,
        "maskstart": 25.0, "maskend": 75.0, "softnessL": 10.0, "softnessR": 10.0,
        "marination": 0.0,
    }
    audio = generate_diffusion_cond(
        cond_model, steps=3, cfg_scale=2.0, conditioning=CONDITIONING[:1],
        sample_size=1024, seed=1, sampler_type="dpmpp-3m-sde",
        init_audio=(16000, init), mask_args=mask_args, sigma_min=0.3, sigma_max=50,
    )
    assert audio.shape == (1, 2, 1024)


def test_generate_negative_conditioning(cond_model):
    audio = generate_diffusion_cond(
        cond_model, steps=2, cfg_scale=3.0, conditioning=CONDITIONING[:1],
        negative_conditioning=[{"prompt": "noise", "seconds_total": 10}],
        sample_size=1024, seed=3, sampler_type="k-heun", sigma_min=0.3, sigma_max=50,
    )
    assert audio.shape == (1, 2, 1024)


def test_generate_return_latents(cond_model):
    lat = generate_diffusion_cond(
        cond_model, steps=2, cfg_scale=1.5, conditioning=CONDITIONING[:1],
        sample_size=1024, seed=3, return_latents=True, sigma_min=0.3, sigma_max=50,
        sampler_type="dpmpp-3m-sde",
    )
    assert lat.shape == (1, 8, 128)


def test_build_mask_shape_and_range():
    mask = np.asarray(build_mask(256, {
        "maskstart": 25.0, "maskend": 75.0, "softnessL": 5.0, "softnessR": 5.0, "marination": 0.0,
    }))
    assert mask.shape == (256,)
    assert mask.min() >= 0 and mask.max() <= 1
    assert mask[:63].max() == 0 and mask[200:].max() == 0
    assert mask[128] == 1


TINY_UNCOND_CONFIG = {
    "model_type": "diffusion_uncond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "type": "dit",
        "config": {
            "in_channels": 2, "embed_dim": 32, "depth": 2, "num_heads": 4,
            "transformer_type": "continuous_transformer", "global_cond_type": "prepend",
        },
    },
}


def test_generate_diffusion_uncond():
    model = create_model_from_config(TINY_UNCOND_CONFIG, init_rng=jax.random.PRNGKey(0))
    audio = generate_diffusion_uncond(
        model, steps=3, batch_size=2, sample_size=256, seed=5,
        sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=50,
    )
    assert audio.shape == (2, 2, 256)
    assert np.isfinite(np.asarray(audio)).all()


def test_rf_variation_honors_init_noise_level():
    """Rectified-flow variation mode: sigma_max (= init_noise_level) must
    reach sample_rf (regression: generation popped it, so init audio was
    silently ignored). Unit level: with a zero-velocity model the output is
    exactly init*(1-s) + noise*s."""
    from friendly_stable_audio_tools_tpu.inference.sampling import sample_rf

    def zero_v(x, t, **kw):
        return jnp.zeros_like(x)

    noise = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 4)), jnp.float32)
    init = jnp.asarray(np.random.default_rng(1).standard_normal((1, 16, 4)), jnp.float32)
    out = sample_rf(zero_v, noise, init_data=init, steps=3, sigma_max=0.25,
                    rng=jax.random.PRNGKey(0))
    np.testing.assert_allclose(np.asarray(out), np.asarray(init * 0.75 + noise * 0.25),
                               rtol=1e-5, atol=1e-6)


def test_rf_generation_variation_differs_from_scratch(cond_model):
    """End-to-end: a rectified-flow model with init audio at low noise must
    NOT produce the same audio as from-scratch generation."""
    import copy

    cfg = copy.deepcopy(TINY_COND_CONFIG)
    cfg["model"]["diffusion"]["diffusion_objective"] = "rectified_flow"
    model = create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))

    init = np.random.default_rng(2).standard_normal((2, 1024)).astype(np.float32) * 0.1
    kw = dict(steps=3, cfg_scale=2.0, conditioning=CONDITIONING[:1], sample_size=1024, seed=11)
    a_scratch = np.asarray(generate_diffusion_cond(model, **kw), np.float32)
    a_var = np.asarray(generate_diffusion_cond(
        model, init_audio=(16000, init), init_noise_level=0.2, **kw), np.float32)
    assert np.isfinite(a_var).all()
    assert np.abs(a_scratch - a_var).max() > 1e-5, \
        "init audio ignored: variation output identical to from-scratch"


@pytest.mark.parametrize("sampler", ["k-dpm-fast", "k-dpm-adaptive"])
def test_inpaint_merge_applies_in_dpm_fast_adaptive(sampler):
    """The inpaint mask must affect dpm-fast/adaptive outputs (regression:
    merge was built but never passed to these samplers)."""
    from friendly_stable_audio_tools_tpu.inference.sampling import sample_k

    def toy(x, t, **kw):
        return -0.05 * x

    rng = np.random.default_rng(3)
    noise = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
    init = jnp.asarray(rng.standard_normal((1, 16, 4)), jnp.float32)
    mask = jnp.zeros((1, 16, 4), jnp.float32)  # 0 <= strength: re-anchor everywhere

    out_plain = sample_k(toy, noise, steps=6, sampler_type=sampler,
                         sigma_min=0.3, sigma_max=10.0, rng=jax.random.PRNGKey(0))
    out_masked = sample_k(toy, noise, init_data=init, mask=mask, steps=6,
                          sampler_type=sampler, sigma_min=0.3, sigma_max=10.0,
                          rng=jax.random.PRNGKey(0))
    assert np.isfinite(np.asarray(out_masked)).all()
    d = float(jnp.abs(out_plain - out_masked).max())
    assert d > 1e-4, f"mask had no effect on {sampler} (diff {d})"
