"""Prior / diffusion-AE / LM trainers + uncond DAU1d + adp factory paths."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
from friendly_stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config
from tests.test_lm import TINY_LM_CONFIG
from tests.test_generation import TINY_VAE


def test_lm_training_step():
    cfg = dict(TINY_LM_CONFIG)
    cfg["training"] = {"learning_rate": 1e-4}
    model = create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))
    trainer = create_training_wrapper_from_config(cfg, model)
    state = trainer.init_state()
    reals = np.random.default_rng(0).standard_normal((2, 1, 128)).astype(np.float32) * 0.1
    batch = trainer.prepare_batch(reals, [{"prompt": "a"}, {"prompt": "b"}])
    state, metrics = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
    assert "perplexity_q0" in metrics


PRIOR_CONFIG = {
    "model_type": "diffusion_prior",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "pretransform": {"type": "autoencoder", "config": TINY_VAE},
        "prior_type": "mono_stereo",
        "conditioning": None,
        "diffusion": {
            "type": "dit",
            "input_concat_ids": ["source"],
            "config": {
                "io_channels": 8, "embed_dim": 32, "depth": 2, "num_heads": 4,
                "input_concat_dim": 8,
                "transformer_type": "continuous_transformer", "global_cond_type": "prepend",
            },
        },
        "io_channels": 8,
    },
}


def test_prior_training_and_stereoize():
    cfg = dict(PRIOR_CONFIG)
    cfg["training"] = {"learning_rate": 1e-4, "prior_type": "mono_stereo"}
    model = create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))
    trainer = create_training_wrapper_from_config(cfg, model)
    state = trainer.init_state()
    reals = np.random.default_rng(0).standard_normal((2, 2, 256)).astype(np.float32) * 0.1
    batch = trainer.prepare_batch(reals, [{}, {}])
    state, metrics = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    # inference path
    mono = np.random.default_rng(1).standard_normal((1, 1, 200)).astype(np.float32) * 0.1
    stereo = model.stereoize(mono, in_sr=16000, steps=2,
                             sampler_kwargs={"sampler_type": "k-euler", "sigma_min": 0.3, "sigma_max": 50})
    assert np.asarray(stereo).shape[1] == 2


DIFFAE_CONFIG = {
    "model_type": "diffusion_autoencoder",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "encoder": {"type": "oobleck", "config": {
            "in_channels": 2, "channels": 8, "c_mults": [1, 2], "strides": [2, 4], "latent_dim": 8}},
        "diffusion": {
            "type": "dit",
            "config": {
                "io_channels": 2, "embed_dim": 32, "depth": 2, "num_heads": 4,
                "input_concat_dim": 8,
                "transformer_type": "continuous_transformer", "global_cond_type": "prepend",
            },
        },
        "latent_dim": 8,
        "downsampling_ratio": 8,
        "io_channels": 2,
    },
}


def test_diffusion_autoencoder_training_and_decode():
    cfg = dict(DIFFAE_CONFIG)
    cfg["training"] = {"learning_rate": 1e-4}
    model = create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))
    trainer = create_training_wrapper_from_config(cfg, model)
    state = trainer.init_state()
    reals = np.random.default_rng(0).standard_normal((2, 2, 256)).astype(np.float32) * 0.1
    batch = trainer.prepare_batch(reals, None)
    state, metrics = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))

    latents = model.encode(jnp.asarray(reals))
    assert latents.shape == (2, 8, 32)
    audio = model.decode(latents, steps=2)
    assert audio.shape == (2, 2, 256)


DANCE_CONFIG = {
    "model_type": "diffusion_uncond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "type": "DAU1d",
        "config": {
            "io_channels": 2, "depth": 3, "n_attn_layers": 1,
            "channels": [32, 32, 64], "strides": [2, 2],
        },
    },
}


@pytest.mark.slow
def test_dance_diffusion_uncond_generation():
    from friendly_stable_audio_tools_tpu.inference.generation import generate_diffusion_uncond

    model = create_model_from_config(DANCE_CONFIG, init_rng=jax.random.PRNGKey(0))
    audio = generate_diffusion_uncond(model, steps=2, batch_size=1, sample_size=256, seed=0,
                                      sampler_type="k-euler", sigma_min=0.3, sigma_max=50)
    assert audio.shape == (1, 2, 256)
    assert np.isfinite(np.asarray(audio)).all()


ADP_COND_CONFIG = {
    "model_type": "diffusion_cond",
    "sample_size": 256,
    "sample_rate": 16000,
    "audio_channels": 2,
    "model": {
        "pretransform": {"type": "autoencoder", "config": TINY_VAE},
        "conditioning": {
            "configs": [
                {"id": "prompt", "type": "lut", "config": {"tokenizer_name": "t5-base", "max_length": 6}},
            ],
            "cond_dim": 24,
        },
        "diffusion": {
            "type": "adp_cfg_1d",
            "cross_attention_cond_ids": ["prompt"],
            "config": {
                "in_channels": 8, "context_embedding_features": 24,
                "context_embedding_max_length": 6, "channels": 16,
                "multipliers": [2, 2, 2], "factors": [2, 2], "num_blocks": [1, 1],
                "attentions": [0, 1, 1], "attention_heads": 4, "attention_multiplier": 2,
                "resnet_groups": 4,
            },
        },
        "io_channels": 8,
    },
}


@pytest.mark.slow
def test_adp_cfg_generation():
    from friendly_stable_audio_tools_tpu.inference.generation import generate_diffusion_cond

    model = create_model_from_config(ADP_COND_CONFIG, init_rng=jax.random.PRNGKey(0))
    audio = generate_diffusion_cond(
        model, steps=2, cfg_scale=3.0, conditioning=[{"prompt": "hi"}],
        sample_size=256, seed=0, sampler_type="k-euler", sigma_min=0.3, sigma_max=50,
    )
    assert audio.shape == (1, 2, 256)
    assert np.isfinite(np.asarray(audio)).all()


def test_inpaint_training_wrapper():
    from tests.test_generation import TINY_COND_CONFIG

    cfg = dict(TINY_COND_CONFIG)
    cfg = {**cfg, "model_type": "diffusion_cond_inpaint"}
    cfg["training"] = {"learning_rate": 1e-4, "max_mask_segments": 4}
    model = create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))
    trainer = create_training_wrapper_from_config(cfg, model)
    state = trainer.init_state()
    reals = np.random.default_rng(0).standard_normal((2, 2, 256)).astype(np.float32) * 0.1
    batch = trainer.prepare_batch(reals, [{"prompt": "a", "seconds_total": 3},
                                          {"prompt": "b", "seconds_total": 4}])
    state, metrics = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
