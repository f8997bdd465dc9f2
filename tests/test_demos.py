"""Demo callbacks: each trainer type's in-training inference demo runs
end-to-end on tiny models and writes wavs/logs (reference's rank-0 wandb
demo callbacks, training/autoencoders.py:293-375, training/diffusion.py
:432-594,1109-1188)."""

import os

import numpy as np
import pytest

import jax

from friendly_stable_audio_tools_tpu.training.logging import ExperimentLogger


class _Trainer:
    """Minimal stand-in exposing the attributes demo callbacks consume."""

    def __init__(self, wrapper, save_dir):
        self.wrapper = wrapper
        self.save_dir = str(save_dir)
        self.logger = ExperimentLogger()


def _wavs(save_dir, step):
    d = os.path.join(str(save_dir), "samples", str(step))
    return sorted(f for f in os.listdir(d) if f.endswith(".wav")) if os.path.isdir(d) else []


@pytest.mark.slow
def test_autoencoder_demo_callback(tmp_path):
    from tests.test_autoencoder import tiny_ae
    from friendly_stable_audio_tools_tpu.models.bottleneck import VAEBottleneck
    from friendly_stable_audio_tools_tpu.training.autoencoders import AutoencoderTrainingWrapper
    from friendly_stable_audio_tools_tpu.training.demos import AutoencoderDemoCallback
    from tests.test_training_autoencoder import LOSS_CONFIG, OPT_CONFIGS

    ae = tiny_ae(VAEBottleneck(), latent_dim=8, enc_latent_dim=16)
    wrapper = AutoencoderTrainingWrapper(ae, loss_config=LOSS_CONFIG,
                                         optimizer_configs=OPT_CONFIGS,
                                         warmup_steps=4, sample_rate=16000)
    state = wrapper.init_state(example_length=512)
    reals = np.random.default_rng(0).standard_normal((2, 2, 512)).astype(np.float32) * 0.1

    cb = AutoencoderDemoCallback(demo_every=2, sample_rate=16000)
    trainer = _Trainer(wrapper, tmp_path)
    cb.on_step(trainer, state, 1, (reals, [{}] * 2))  # not a demo step
    assert _wavs(tmp_path, 1) == []
    cb.on_step(trainer, state, 2, (reals, [{}] * 2))
    files = _wavs(tmp_path, 2)
    assert any(f.startswith("recon_") for f in files)
    assert any(f.startswith("real_") for f in files)
    assert os.path.exists(os.path.join(tmp_path, "samples", "2", "latent_pca.npy"))


def test_diffusion_uncond_demo_callback(tmp_path):
    from tests.test_generation import TINY_UNCOND_CONFIG
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.training.diffusion import DiffusionUncondTrainingWrapper
    from friendly_stable_audio_tools_tpu.training.demos import DiffusionDemoCallback

    model = create_model_from_config(TINY_UNCOND_CONFIG, init_rng=jax.random.PRNGKey(0))
    wrapper = DiffusionUncondTrainingWrapper(model, lr=1e-4)
    state = wrapper.init_state()
    cb = DiffusionDemoCallback(demo_every=2, num_demos=1, demo_steps=4,
                               sample_rate=16000, sample_size=256)
    trainer = _Trainer(wrapper, tmp_path)
    cb.on_step(trainer, state, 2, None)
    assert any(f.startswith("demo_") for f in _wavs(tmp_path, 2))


def test_diffusion_cond_demo_callback(tmp_path):
    from tests.test_generation import TINY_COND_CONFIG
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.training.diffusion import DiffusionCondTrainingWrapper
    from friendly_stable_audio_tools_tpu.training.demos import DiffusionCondDemoCallback

    model = create_model_from_config(TINY_COND_CONFIG, init_rng=jax.random.PRNGKey(0))
    wrapper = DiffusionCondTrainingWrapper(model, lr=1e-4)
    state = wrapper.init_state()
    cb = DiffusionCondDemoCallback(
        demo_every=2, num_demos=1, demo_steps=4, sample_size=256, sample_rate=16000,
        demo_conditioning=[{"prompt": "a test tone", "seconds_start": 0, "seconds_total": 1}],
        demo_cfg_scales=[1, 3],
    )
    trainer = _Trainer(wrapper, tmp_path)
    reals = np.random.default_rng(0).standard_normal((1, 2, 256)).astype(np.float32) * 0.1
    cb.on_step(trainer, state, 2, (reals, [{}]))
    files = _wavs(tmp_path, 2)
    assert any("cfg1" in f for f in files) and any("cfg3" in f for f in files)
    # pretransform round-trip sanity wav (reference training/diffusion.py:559-588)
    assert "pretransform_recon.wav" in files


@pytest.mark.slow
def test_diffusion_autoencoder_demo_callback(tmp_path):
    from tests.test_training_other import DIFFAE_CONFIG
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.training.diffusion_autoencoder_trainer import (
        DiffusionAutoencoderTrainingWrapper,
    )
    from friendly_stable_audio_tools_tpu.training.demos import DiffusionAutoencoderDemoCallback

    diffae = create_model_from_config(DIFFAE_CONFIG, init_rng=jax.random.PRNGKey(0))
    wrapper = DiffusionAutoencoderTrainingWrapper(diffae, lr=1e-4)
    state = wrapper.init_state()
    cb = DiffusionAutoencoderDemoCallback(demo_every=2, max_num_sample=1, demo_steps=3,
                                          sample_rate=16000)
    trainer = _Trainer(wrapper, tmp_path)
    reals = np.random.default_rng(0).standard_normal((1, 2, diffae.min_length * 2)).astype(np.float32) * 0.1
    cb.on_step(trainer, state, 2, (reals, [{}]))
    files = _wavs(tmp_path, 2)
    assert any(f.startswith("recon_") for f in files)


def test_demo_factory_dispatch():
    from friendly_stable_audio_tools_tpu.training.factory import create_demo_callback_from_config
    from friendly_stable_audio_tools_tpu.training import demos

    base = {"sample_size": 256, "sample_rate": 16000, "training": {"demo": {"demo_every": 7}}}
    cases = {
        "autoencoder": demos.AutoencoderDemoCallback,
        "diffusion_uncond": demos.DiffusionDemoCallback,
        "diffusion_cond": demos.DiffusionCondDemoCallback,
        "diffusion_cond_inpaint": demos.DiffusionCondDemoCallback,
        "diffusion_prior": demos.DiffusionCondDemoCallback,
        "diffusion_autoencoder": demos.DiffusionAutoencoderDemoCallback,
        "lm": demos.AudioLanguageModelDemoCallback,
    }
    for mt, cls in cases.items():
        cb = create_demo_callback_from_config({**base, "model_type": mt})
        assert isinstance(cb, cls), mt
        assert cb.demo_every == 7
