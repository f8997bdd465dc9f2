"""AE GAN trainer: alternating gen/disc steps, warmup gating, losses finite."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tests.test_autoencoder import tiny_ae
from friendly_stable_audio_tools_tpu.models.bottleneck import VAEBottleneck
from friendly_stable_audio_tools_tpu.training.autoencoders import AutoencoderTrainingWrapper

LOSS_CONFIG = {
    "discriminator": {
        "type": "encodec",
        "config": {"filters": 8, "n_ffts": [128, 64], "hop_lengths": [32, 16], "win_lengths": [128, 64]},
        "weights": {"adversarial": 0.1, "feature_matching": 5.0},
    },
    "spectral": {
        "type": "mrstft",
        "config": {"fft_sizes": [128, 64], "hop_sizes": [32, 16], "win_lengths": [128, 64]},
        "weights": {"mrstft": 1.0},
    },
    "time": {"type": "l1", "weights": {"l1": 0.1}},
    "bottleneck": {"type": "kl", "weights": {"kl": 1e-4}},
}

OPT_CONFIGS = {
    "autoencoder": {
        "optimizer": {"type": "AdamW", "config": {"betas": [0.8, 0.99], "lr": 1e-3, "weight_decay": 1e-3}},
        "scheduler": {"type": "InverseLR", "config": {"inv_gamma": 200000, "power": 0.5, "warmup": 0.999}},
    },
    "discriminator": {
        "optimizer": {"type": "AdamW", "config": {"betas": [0.8, 0.99], "lr": 2e-3, "weight_decay": 1e-3}},
        "scheduler": {"type": "InverseLR", "config": {"inv_gamma": 200000, "power": 0.5, "warmup": 0.999}},
    },
}


@pytest.fixture(scope="module")
def trainer():
    ae = tiny_ae(VAEBottleneck(), latent_dim=8, enc_latent_dim=16)
    return AutoencoderTrainingWrapper(
        ae, loss_config=LOSS_CONFIG, optimizer_configs=OPT_CONFIGS,
        warmup_steps=4, sample_rate=16000, use_ema=True,
    )


@pytest.mark.slow
def test_gan_training_alternates(trainer):
    state = trainer.init_state(example_length=512)
    reals = np.random.default_rng(0).standard_normal((2, 2, 512)).astype(np.float32) * 0.1
    batch = trainer.prepare_batch(reals)

    metrics_hist = []
    for i in range(8):
        state, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(i), step=i)
        metrics_hist.append({k: float(v) for k, v in metrics.items()})
    assert int(jax.device_get(state.step)) == 8

    # pre-warmup (steps 0-3): generator only, adversarial loss must be 0
    assert metrics_hist[0]["loss_adv"] == 0.0
    assert "mrstft_loss" in metrics_hist[0]
    # post-warmup odd steps train the discriminator
    assert "discriminator_loss" in metrics_hist[5]
    assert "mrstft_loss" not in metrics_hist[5]
    # post-warmup even steps include adversarial terms
    assert "loss_adv" in metrics_hist[6]
    for m in metrics_hist:
        assert all(np.isfinite(v) for v in m.values())


def test_kl_loss_present(trainer):
    state = trainer.init_state(example_length=512)
    reals = np.zeros((1, 2, 512), np.float32)
    batch = trainer.prepare_batch(reals)
    _, metrics = trainer.train_step(state, batch, jax.random.PRNGKey(0), step=0)
    assert "kl_loss" in metrics


def test_export_model(trainer, tmp_path):
    state = trainer.init_state(example_length=512)
    path = str(tmp_path / "ae.safetensors")
    trainer.export_model(path, state)
    from friendly_stable_audio_tools_tpu.models.utils import load_ckpt_state_dict

    flat = load_ckpt_state_dict(path)
    assert len(flat) > 0
