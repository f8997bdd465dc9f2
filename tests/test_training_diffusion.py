"""Diffusion training wrappers: loss decreases, EMA, multichip sharding."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
from friendly_stable_audio_tools_tpu.training.diffusion import (
    DiffusionCondTrainingWrapper,
    DiffusionUncondTrainingWrapper,
    quasirandom_uniform,
)
from tests.test_generation import TINY_COND_CONFIG, TINY_UNCOND_CONFIG, CONDITIONING


def test_quasirandom_uniform_low_discrepancy():
    vals = np.asarray(quasirandom_uniform(jnp.uint32(0), 64, jnp.asarray(0.0)))
    assert vals.shape == (64,)
    assert (vals >= 0).all() and (vals < 1).all()
    # van der corput: first 64 values stratify [0,1) into 64 distinct cells
    assert len(np.unique((vals * 64).astype(int))) == 64


@pytest.fixture(scope="module")
def cond_trainer():
    model = create_model_from_config(TINY_COND_CONFIG, init_rng=jax.random.PRNGKey(0))
    return DiffusionCondTrainingWrapper(model, lr=1e-3, use_ema=True, cfg_dropout_prob=0.1)


@pytest.mark.slow
def test_cond_train_step_reduces_loss(cond_trainer):
    trainer = cond_trainer
    state = trainer.init_state()
    reals = np.random.default_rng(0).standard_normal((2, 2, 256)).astype(np.float32) * 0.1
    batch = trainer.prepare_batch(reals, CONDITIONING)
    step = jax.jit(trainer.train_step)

    # learning signal measured on a FIXED probe (same rng => same timesteps
    # and noise draw) before vs after training — per-step training losses use
    # fresh random timesteps and are too noisy to compare over a few steps
    probe_key = jax.random.PRNGKey(1234)
    (loss_before, _), _ = trainer._loss_and_grads(state.params, batch, probe_key, state.qmc_counter)

    losses = []
    for i in range(12):
        state, metrics = step(state, batch, jax.random.PRNGKey(i))
        losses.append(float(metrics["loss"]))
    assert int(state.step) == 12
    assert np.isfinite(losses).all()

    (loss_after, _), _ = trainer._loss_and_grads(state.params, batch, probe_key, state.qmc_counter * 0)
    assert float(loss_after) < float(loss_before), (float(loss_before), float(loss_after))


def test_ema_params_track_model(cond_trainer):
    trainer = cond_trainer
    state = trainer.init_state()
    reals = np.zeros((1, 2, 256), np.float32)
    batch = trainer.prepare_batch(reals, CONDITIONING[:1])
    state, _ = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(0))
    state, _ = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(1))
    # EMA differs from online params but is finite and same structure
    flat_m = jax.tree_util.tree_leaves(state.params["model"])
    flat_e = jax.tree_util.tree_leaves(state.ema_params)
    assert len(flat_m) == len(flat_e)
    assert all(np.isfinite(np.asarray(e)).all() for e in flat_e)


def test_uncond_train_step():
    model = create_model_from_config(TINY_UNCOND_CONFIG, init_rng=jax.random.PRNGKey(0))
    trainer = DiffusionUncondTrainingWrapper(model, lr=1e-3)
    state = trainer.init_state()
    reals = np.random.default_rng(0).standard_normal((2, 2, 64)).astype(np.float32) * 0.1
    batch = trainer.prepare_batch(reals)
    state, metrics = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))


def test_cond_train_step_data_parallel_8_devices(cond_trainer):
    """DDP parity: batch sharded over 8 virtual devices, params replicated."""
    from friendly_stable_audio_tools_tpu.parallel.mesh import create_mesh, replicate, shard_batch

    assert len(jax.devices()) == 8
    mesh = create_mesh()
    trainer = cond_trainer
    state = trainer.init_state()
    state = replicate(state, mesh)
    reals = np.random.default_rng(0).standard_normal((8, 2, 256)).astype(np.float32) * 0.1
    conds = [dict(CONDITIONING[0]) for _ in range(8)]
    batch = trainer.prepare_batch(reals, conds)
    batch = shard_batch(batch, mesh)
    state, metrics = jax.jit(trainer.train_step)(state, batch, jax.random.PRNGKey(0))
    assert np.isfinite(float(metrics["loss"]))
