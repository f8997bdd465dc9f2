"""Trainer loop lifecycle: fit, periodic orbax checkpointing with embedded
model config, --ckpt-path resume, gradient accumulation (true lax.scan
micro-batching), and gradient clipping wiring (reference train.py:99-133)."""

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
from friendly_stable_audio_tools_tpu.training.diffusion import DiffusionCondTrainingWrapper
from friendly_stable_audio_tools_tpu.training.trainer import Trainer
from tests.test_generation import TINY_COND_CONFIG


def _loader(n_batches, batch_size=2, sample_size=1024, seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_batches):
        reals = rng.standard_normal((batch_size, 2, sample_size)).astype(np.float32) * 0.1
        metas = [{"prompt": "tone", "seconds_total": 1.0}] * batch_size
        batches.append((reals, metas))
    return batches


@pytest.fixture(scope="module")
def wrapper():
    model = create_model_from_config(TINY_COND_CONFIG, init_rng=jax.random.PRNGKey(0))
    return DiffusionCondTrainingWrapper(model, lr=1e-4, use_ema=True)


def test_fit_checkpoints_and_resume(wrapper, tmp_path):
    trainer = Trainer(
        wrapper, _loader(6), TINY_COND_CONFIG, save_dir=str(tmp_path),
        checkpoint_every=2, max_steps=4, log_every=2, progress_every=100,
    )
    state = trainer.fit(seed=0)
    assert int(jax.device_get(state.step)) == 4

    ckpt = os.path.join(tmp_path, "checkpoints", "step_4")
    assert os.path.isdir(ckpt)
    # model config embedded (ModelConfigEmbedderCallback parity)
    emb = json.load(open(os.path.join(ckpt, "model_config.json")))
    assert emb["model_type"] == "diffusion_cond"

    # resume continues from the saved step with identical params
    trainer2 = Trainer(
        wrapper, _loader(6), TINY_COND_CONFIG, save_dir=str(tmp_path / "r2"),
        checkpoint_every=100, max_steps=6, progress_every=100,
    )
    state2 = trainer2.fit(ckpt_path=ckpt, seed=0)
    assert int(jax.device_get(state2.step)) == 6


@pytest.mark.slow
def test_grad_accumulation_matches_big_batch(wrapper):
    """One accum=2 step equals one step on the concatenated batch whose two
    halves see the same per-microbatch rng stream."""
    state = wrapper.init_state()
    rng = jax.random.PRNGKey(7)
    reals = np.random.default_rng(1).standard_normal((4, 2, 1024)).astype(np.float32) * 0.1
    metas = [{"prompt": "x", "seconds_total": 1.0}] * 4
    batch = wrapper.prepare_batch(reals, metas)

    s_accum, m_accum = jax.jit(
        lambda s, b, k: wrapper.train_step(s, b, k, accum=2))(state, batch, rng)

    # reference: average grads of the two microbatches manually
    half = {k: jax.tree_util.tree_map(lambda x: x[:2], v) if k != "cond"
            else jax.tree_util.tree_map(lambda x: x[:2], v) for k, v in batch.items()}
    half2 = {k: jax.tree_util.tree_map(lambda x: x[2:], v) for k, v in batch.items()}
    (l0, _), g0 = wrapper._loss_and_grads(state.params, half, jax.random.fold_in(rng, 0),
                                          state.qmc_counter)
    (l1, _), g1 = wrapper._loss_and_grads(state.params, half2, jax.random.fold_in(rng, 1),
                                          state.qmc_counter + jnp.uint32(2))
    grads = jax.tree_util.tree_map(lambda a, b: (a + b) / 2, g0, g1)
    s_ref, _ = wrapper._apply_update(state, 4, (l0 + l1) / 2, {}, grads)

    np.testing.assert_allclose(float(m_accum["loss"]), float((l0 + l1) / 2), rtol=1e-5)
    for (pa, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(s_accum.params),
                               jax.tree_util.tree_leaves_with_path(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6,
                                   err_msg=jax.tree_util.keystr(pa))
    assert int(jax.device_get(s_accum.qmc_counter)) == 4


def test_trainer_accum_smoke(wrapper, tmp_path):
    trainer = Trainer(
        wrapper, _loader(4, batch_size=2), TINY_COND_CONFIG, save_dir=str(tmp_path),
        checkpoint_every=0, max_steps=2, accum_batches=2, progress_every=100,
    )
    state = trainer.fit(seed=1)
    assert int(jax.device_get(state.step)) == 2


def test_gradient_clip_wiring(wrapper, tmp_path):
    t = Trainer(wrapper, _loader(1), TINY_COND_CONFIG, save_dir=str(tmp_path),
                gradient_clip_val=0.5, max_steps=1, progress_every=100)
    # the wrapper's optimizer is wrapped in a clip chain
    import optax
    assert isinstance(wrapper.tx, optax.GradientTransformation)
    state = t.fit(seed=2)
    assert int(jax.device_get(state.step)) == 1
