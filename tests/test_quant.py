"""Int8 dynamic-quantized matmul path (ops/quant.py).

Checks (a) QuantDense is bit-identical to nn.Dense with the flag off —
same param tree, same outputs — and (b) the int8 path's error is bounded
on transformer-realistic distributions, both at the single-GEMM level and
through a full DiT-style transformer forward.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from friendly_stable_audio_tools_tpu.ops import quant


@pytest.fixture
def int8_env(monkeypatch):
    monkeypatch.setenv("FSAT_INT8_MATMUL", "1")
    yield
    monkeypatch.delenv("FSAT_INT8_MATMUL", raising=False)


def test_quantdense_matches_nn_dense_exactly():
    """Flag off: identical params and bit-identical output to nn.Dense."""
    assert not quant.int8_matmul_enabled()
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 17, 48), jnp.float32)
    ref = nn.Dense(96, param_dtype=jnp.float32)
    q = quant.QuantDense(96, param_dtype=jnp.float32)
    pr = ref.init(jax.random.PRNGKey(1), x)
    pq = q.init(jax.random.PRNGKey(1), x)
    assert jax.tree_util.tree_structure(pr) == jax.tree_util.tree_structure(pq)
    for a, b in zip(jax.tree_util.tree_leaves(pr), jax.tree_util.tree_leaves(pq)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(ref.apply(pr, x)), np.asarray(q.apply(pr, x))
    )
    # and with bf16 inputs + pre-cast bf16 params (the inference regime)
    pb = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), pr)
    xb = x.astype(jnp.bfloat16)
    np.testing.assert_array_equal(
        np.asarray(ref.apply(pb, xb)), np.asarray(q.apply(pb, xb))
    )


def test_int8_matmul_error_bound(int8_env):
    """Per-token dynamic int8: relative L2 error < 2% on Gaussian GEMMs."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (128, 256), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (256, 192), jnp.float32) * 0.02
    y_ref = x @ w
    y_q = quant.dynamic_int8_matmul(x, w)
    rel = float(jnp.linalg.norm(y_q - y_ref) / jnp.linalg.norm(y_ref))
    assert rel < 0.02, rel


def test_int8_zero_rows_are_finite(int8_env):
    """All-zero rows (CFG null-cond embedding) must not produce NaN/Inf."""
    x = jnp.zeros((4, 64), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(0), (64, 32), jnp.bfloat16)
    y = quant.dynamic_int8_matmul(x, w)
    assert bool(jnp.all(jnp.isfinite(y.astype(jnp.float32))))
    np.testing.assert_array_equal(np.asarray(y, np.float32), 0.0)


@pytest.mark.slow
def test_int8_transformer_forward_fidelity(int8_env, monkeypatch):
    """Full transformer forward: int8 output stays close to bf16 output."""
    from friendly_stable_audio_tools_tpu.models.transformer import ContinuousTransformer

    model = ContinuousTransformer(
        dim=128, depth=2, dim_heads=32, dim_in=32, dim_out=32,
        cross_attend=True, cond_token_dim=64, global_cond_dim=128,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 32), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 64), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 128), jnp.float32)
    params = model.init(jax.random.PRNGKey(3), x, context=ctx, global_cond=g)
    # De-zero every parameter: the residual out-projections are zero-init, so
    # a fresh-init forward is independent of the attention/FF internals and
    # would vacuously pass. Noise makes the quantized GEMMs observable.
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(42), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    monkeypatch.setenv("FSAT_INT8_MATMUL", "0")
    y_ref = model.apply(params, x, context=ctx, global_cond=g)
    monkeypatch.setenv("FSAT_INT8_MATMUL", "1")
    y_q = model.apply(params, x, context=ctx, global_cond=g)

    rel = float(jnp.linalg.norm(y_q - y_ref) / (jnp.linalg.norm(y_ref) + 1e-12))
    assert rel > 0.0, "int8 path did not engage (output identical to bf16)"
    assert rel < 0.05, rel


def test_int8_scope_limits_quantized_projections(int8_env, monkeypatch):
    """FSAT_INT8_SCOPE=mlp|attn quantizes only that projection family; the
    two scopes are distinct programs and both differ from full-int8."""
    from friendly_stable_audio_tools_tpu.models.transformer import ContinuousTransformer

    model = ContinuousTransformer(
        dim=128, depth=1, dim_heads=32, dim_in=32, dim_out=32,
        cross_attend=True, cond_token_dim=64, global_cond_dim=128,
    )
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (2, 64, 32), jnp.float32)
    ctx = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 64), jnp.float32)
    g = jax.random.normal(jax.random.PRNGKey(2), (2, 128), jnp.float32)
    params = _dezero(model.init(jax.random.PRNGKey(3), x, context=ctx, global_cond=g))

    outs = {}
    for scope in ("", "mlp", "attn"):
        monkeypatch.setenv("FSAT_INT8_SCOPE", scope)
        outs[scope] = np.asarray(model.apply(params, x, context=ctx, global_cond=g))
    monkeypatch.delenv("FSAT_INT8_SCOPE", raising=False)
    monkeypatch.setenv("FSAT_INT8_MATMUL", "0")
    bf16 = np.asarray(model.apply(params, x, context=ctx, global_cond=g))

    def rel(a, b):
        return np.linalg.norm(a - b) / (np.linalg.norm(b) + 1e-12)

    # each scope engages (differs from bf16) but quantizes strictly less than
    # the full path (differs from full-int8 too)
    for scope in ("mlp", "attn"):
        assert rel(outs[scope], bf16) > 0.0, scope
        assert rel(outs[scope], outs[""]) > 0.0, scope
        assert rel(outs[scope], bf16) < rel(outs[""], bf16) * 1.5
    assert rel(outs[""], bf16) < 0.05


def test_quant_override_beats_env_flag():
    """quant_override(True/False) wins over FSAT_INT8_MATMUL at trace time —
    the mechanism behind the hybrid int8/bf16 sampler schedule."""
    rng = jax.random.PRNGKey(0)
    x = jax.random.normal(rng, (16, 64), jnp.float32)
    q = quant.QuantDense(32, param_dtype=jnp.float32)
    params = q.init(jax.random.PRNGKey(1), x)

    assert os.environ.get("FSAT_INT8_MATMUL") != "1"
    y_plain = np.asarray(q.apply(params, x))
    with quant.quant_override(True):
        y_forced_int8 = np.asarray(q.apply(params, x))
    with quant.quant_override(False):
        y_forced_off = np.asarray(q.apply(params, x))
    assert np.abs(y_forced_int8 - y_plain).max() > 0.0
    np.testing.assert_array_equal(y_forced_off, y_plain)
    # context restores: back to env-controlled behavior
    np.testing.assert_array_equal(np.asarray(q.apply(params, x)), y_plain)


def test_hybrid_int8_bf16_schedule(monkeypatch):
    """FSAT_INT8_BF16_TAIL/HEAD split the sampler trajectory between int8 and
    bf16 regimes: full-coverage tail reproduces bf16 exactly, a partial tail
    lands strictly between full-int8 and full-bf16 programs."""
    from friendly_stable_audio_tools_tpu.inference.sampling import sample_k

    class TinyModel(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            h = quant.QuantDense(64, param_dtype=jnp.float32)(x)
            h = jax.nn.silu(h + t[:, None, None])
            return quant.QuantDense(x.shape[-1], param_dtype=jnp.float32)(h)

    model = TinyModel()
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8), jnp.float32)
    t0 = jnp.zeros((2,), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), noise, t0)

    def run():
        return np.asarray(sample_k(
            lambda x, t: model.apply(params, x, t),
            noise, steps=6, sampler_type="dpmpp-3m-sde",
            sigma_min=0.3, sigma_max=500.0, rho=1.0, rng=jax.random.PRNGKey(2),
        ))

    monkeypatch.setenv("FSAT_INT8_MATMUL", "0")
    bf16 = run()
    monkeypatch.setenv("FSAT_INT8_MATMUL", "1")
    int8 = run()
    assert np.abs(int8 - bf16).max() > 0.0

    monkeypatch.setenv("FSAT_INT8_BF16_TAIL", "6")
    np.testing.assert_array_equal(run(), bf16)  # full tail == pure bf16

    monkeypatch.setenv("FSAT_INT8_BF16_TAIL", "3")
    mixed = run()
    assert np.abs(mixed - bf16).max() > 0.0
    assert np.abs(mixed - int8).max() > 0.0
    # bf16 tail strictly reduces end-to-end divergence from the bf16 output
    assert np.linalg.norm(mixed - bf16) < np.linalg.norm(int8 - bf16)

    monkeypatch.setenv("FSAT_INT8_BF16_TAIL", "2")
    monkeypatch.setenv("FSAT_INT8_BF16_HEAD", "4")
    np.testing.assert_array_equal(run(), bf16)  # head+tail cover all 6 steps


def test_hybrid_schedule_applies_to_rf_samplers(monkeypatch):
    """FSAT_INT8_BF16_TAIL must be honored by the rectified-flow/DDIM sampler
    families too, not just sample_k (generate.py --int8-bf16-tail on an RF
    model config routes to sample_rf)."""
    from friendly_stable_audio_tools_tpu.inference.sampling import sample_rf

    class TinyModel(nn.Module):
        @nn.compact
        def __call__(self, x, t):
            h = quant.QuantDense(64, param_dtype=jnp.float32)(x)
            h = jax.nn.silu(h + t[:, None, None])
            return quant.QuantDense(x.shape[-1], param_dtype=jnp.float32)(h)

    model = TinyModel()
    noise = jax.random.normal(jax.random.PRNGKey(0), (2, 16, 8), jnp.float32)
    params = model.init(jax.random.PRNGKey(1), noise, jnp.zeros((2,), jnp.float32))

    def run():
        return np.asarray(sample_rf(
            lambda x, t: model.apply(params, x, t), noise, steps=6))

    monkeypatch.setenv("FSAT_INT8_MATMUL", "0")
    bf16 = run()
    monkeypatch.setenv("FSAT_INT8_MATMUL", "1")
    int8 = run()
    assert np.abs(int8 - bf16).max() > 0.0

    monkeypatch.setenv("FSAT_INT8_BF16_TAIL", "6")
    np.testing.assert_array_equal(run(), bf16)  # full tail == pure bf16

    monkeypatch.setenv("FSAT_INT8_BF16_TAIL", "3")
    mixed = run()
    assert np.abs(mixed - bf16).max() > 0.0
    assert np.abs(mixed - int8).max() > 0.0
    assert np.linalg.norm(mixed - bf16) < np.linalg.norm(int8 - bf16)


def test_fused_mlp_yields_to_scoped_int8(monkeypatch):
    """FSAT_INT8_SCOPE=mlp still quantizes the MLP GEMMs, so the fused bf16
    SwiGLU kernel must disable itself (regression: an untagged
    int8_matmul_enabled() check let 'int8 mlp-only' + FSAT_FUSED_MLP=1 run
    pure bf16 silently)."""
    from friendly_stable_audio_tools_tpu.ops.pallas.mlp import fused_mlp_enabled

    monkeypatch.setenv("FSAT_PALLAS_INTERPRET", "1")  # allow on CPU
    monkeypatch.setenv("FSAT_FUSED_MLP", "1")
    assert fused_mlp_enabled()
    monkeypatch.setenv("FSAT_INT8_MATMUL", "1")
    assert not fused_mlp_enabled()  # int8 owns the MLP GEMMs
    monkeypatch.setenv("FSAT_INT8_SCOPE", "mlp")
    assert not fused_mlp_enabled()  # scoped to mlp: still quantizes them
    monkeypatch.setenv("FSAT_INT8_SCOPE", "attn")
    assert fused_mlp_enabled()  # attn scope leaves the MLP in bf16


def _dezero(params, scale=0.05, seed=42):
    from friendly_stable_audio_tools_tpu.utils.common import dezero_params

    return dezero_params(params, seed=seed, scale=scale, damp=1.0)


def test_generation_jit_cache_keys_on_trace_env(monkeypatch):
    """Flipping a trace-time env flag between generate calls must recompile,
    not serve the cached program (regression: the cache previously keyed
    only on static args, so FSAT_INT8_MATMUL=1 silently ran bf16)."""
    from test_generation import TINY_COND_CONFIG
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.inference.generation import generate_diffusion_cond

    monkeypatch.setenv("FSAT_ALLOW_FALLBACK_TOKENIZER", "1")
    model = create_model_from_config(TINY_COND_CONFIG, init_rng=jax.random.PRNGKey(0))
    model.params = _dezero(model.params)
    cond = [{"prompt": "a test tone", "seconds_total": 4.0}]
    kw = dict(steps=2, cfg_scale=3.0, conditioning=cond, sample_size=1024, seed=7)

    monkeypatch.setenv("FSAT_INT8_MATMUL", "0")
    a0 = np.asarray(generate_diffusion_cond(model, **kw), np.float32)
    monkeypatch.setenv("FSAT_INT8_MATMUL", "1")
    a1 = np.asarray(generate_diffusion_cond(model, **kw), np.float32)

    assert len(model._gen_jit_cache) == 2, "env flag missing from jit cache key"
    assert np.isfinite(a1).all()
    d = np.abs(a0 - a1).max()
    assert d > 0.0, "int8 generation identical to bf16 — flag not honored"
    # and it should still be close: the quantization is 8-bit symmetric
    rel = np.linalg.norm(a1 - a0) / (np.linalg.norm(a0) + 1e-12)
    assert rel < 0.3, rel
