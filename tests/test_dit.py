"""DiffusionTransformer: shapes, zero-init identity property, CFG math."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from friendly_stable_audio_tools_tpu.models.dit import DiffusionTransformer
from friendly_stable_audio_tools_tpu.models.transformer import ContinuousTransformer


def make_dit(**kw):
    kwargs = dict(
        io_channels=4, embed_dim=32, depth=2, num_heads=4,
        cond_token_dim=8, global_cond_dim=12,
        transformer_type="continuous_transformer", global_cond_type="prepend",
    )
    kwargs.update(kw)
    m = DiffusionTransformer(**kwargs)
    x = jnp.zeros((2, 16, 4))
    t = jnp.ones((2,))
    cond = jnp.zeros((2, 5, 8))
    g = jnp.zeros((2, 12))
    params = m.init(jax.random.PRNGKey(0), x, t, cross_attn_cond=cond, global_embed=g)
    return m, params


def test_dit_shapes():
    m, params = make_dit()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 16, 4)), jnp.float32)
    t = jnp.full((2,), 0.5)
    cond = jnp.asarray(np.random.default_rng(1).standard_normal((2, 5, 8)), jnp.float32)
    g = jnp.asarray(np.random.default_rng(2).standard_normal((2, 12)), jnp.float32)
    y = m.apply(params, x, t, cross_attn_cond=cond, global_embed=g)
    assert y.shape == (2, 16, 4)
    assert np.isfinite(np.asarray(y)).all()


def test_dit_zero_init_residuals_give_near_zero_at_init():
    """pre/postprocess convs and branch outputs are zero-init; at init the
    transformer contributes only project_in/out of x (reference dit.py:130-133)."""
    m, params = make_dit()
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 4)), jnp.float32)
    t = jnp.full((1,), 0.5)
    y = m.apply(params, x, t)
    # postprocess_conv is zero-init and added residually; transformer branch
    # outputs are zero-init -> output = project_out(project_in(x) + prepend path)
    assert y.shape == x.shape


def test_dit_cfg_scale_one_equals_cond_path():
    m, params = make_dit()
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal((2, 16, 4)), jnp.float32)
    t = jnp.full((2,), 0.3)
    cond = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    y1 = m.apply(params, x, t, cross_attn_cond=cond, cfg_scale=1.0)
    y2 = m.apply(params, x, t, cross_attn_cond=cond)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), atol=1e-6)


def test_dit_cfg_formula():
    """cfg output == uncond + (cond - uncond) * scale."""
    m, params = make_dit()
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 16, 4)), jnp.float32)
    t = jnp.full((2,), 0.3)
    cond = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    y_cfg = m.apply(params, x, t, cross_attn_cond=cond, cfg_scale=3.0)
    y_c = m.apply(params, x, t, cross_attn_cond=cond)
    y_u = m.apply(params, x, t, cross_attn_cond=jnp.zeros_like(cond))
    expected = np.asarray(y_u) + (np.asarray(y_c) - np.asarray(y_u)) * 3.0
    np.testing.assert_allclose(np.asarray(y_cfg), expected, atol=1e-4, rtol=1e-4)


def test_dit_patching():
    m, params = make_dit(patch_size=2)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 16, 4)), jnp.float32)
    t = jnp.full((1,), 0.5)
    y = m.apply(params, x, t)
    assert y.shape == (1, 16, 4)


def test_dit_adaln():
    m, params = make_dit(global_cond_type="adaLN")
    x = jnp.asarray(np.random.default_rng(0).standard_normal((1, 8, 4)), jnp.float32)
    t = jnp.full((1,), 0.5)
    g = jnp.asarray(np.random.default_rng(1).standard_normal((1, 12)), jnp.float32)
    y = m.apply(params, x, t, global_embed=g)
    assert y.shape == (1, 8, 4)


def test_dit_input_concat_interpolation():
    m = DiffusionTransformer(io_channels=4, embed_dim=32, depth=1, num_heads=4, input_concat_dim=3)
    x = jnp.zeros((1, 16, 4))
    t = jnp.ones((1,))
    ic = jnp.zeros((1, 8, 3))  # half length -> nearest-interpolated to 16
    params = m.init(jax.random.PRNGKey(0), x, t, input_concat_cond=ic)
    y = m.apply(params, x, t, input_concat_cond=ic)
    assert y.shape == (1, 16, 4)


def test_dit_cfg_dropout_trains():
    m, params = make_dit()
    x = jnp.zeros((4, 8, 4))
    t = jnp.ones((4,))
    cond = jnp.ones((4, 5, 8))
    y = m.apply(
        params, x, t, cross_attn_cond=cond, cfg_dropout_prob=0.5, train=True,
        rngs={"cfg": jax.random.PRNGKey(0)},
    )
    assert y.shape == (4, 8, 4)


def test_continuous_transformer_masking():
    m = ContinuousTransformer(dim=16, depth=1, dim_in=4, dim_out=4, dim_heads=8)
    x = jnp.asarray(np.random.default_rng(0).standard_normal((2, 6, 4)), jnp.float32)
    mask = jnp.array([[True] * 6, [True, True, True, False, False, False]])
    params = m.init(jax.random.PRNGKey(0), x)
    y = m.apply(params, x, mask=mask)
    assert y.shape == (2, 6, 4)


def test_continuous_transformer_kv_cache_decode():
    """Incremental decode with kv cache matches full causal forward."""
    m = ContinuousTransformer(dim=16, depth=2, dim_in=4, dim_out=4, dim_heads=8, causal=True)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 5, 4)), jnp.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    full = m.apply(params, x)

    # step-by-step
    out, kvs = m.apply(params, x[:, :3], return_kv=True)
    for i in range(3, 5):
        out_i, kvs = m.apply(params, x[:, i : i + 1], kv_caches=kvs, return_kv=True, rotary_offset=i)
    np.testing.assert_allclose(np.asarray(out_i[0, -1]), np.asarray(full[0, 4]), atol=1e-4, rtol=1e-3)


def test_dit_two_pass_cfg_matches_batched():
    """batch_cfg=False (two-pass) must equal batch-doubled CFG."""
    m, params = make_dit()
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal((2, 16, 4)), jnp.float32)
    t = jnp.full((2,), 0.3)
    cond = jnp.asarray(rng.standard_normal((2, 5, 8)), jnp.float32)
    y_batched = m.apply(params, x, t, cross_attn_cond=cond, cfg_scale=3.0)
    y_two_pass = m.apply(params, x, t, cross_attn_cond=cond, cfg_scale=3.0, batch_cfg=False)
    np.testing.assert_allclose(np.asarray(y_batched), np.asarray(y_two_pass), atol=1e-5, rtol=1e-5)


def test_chunked_windowed_attention_matches_banded():
    """Long-sequence chunked windowed attention == O(T^2) banded reference."""
    from friendly_stable_audio_tools_tpu.ops.attention import (
        _chunked_windowed_attention, _xla_attention,
    )
    import numpy as np

    rng = np.random.RandomState(0)
    b, h, t, d = 1, 2, 700, 16
    q = jnp.asarray(rng.randn(b, h, t, d), jnp.float32) * 0.4
    k = jnp.asarray(rng.randn(b, h, t, d), jnp.float32) * 0.4
    v = jnp.asarray(rng.randn(b, h, t, d), jnp.float32) * 0.4
    for ks in (31, 65):
        half = ks // 2
        centers = jnp.clip(jnp.arange(t), half, t - 1 - half)
        band = (jnp.abs(jnp.arange(t)[None, :] - centers[:, None]) <= half)[None, None]
        ref = _xla_attention(q, k, v, mask=band)
        got = _chunked_windowed_attention(q, k, v, ks, chunk=128)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_dit_remat_cfg_batch_double():
    """grad_checkpointing + CFG batch-doubling (cross_half_batch skip) must
    coexist: nn.remat turns call kwargs into tracers, so the skip flag rides
    as a static module attribute (regression: SAO-config inpaint generation
    crashed with TracerBoolConversionError)."""
    m, params = make_dit(grad_checkpointing=True)
    x = jnp.ones((1, 16, 4)) * 0.1
    t = jnp.ones((1,))
    cond = jnp.ones((1, 5, 8)) * 0.1
    g = jnp.ones((1, 12)) * 0.1
    out = jax.jit(lambda p, x: m.apply(
        p, x, t, cross_attn_cond=cond, global_embed=g, cfg_scale=3.0))(params, x)
    assert out.shape == (1, 16, 4)
    assert np.isfinite(np.asarray(out)).all()
    # and the remat path must still differentiate
    gr = jax.grad(lambda p: m.apply(p, x, t, cross_attn_cond=cond,
                                    global_embed=g).sum())(params)
    flat = np.concatenate([np.asarray(l, np.float32).ravel()
                           for l in jax.tree_util.tree_leaves(gr)])
    assert np.isfinite(flat).all()
