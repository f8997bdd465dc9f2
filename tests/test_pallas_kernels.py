"""Pallas kernel logic tests, runnable on CPU via interpret mode
(FSAT_PALLAS_INTERPRET=1 routes the TPU kernels through the Pallas
interpreter). On real TPU the same code paths compile through Mosaic."""

import os

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.flatten_util  # noqa: E402
import jax.numpy as jnp  # noqa: E402


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("FSAT_PALLAS_INTERPRET", "1")


def test_snake_conv1d_matches_xla():
    from friendly_stable_audio_tools_tpu.ops.pallas.conv1d import snake_conv1d, _xla_reference

    rng = np.random.RandomState(0)
    for (t, cin, cout, k, d) in ((300, 128, 128, 7, 3), (256, 128, 256, 1, 1), (200, 128, 128, 7, 9)):
        x = jnp.asarray(rng.randn(2, t, cin), jnp.float32) * 0.3
        w = jnp.asarray(rng.randn(k, cin, cout), jnp.float32) * 0.05
        b = jnp.asarray(rng.randn(cout), jnp.float32) * 0.1
        a = jnp.asarray(np.abs(rng.randn(cin)) + 0.5, jnp.float32)
        ib = jnp.asarray(np.abs(rng.randn(cin)) + 0.5, jnp.float32)
        got = snake_conv1d(x, w, b, a, ib, dilation=d, block_t=128)
        ref = _xla_reference(x, w, b, a, ib, d, (d * (k - 1)) // 2)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


def test_fused_residual_unit_matches_xla():
    from friendly_stable_audio_tools_tpu.ops.pallas.conv1d import fused_residual_unit, _ru_xla

    rng = np.random.RandomState(1)
    t, c = 384, 128
    x = jnp.asarray(rng.randn(1, t, c), jnp.float32) * 0.3
    w1 = jnp.asarray(rng.randn(7, c, c), jnp.float32) * 0.05
    b1 = jnp.asarray(rng.randn(c), jnp.float32) * 0.1
    w2 = jnp.asarray(rng.randn(c, c), jnp.float32) * 0.05
    b2 = jnp.asarray(rng.randn(c), jnp.float32) * 0.1
    a1 = jnp.asarray(np.abs(rng.randn(c)) + 0.5, jnp.float32)
    a2 = jnp.asarray(np.abs(rng.randn(c)) + 0.5, jnp.float32)
    got = fused_residual_unit(x, w1, b1, a1, a1, w2, b2, a2, a2, dilation=3, block_t=128)
    ab1 = jnp.stack([a1, a1]); ab2 = jnp.stack([a2, a2])
    ref = _ru_xla(x, w1, b1, ab1, w2, b2, ab2, 3)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("stride,cin,cout", [(2, 128, 128), (4, 256, 128), (8, 128, 128)])
def test_snake_conv_transpose1d_matches_xla(stride, cin, cout):
    from friendly_stable_audio_tools_tpu.ops.pallas.conv1d import snake_conv_transpose1d, _upk_xla

    rng = np.random.RandomState(2)
    t = 200
    x = jnp.asarray(rng.randn(2, t, cin), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(2 * stride, cin, cout), jnp.float32) * 0.05
    b = jnp.asarray(rng.randn(cout), jnp.float32) * 0.1
    a = jnp.asarray(np.abs(rng.randn(cin)) + 0.5, jnp.float32)
    ib = jnp.asarray(np.abs(rng.randn(cin)) + 0.5, jnp.float32)
    got = snake_conv_transpose1d(x, w, b, a, ib, stride=stride, block_t=128)
    ref = _upk_xla(x, w, b, a, ib, stride)
    assert got.shape == (2, t * stride, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    # backward (XLA-recompute vjp)
    g = jax.grad(lambda x: snake_conv_transpose1d(x, w, b, a, ib, stride=stride, block_t=128).sum())(x)
    gr = jax.grad(lambda x: _upk_xla(x, w, b, a, ib, stride).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=1e-4)


@pytest.mark.parametrize("stride,cin,cout", [(2, 16, 16), (4, 32, 16), (8, 64, 32)])
def test_upk_gemm_matches_xla(stride, cin, cout):
    """Phase-grouped GEMM upsample (the big-weight decoder fallback) ==
    XLA conv_transpose form, forward and grad."""
    from friendly_stable_audio_tools_tpu.ops.pallas.conv1d import _upk_gemm, _upk_xla

    rng = np.random.RandomState(5)
    t = 48
    x = jnp.asarray(rng.randn(2, t, cin), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(2 * stride, cin, cout), jnp.float32) * 0.05
    b = jnp.asarray(rng.randn(cout), jnp.float32) * 0.1
    a = jnp.asarray(np.abs(rng.randn(cin)) + 0.5, jnp.float32)
    ib = jnp.asarray(np.abs(rng.randn(cin)) + 0.5, jnp.float32)
    got = _upk_gemm(x, w, b, a, ib, stride)
    ref = _upk_xla(x, w, b, a, ib, stride)
    assert got.shape == (2, t * stride, cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-4)
    g = jax.grad(lambda x: (_upk_gemm(x, w, b, a, ib, stride) ** 2).sum())(x)
    gr = jax.grad(lambda x: (_upk_xla(x, w, b, a, ib, stride) ** 2).sum())(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-4)
    # no-snake path (alpha None)
    got0 = _upk_gemm(x, w, b, None, None, stride)
    ref0 = _upk_xla(x, w, b, None, None, stride)
    np.testing.assert_allclose(np.asarray(got0), np.asarray(ref0), atol=1e-4)


@pytest.mark.parametrize("causal", [False, True])
def test_flash_attention_fwd_bwd(causal):
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
        flash_attention, _xla_reference,
    )

    rng = np.random.RandomState(3)
    B, H, L, D = 1, 2, 200, 64
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(B, H, L, D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(B, H, L, D), jnp.float32) * 0.3
    g = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)

    got = flash_attention(q, k, v, causal=causal)
    ref = _xla_reference(q.reshape(B * H, L, D), k.reshape(B * H, L, D),
                         v.reshape(B * H, L, D), causal).reshape(B, H, L, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=causal) * g)

    def loss_ref(q, k, v):
        o = _xla_reference(q.reshape(B * H, L, D), k.reshape(B * H, L, D),
                           v.reshape(B * H, L, D), causal)
        return jnp.sum(o.reshape(B, H, L, D) * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gf, gr):
        # bf16 in-kernel dots vs fp32 reference
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-3)


def test_flash_attention_long_seq_online_path():
    """t_k above the single-dot ceiling exercises the online-softmax kernel."""
    import friendly_stable_audio_tools_tpu.ops.pallas.flash_attention as fa

    rng = np.random.RandomState(4)
    B, H, L, D = 1, 1, 300, 64
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.float32) * 0.3
    old = fa.SINGLE_DOT_MAX_TK
    try:
        fa.SINGLE_DOT_MAX_TK = 0  # force the online kernel
        got = fa.flash_attention(q, q, q, block_q=128, block_k=128)
    finally:
        fa.SINGLE_DOT_MAX_TK = old
    ref = fa._xla_reference(q.reshape(B * H, L, D), q.reshape(B * H, L, D),
                            q.reshape(B * H, L, D), False).reshape(B, H, L, D)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_fused_qkv_rope_attention_matches_reference():
    """Fused qkv-layout + rope + attention kernel == unfused split/rope/attn."""
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
        fused_qkv_rope_attention, _fused_reference,
    )
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    rng = np.random.RandomState(0)
    b, t, h, d = 2, 256, 4, 64
    qkv = jnp.asarray(rng.randn(b, t, 3 * h * d), jnp.float32) * 0.3
    freqs = rotary_freqs(t, 32)

    got = fused_qkv_rope_attention(qkv, freqs, h)
    ref = _fused_reference(qkv, freqs, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)


def test_fused_qkv_rope_attention_grad():
    """custom_vjp backward (reference recompute) matches autodiff of the
    reference path."""
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
        fused_qkv_rope_attention, _fused_reference,
    )
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    rng = np.random.RandomState(1)
    b, t, h, d = 1, 128, 2, 64
    qkv = jnp.asarray(rng.randn(b, t, 3 * h * d), jnp.float32) * 0.3
    freqs = rotary_freqs(t, 32)

    g1 = jax.grad(lambda x: jnp.sum(fused_qkv_rope_attention(x, freqs, h) ** 2))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(_fused_reference(x, freqs, h) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-3)


def test_attention_module_fused_path_matches_unfused(monkeypatch):
    """models/transformer.py Attention: fused fast path == unfused path."""
    from friendly_stable_audio_tools_tpu.models.transformer import Attention
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    rng = np.random.RandomState(2)
    b, t, dim = 1, 256, 128
    x = jnp.asarray(rng.randn(b, t, dim), jnp.float32) * 0.3
    freqs = rotary_freqs(t, 16)

    attn = Attention(dim, dim_heads=64, zero_init_output=False)
    params = attn.init(jax.random.PRNGKey(0), x, rotary_pos_emb=freqs)

    monkeypatch.setenv("FSAT_FUSED_ATTN", "1")
    fused = attn.apply(params, x, rotary_pos_emb=freqs)
    monkeypatch.delenv("FSAT_FUSED_ATTN")
    unfused = attn.apply(params, x, rotary_pos_emb=freqs)
    np.testing.assert_allclose(np.asarray(fused), np.asarray(unfused), atol=2e-3)


def test_flash_attention_rectangular_cross():
    """Rectangular flash attention (Tk != Tq, e.g. 130 cond tokens) matches
    the XLA reference, forward and grad."""
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
        flash_attention, _xla_reference,
    )

    rng = np.random.RandomState(3)
    b, h, tq, tk, d = 1, 2, 256, 130, 64
    q = jnp.asarray(rng.randn(b, h, tq, d), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(b, h, tk, d), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(b, h, tk, d), jnp.float32) * 0.3

    got = flash_attention(q, k, v)
    ref = _xla_reference(q.reshape(b * h, tq, d), k.reshape(b * h, tk, d),
                         v.reshape(b * h, tk, d), False).reshape(b, h, tq, d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)

    gk1 = jax.grad(lambda k_: jnp.sum(flash_attention(q, k_, v) ** 2))(k)
    gk2 = jax.grad(lambda k_: jnp.sum(_xla_reference(
        q.reshape(b * h, tq, d), k_.reshape(b * h, tk, d),
        v.reshape(b * h, tk, d), False) ** 2))(k)
    np.testing.assert_allclose(np.asarray(gk1), np.asarray(gk2), atol=3e-3)


@pytest.mark.slow
def test_padded_sequence_path_matches_unpadded(monkeypatch):
    """ContinuousTransformer padded-sequence fast path (pad once to the lane
    multiple, kv_len-mask in attention, slice once) == unpadded math, forward
    and grad, at the DiT's 128-misaligned length (1024 latents + 2 prepend)."""
    from friendly_stable_audio_tools_tpu.models.transformer import ContinuousTransformer

    rng = np.random.RandomState(7)
    b, t, dim = 1, 1024, 64
    model = ContinuousTransformer(dim=dim, depth=2, dim_heads=32,
                                  cross_attend=True, cond_token_dim=64)
    x = jnp.asarray(rng.randn(b, t, dim), jnp.float32) * 0.3
    prep = jnp.asarray(rng.randn(b, 2, dim), jnp.float32) * 0.3
    ctx = jnp.asarray(rng.randn(b, 9, 64), jnp.float32) * 0.3
    params = model.init(jax.random.PRNGKey(0), x, prepend_embeds=prep, context=ctx)

    def run(p):
        return model.apply(p, x, prepend_embeds=prep, context=ctx)

    monkeypatch.setenv("FSAT_FORCE_SEQ_PAD", "1")
    padded = run(params)
    g1 = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)
    monkeypatch.setenv("FSAT_DISABLE_SEQ_PAD", "1")
    plain = run(params)
    g2 = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)

    assert padded.shape == plain.shape == (b, t + 2, dim)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(plain), atol=2e-3)
    l1, _ = jax.flatten_util.ravel_pytree(g1)
    l2, _ = jax.flatten_util.ravel_pytree(g2)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=5e-3)


def test_flash_attention_kv_len_prepadded():
    """flash_attention(kv_len=): pre-padded aligned inputs, true length mask;
    valid rows match unpadded flash, forward and grad."""
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import flash_attention

    rng = np.random.RandomState(11)
    b, h, t, d = 1, 2, 1026, 64
    tp_ = 1152
    q = jnp.asarray(rng.randn(b, h, t, d), jnp.float32) * 0.3
    pad = ((0, 0), (0, 0), (0, tp_ - t), (0, 0))
    qp = jnp.pad(q, pad)

    ref = flash_attention(q, q, q)
    got = flash_attention(qp, qp, qp, kv_len=t)
    assert got.shape[2] == tp_
    np.testing.assert_allclose(np.asarray(got[:, :, :t]), np.asarray(ref), atol=2e-3)

    # grad: padded-row cotangents zero (the pipeline invariant)
    def loss_padded(qp_):
        out = flash_attention(qp_, qp_, qp_, kv_len=t)
        return jnp.sum(out[:, :, :t] ** 2)

    def loss_plain(q_):
        return jnp.sum(flash_attention(q_, q_, q_) ** 2)

    gp = jax.grad(loss_padded)(qp)
    gr = jax.grad(loss_plain)(q)
    np.testing.assert_allclose(np.asarray(gp[:, :, :t]), np.asarray(gr), atol=5e-3)
    np.testing.assert_allclose(np.asarray(gp[:, :, t:]), 0.0, atol=1e-6)


def test_fused_pair_kv_len_prepadded():
    """Head-pair kernel with kv_len (16-aligned padded-sequence path): valid
    rows match the unpadded fused path, forward and grad, and padded-row
    cotangents are zero."""
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
        fused_qkv_rope_attention,
    )
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    rng = np.random.RandomState(13)
    b, t, h, d = 2, 130, 2, 64
    tp_ = 144  # 16-multiple
    qkv = jnp.asarray(rng.randn(b, t, 3 * h * d), jnp.float32) * 0.3
    qkvp = jnp.pad(qkv, ((0, 0), (0, tp_ - t), (0, 0)))
    freqs = rotary_freqs(t, 32)
    freqsp = rotary_freqs(tp_, 32)

    ref = fused_qkv_rope_attention(qkv, freqs, h)
    got = fused_qkv_rope_attention(qkvp, freqsp, h, kv_len=t)
    assert got.shape[1] == tp_
    np.testing.assert_allclose(np.asarray(got[:, :t]), np.asarray(ref), atol=2e-3)

    gp = jax.grad(lambda x: jnp.sum(
        fused_qkv_rope_attention(x, freqsp, h, kv_len=t)[:, :t] ** 2))(qkvp)
    gr = jax.grad(lambda x: jnp.sum(
        fused_qkv_rope_attention(x, freqs, h) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(gp[:, :t]), np.asarray(gr), atol=5e-3)
    np.testing.assert_allclose(np.asarray(gp[:, t:]), 0.0, atol=1e-6)


@pytest.mark.slow
def test_pair_eligible_seq_pad_16_aligned(monkeypatch):
    """ContinuousTransformer at a pair-kernel-eligible shape (dim_heads 64,
    even heads, CFG batch >= 4) pads to a 16-multiple (1026 -> 1040, not
    1152) and stays on the fused pair path; output == unpadded math."""
    from friendly_stable_audio_tools_tpu.models.transformer import ContinuousTransformer

    rng = np.random.RandomState(17)
    b, t, dim = 4, 1024, 128
    model = ContinuousTransformer(dim=dim, depth=1, dim_heads=64)
    x = jnp.asarray(rng.randn(b, t, dim), jnp.float32) * 0.3
    prep = jnp.asarray(rng.randn(b, 2, dim), jnp.float32) * 0.3
    params = model.init(jax.random.PRNGKey(0), x, prepend_embeds=prep)

    def run(p):
        return model.apply(p, x, prepend_embeds=prep)

    monkeypatch.setenv("FSAT_FORCE_SEQ_PAD", "1")
    monkeypatch.setenv("FSAT_FUSED_ATTN", "1")  # pair path despite CPU
    padded = run(params)
    g1 = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)
    monkeypatch.setenv("FSAT_DISABLE_SEQ_PAD", "1")
    plain = run(params)
    g2 = jax.grad(lambda p: jnp.sum(run(p) ** 2))(params)

    assert padded.shape == plain.shape == (b, t + 2, dim)
    np.testing.assert_allclose(np.asarray(padded), np.asarray(plain), atol=2e-3)
    l1, _ = jax.flatten_util.ravel_pytree(g1)
    l2, _ = jax.flatten_util.ravel_pytree(g2)
    # grad through the kv_len custom_vjp (training with the padded stack)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), atol=5e-3)


def test_pair_long_matches_reference():
    """Long-sequence pair path (t > 2048: gridded q blocks + pair-layout
    K-rope kernel) == unfused split/rope/attn reference, incl. kv_len
    masking and grad."""
    import friendly_stable_audio_tools_tpu.ops.pallas.flash_attention as fa
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    rng = np.random.RandomState(19)
    b, t, h, d = 1, 2176, 2, 64  # > 2048 -> _pair_long; 2176 = 17 * 128
    qkv = jnp.asarray(rng.randn(b, t, 3 * h * d), jnp.float32) * 0.3
    freqs = rotary_freqs(t, 32)

    got = fa._pair_long(qkv, freqs, h)
    ref = fa._fused_reference(qkv, freqs, h)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-3)

    # kv_len: pre-padded input, valid rows match, pad-row grads zero
    valid = 2050
    qv = qkv[:, :valid]
    ref_v = fa._fused_reference(qv, rotary_freqs(valid, 32), h)
    got_v = fa._pair_long(jnp.pad(qv, ((0, 0), (0, t - valid), (0, 0))),
                          freqs, h, valid)
    np.testing.assert_allclose(np.asarray(got_v[:, :valid]), np.asarray(ref_v),
                               atol=2e-3)

    g1 = jax.grad(lambda x: jnp.sum(fa._pair_long(x, freqs, h) ** 2))(qkv)
    g2 = jax.grad(lambda x: jnp.sum(fa._fused_reference(x, freqs, h) ** 2))(qkv)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), atol=3e-3)


def test_flash_attention_causal_bwd_multichunk():
    """Causal backward across multiple BWD_CHUNKs: the chunk-skipping bounds
    (dq: n_active k chunks; dkv: start q chunk) must not drop contributions
    at chunk boundaries. L=1100 spans 3 chunks of 512."""
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
        flash_attention, _xla_reference,
    )

    rng = np.random.RandomState(11)
    B, H, L, D = 1, 1, 1100, 64
    q = jnp.asarray(rng.randn(B, H, L, D), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(B, H, L, D), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(B, H, L, D), jnp.float32) * 0.3
    g = jnp.asarray(rng.randn(B, H, L, D), jnp.float32)

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, causal=True) * g)

    def loss_ref(q, k, v):
        o = _xla_reference(q.reshape(B * H, L, D), k.reshape(B * H, L, D),
                           v.reshape(B * H, L, D), True)
        return jnp.sum(o.reshape(B, H, L, D) * g)

    gf = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for name, a, b in zip("qkv", gf, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=6e-3,
                                   err_msg=f"d{name}")


def test_single_dot_block_picker_respects_vmem_budget():
    """At 512-multiple lengths near SINGLE_DOT_MAX_TK an unconstrained 512
    q-block's fp32 score tile alone exceeds scoped VMEM; the picker must
    degrade the block size instead of crashing Mosaic on the real chip."""
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
        _SINGLE_DOT_VMEM_BUDGET, _pick_block_q, _single_dot_fits,
    )

    # SAO hot shape: zero-waste 512 block fits comfortably at t_k ~1k
    assert _pick_block_q(1026, 256, True, 1152, 64) in (128, 256, 384, 512)
    # t = 8192 (the documented single-dot boundary): 512 must NOT be picked
    b = _pick_block_q(8192, 256, True, 8192, 64)
    assert _single_dot_fits(b, 8192, 64), b
    assert b * 8192 * 6 <= _SINGLE_DOT_VMEM_BUDGET
    # 6144 (long-form latents, 512-multiple): picked block must fit too
    b = _pick_block_q(6144, 256, True, 6144, 64)
    assert _single_dot_fits(b, 6144, 64), b


def test_glu_mlp_matches_xla_fwd_and_grad():
    """Fused SwiGLU MLP kernel vs the unfused XLA chain, fwd + grad,
    including a non-multiple-of-block M (2052 = CFG batch 2 x 1026 tokens,
    not even 16-aligned) and the no-bias path."""
    from friendly_stable_audio_tools_tpu.ops.pallas.mlp import glu_mlp, _xla_reference

    rng = np.random.RandomState(3)
    k, inner, k_out = 128, 256, 128
    for m, use_bias in ((2052, True), (384, False), (100, True)):
        x = jnp.asarray(rng.randn(m, k), jnp.float32) * 0.3
        wv = jnp.asarray(rng.randn(k, inner), jnp.float32) * 0.05
        wg = jnp.asarray(rng.randn(k, inner), jnp.float32) * 0.05
        wo = jnp.asarray(rng.randn(inner, k_out), jnp.float32) * 0.05
        if use_bias:
            bv = jnp.asarray(rng.randn(inner), jnp.float32) * 0.1
            bg = jnp.asarray(rng.randn(inner), jnp.float32) * 0.1
        else:
            bv = bg = jnp.zeros((inner,), jnp.float32)
        got = glu_mlp(x, wv, wg, wo, None if not use_bias else bv,
                      None if not use_bias else bg, block_m=512, block_j=128)
        ref = _xla_reference(x, wv, wg, wo, bv, bg)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)

        # grad flows through the XLA-recompute vjp — must match the chain's
        def loss_fused(args):
            return (glu_mlp(args[0], args[1], args[2], args[3], bv, bg,
                            block_m=512, block_j=128) ** 2).sum()

        def loss_ref(args):
            return (_xla_reference(args[0], args[1], args[2], args[3], bv, bg) ** 2).sum()

        gf = jax.grad(loss_fused)((x, wv, wg, wo))
        gr = jax.grad(loss_ref)((x, wv, wg, wo))
        for a, b in zip(gf, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4)


def test_feedforward_fused_mlp_path_matches_unfused(monkeypatch):
    """FeedForward with FSAT_FUSED_MLP=1 routes through glu_mlp with an
    IDENTICAL param tree and near-identical outputs (leading batch/time dims
    exercise the reshape); 3D input, biases present, zero-init de-zeroed."""
    from friendly_stable_audio_tools_tpu.models.transformer import FeedForward

    ff = FeedForward(dim=128, mult=2, zero_init_output=False)
    rng = np.random.RandomState(4)
    x = jnp.asarray(rng.randn(2, 36, 128), jnp.float32) * 0.3

    monkeypatch.delenv("FSAT_FUSED_MLP", raising=False)
    params = ff.init(jax.random.PRNGKey(0), x)["params"]
    ref = ff.apply({"params": params}, x)

    monkeypatch.setenv("FSAT_FUSED_MLP", "1")
    params_fused = ff.init(jax.random.PRNGKey(0), x)["params"]
    assert jax.tree_util.tree_structure(params) == jax.tree_util.tree_structure(params_fused)
    got = ff.apply({"params": params}, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-4)


def test_fused_single_pass_backward_matches_two_pass(monkeypatch):
    """The fused single-pass backward (5 dots, 16-aligned padding) vs the
    two-pass FA2 kernels (FSAT_FUSED_BWD=0), including multi-q-block dk/dv
    accumulation (VMEM budget shrunk so the plan picks >1 block) and kv_len
    masking."""
    import friendly_stable_audio_tools_tpu.ops.pallas.flash_attention as fa

    rng = np.random.RandomState(7)
    bh, t, d = 3, 272, 64
    kv_len = 260
    q = jnp.asarray(rng.randn(bh, t, d), jnp.float32) * 0.3
    k = jnp.asarray(rng.randn(bh, t, d), jnp.float32) * 0.3
    v = jnp.asarray(rng.randn(bh, t, d), jnp.float32) * 0.3
    g = jnp.asarray(rng.randn(bh, t, d), jnp.float32)
    g = g.at[:, kv_len:].set(0.0)  # pipeline invariant: padded rows no cotangent

    out, lse = fa._flash_forward(q, k, v, False, fa.DEFAULT_BLOCK_Q,
                                 fa.DEFAULT_BLOCK_K, save_stats=True, kv_len=kv_len)

    # force multi-block: budget that fits 136-row blocks but not 272
    real_fits = fa._bwd_fused_fits
    monkeypatch.setattr(fa, "_bwd_fused_fits",
                        lambda bq, tkp, dd: bq <= 136 and real_fits(bq, tkp, dd))
    plan = fa._bwd_fused_plan(t, t, d)
    assert plan is not None and plan[1] < t  # >1 q block

    fused = fa._flash_backward_fused(q, k, v, out, lse, g, kv_len=kv_len)
    assert fused is not None

    monkeypatch.setenv("FSAT_FUSED_BWD", "0")
    ref = fa._flash_backward(q, k, v, out, lse, g, False,
                             fa.DEFAULT_BLOCK_Q, fa.DEFAULT_BLOCK_K, kv_len=kv_len)
    for a, b in zip(fused, ref):
        np.testing.assert_allclose(np.asarray(a[:, :kv_len]),
                                   np.asarray(b[:, :kv_len]), atol=5e-3)


def test_pair_layout_backward_matches_unpack_path(monkeypatch):
    """Pair-layout training backward (stats fwd + _pair_backward) vs the
    unpack+FA2 path (FSAT_PAIR_BWD=0), with >1 q block (dk/dv grid
    accumulation + per-block dq un-rope) and kv_len masking."""
    import friendly_stable_audio_tools_tpu.ops.pallas.flash_attention as fa
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

    rng = np.random.RandomState(9)
    b, t, h, d = 2, 272, 4, 64
    kv_len = 260
    qkv = jnp.asarray(rng.randn(b, t, 3 * h * d), jnp.float32) * 0.3
    freqs = rotary_freqs(t, 32)
    g = jnp.asarray(rng.randn(b, t, h * d), jnp.float32)
    g = g.at[:, kv_len:].set(0.0)

    # force multiple q blocks in the pair backward
    real_plan = fa._pair_bwd_plan
    monkeypatch.setattr(fa, "_pair_bwd_plan",
                        lambda tp_, dd: min(real_plan(tp_, dd) or tp_, tp_ // 2))
    assert fa._pair_bwd_eligible(t, d, h)

    def loss(qkv):
        out = fa._fused_pair(qkv, freqs, h, kv_len)
        return jnp.sum(out[:, :kv_len].astype(jnp.float32) ** 2)

    got = jax.grad(loss)(qkv)

    monkeypatch.setenv("FSAT_PAIR_BWD", "0")
    ref = jax.grad(loss)(qkv)
    np.testing.assert_allclose(np.asarray(got[:, :kv_len]),
                               np.asarray(ref[:, :kv_len]), atol=6e-3)
    # padded-row cotangents stay zero on both paths
    np.testing.assert_allclose(np.asarray(got[:, kv_len:]), 0.0, atol=1e-6)


@pytest.mark.parametrize("stride,cin,cout", [(2, 16, 32), (4, 32, 16), (8, 8, 8)])
def test_snake_downsample_gemm_matches_xla(stride, cin, cout):
    """Encoder downsample reshape-GEMM form == XLA strided conv (+ separate
    cos-form snake), forward and grad, with and without snake."""
    from friendly_stable_audio_tools_tpu.ops.convs import conv1d
    from friendly_stable_audio_tools_tpu.ops.pallas.conv1d import snake_downsample_conv1d

    rng = np.random.RandomState(6)
    t = 64 * stride
    x = jnp.asarray(rng.randn(2, t, cin), jnp.float32) * 0.3
    w = jnp.asarray(rng.randn(2 * stride, cin, cout), jnp.float32) * 0.05
    bias = jnp.asarray(rng.randn(cout), jnp.float32) * 0.1
    a = jnp.asarray(np.abs(rng.randn(cin)) + 0.5, jnp.float32)
    ib = jnp.asarray(np.abs(rng.randn(cin)) + 0.5, jnp.float32)

    def ref(x, snake):
        h = x
        if snake:
            h = h + 0.5 * ib * (1.0 - jnp.cos(2.0 * a * h))
        return conv1d(h, w, stride, stride // 2) + bias

    for snake in (False, True):
        al, ibv = (a, ib) if snake else (None, None)
        got = snake_downsample_conv1d(x, w, bias, al, ibv, stride)
        want = ref(x, snake)
        assert got.shape == want.shape == (2, t // stride, cout)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-4)
        g = jax.grad(lambda x: (snake_downsample_conv1d(x, w, bias, al, ibv, stride) ** 2).sum())(x)
        gr = jax.grad(lambda x: (ref(x, snake) ** 2).sum())(x)
        np.testing.assert_allclose(np.asarray(g), np.asarray(gr), atol=2e-3)


def test_ln_modulate_matches_xla(monkeypatch):
    """Fused adaLN LN+modulate kernel vs the eager LayerNorm+modulate chain."""
    monkeypatch.setenv("FSAT_FUSED_EW", "1")
    from friendly_stable_audio_tools_tpu.ops.pallas import elementwise as ew

    rng = np.random.RandomState(0)
    for (b, t, d) in ((2, 130, 128), (1, 64, 256)):
        x = jnp.asarray(rng.randn(b, t, d), jnp.bfloat16)
        gamma = jnp.asarray(1 + 0.1 * rng.randn(d), jnp.float32)
        scale = jnp.asarray(0.2 * rng.randn(b, 1, d), jnp.bfloat16)
        shift = jnp.asarray(0.2 * rng.randn(b, 1, d), jnp.bfloat16)
        got = ew.ln_modulate(x, gamma, scale, shift)
        ref = ew._lnmod_xla(x, gamma, scale, shift)
        assert got.dtype == ref.dtype == jnp.bfloat16
        np.testing.assert_allclose(np.asarray(got, np.float32),
                                   np.asarray(ref, np.float32), atol=3e-2)
        # fix_scale form (gamma=None)
        got0 = ew.ln_modulate(x, None, scale, shift)
        ref0 = ew._lnmod_xla(x, None, scale, shift)
        np.testing.assert_allclose(np.asarray(got0, np.float32),
                                   np.asarray(ref0, np.float32), atol=3e-2)
        # backward recomputes through the XLA chain
        gk = jax.grad(lambda x: jnp.sum(
            ew.ln_modulate(x, gamma, scale, shift).astype(jnp.float32) ** 2))(x)
        gx = jax.grad(lambda x: jnp.sum(
            ew._lnmod_xla(x, gamma, scale, shift).astype(jnp.float32) ** 2))(x)
        np.testing.assert_allclose(np.asarray(gk, np.float32),
                                   np.asarray(gx, np.float32), atol=3e-2)


def test_gated_residual_matches_xla(monkeypatch):
    monkeypatch.setenv("FSAT_FUSED_EW", "1")
    from friendly_stable_audio_tools_tpu.ops.pallas import elementwise as ew

    rng = np.random.RandomState(1)
    b, t, d = 2, 100, 128
    y = jnp.asarray(rng.randn(b, t, d), jnp.bfloat16)
    gate = jnp.asarray(rng.randn(b, 1, d), jnp.bfloat16)
    res = jnp.asarray(rng.randn(b, t, d), jnp.bfloat16)
    got = ew.gated_residual(y, gate, res)
    ref = ew._gres_xla(y, gate, res)
    assert got.dtype == jnp.bfloat16
    # kernel computes the sigmoid-mul in fp32 then rounds once; the eager
    # bf16 chain rounds twice — differences are bounded by one bf16 ulp
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=3e-2, rtol=3e-2)
    gk = jax.grad(lambda y: jnp.sum(
        ew.gated_residual(y, gate, res).astype(jnp.float32) ** 2))(y)
    gx = jax.grad(lambda y: jnp.sum(
        ew._gres_xla(y, gate, res).astype(jnp.float32) ** 2))(y)
    np.testing.assert_allclose(np.asarray(gk, np.float32),
                               np.asarray(gx, np.float32), atol=3e-2, rtol=3e-2)


def test_transformer_block_fused_ew_matches_unfused(monkeypatch):
    """End-to-end TransformerBlock with FSAT_FUSED_EW on vs off (adaLN path)."""
    from friendly_stable_audio_tools_tpu.models.transformer import TransformerBlock
    from friendly_stable_audio_tools_tpu.utils.common import dezero_params

    rng = np.random.RandomState(2)
    blk = TransformerBlock(dim=128, dim_heads=32, global_cond_dim=64)
    x = jnp.asarray(rng.randn(2, 64, 128), jnp.bfloat16)
    g = jnp.asarray(rng.randn(2, 64), jnp.bfloat16)
    params = blk.init(jax.random.PRNGKey(0), x, global_cond=g)
    params = dezero_params(params)
    params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), params)

    monkeypatch.delenv("FSAT_FUSED_EW", raising=False)
    ref = blk.apply(params, x, global_cond=g)
    monkeypatch.setenv("FSAT_FUSED_EW", "1")
    got = blk.apply(params, x, global_cond=g)
    np.testing.assert_allclose(np.asarray(got, np.float32),
                               np.asarray(ref, np.float32), atol=5e-2)
