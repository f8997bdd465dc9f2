"""Flash attention Pallas kernel for TPU.

Replaces the reference's FlashAttention-2 CUDA dependency
(reference models/transformer.py:14-19,496-504) for the DiT self-attention
hot path (1024-6144 latent tokens, head_dim 64/128).

Design (measured on v5e):
  * all MXU dots run bf16 x bf16 -> fp32 accumulate. fp32 operands would
    drop the MXU to multi-pass mode — the original sin of slow TPU attention.
  * moderate sequences (t_k <= SINGLE_DOT_MAX_TK): ONE [bq, t_k] score dot
    per q block with the full K/V resident in VMEM, exact softmax, and the
    1/l normalization applied to the [bq, d] OUTPUT instead of the [bq, t_k]
    probability matrix (saves a full VPU pass over the score tile).
  * long sequences / causal: online-softmax fori_loop over K blocks
    (O(seq) VMEM); causal variant skips fully-masked K blocks via the grid
    index.
  * backward pass: FlashAttention-2-style custom Pallas kernels — the
    forward saves per-row softmax stats (m, l); backward runs two passes,
    dq over q blocks and dk/dv over k blocks, each recomputing its P tile
    in VMEM (no [T, T] materialization in HBM). CPU falls back to the XLA
    vjp.

Perf note: at head_dim 64 the score/PV dots use half the MXU's 128-wide
contraction, capping attention at ~0.5x GEMM peak regardless of scheduling;
softmax VPU passes are the other half of the budget. The single-dot variant
measures ~1.4x faster than the online-softmax loop at DiT shapes
([48, 1025, 64]: 0.45ms vs 0.62ms per layer).
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _interpret() -> bool:
    """FSAT_PALLAS_INTERPRET=1 runs the kernels in Pallas interpret mode
    (pure Python/XLA emulation) so the CPU test suite exercises kernel logic
    without TPU hardware."""
    import os

    return os.environ.get("FSAT_PALLAS_INTERPRET") == "1"

DEFAULT_BLOCK_Q = 256
DEFAULT_BLOCK_K = 512
# scores tile bq x tk fp32 must fit scoped VMEM (16 MB) alongside K/V
SINGLE_DOT_MAX_TK = 8192
NEG_INF = -1e30


def _single_dot_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, scale: float, kv_len: int,
                       save_stats: bool):
    """Whole-K attention for one q block: one score dot, exact softmax,
    normalization on the output."""
    s = jax.lax.dot_general(
        q_ref[:], k_ref[:], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if kv_len < k_ref.shape[0]:
        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kpos < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if save_stats:
        lse_ref[:] = jnp.broadcast_to(m + jnp.log(jnp.maximum(l, 1e-30)), lse_ref.shape)


def _online_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, causal: bool,
                   scale: float, kv_len: int, save_stats: bool):
    bq = q_ref.shape[0]
    t_k = k_ref.shape[0]
    d = q_ref.shape[1]
    n_k = t_k // block_k
    qi = pl.program_id(1)

    q = q_ref[:]

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(j * block_k, block_k), :]
        v = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        k_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        if causal:
            q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        if kv_len % block_k != 0:
            s = jnp.where(k_pos < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp(s - m_new)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + jnp.sum(p, axis=1, keepdims=True)
        acc_new = acc * alpha + jax.lax.dot_general(
            p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    m0 = jnp.full((bq, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((bq, 1), jnp.float32)
    acc0 = jnp.zeros((bq, d), jnp.float32)

    if causal:
        # only K blocks overlapping [0, (qi+1)*bq) contribute
        n_active = jnp.minimum(((qi + 1) * bq + block_k - 1) // block_k, n_k)
        m, l, acc = jax.lax.fori_loop(0, n_active, body, (m0, l0, acc0))
    else:
        m, l, acc = jax.lax.fori_loop(0, n_k, body, (m0, l0, acc0))

    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if save_stats:
        lse_ref[:] = jnp.broadcast_to(m + jnp.log(jnp.maximum(l, 1e-30)), lse_ref.shape)


STAT_LANES = 128  # lse stored broadcast over one lane tile (layout-friendly)


def _flash_forward(q, k, v, causal: bool, block_q: int, block_k: int,
                   save_stats: bool = False):
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    single_dot = (not causal) and t_k <= SINGLE_DOT_MAX_TK

    # pad to block multiples
    pq = (block_q - t_q % block_q) % block_q
    k_align = 128 if single_dot else block_k
    pk = (k_align - t_k % k_align) % k_align
    if pq:
        q = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
    if pk:
        # padded K positions are masked to NEG_INF inside the kernel (kv_len)
        k = jnp.pad(k, ((0, 0), (0, pk), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))

    t_qp, t_kp = q.shape[1], k.shape[1]

    if single_dot:
        kernel = functools.partial(_single_dot_kernel, scale=scale, kv_len=t_k,
                                   save_stats=save_stats)
    else:
        kernel = functools.partial(_online_kernel, block_k=block_k, causal=causal,
                                   scale=scale, kv_len=t_k, save_stats=save_stats)
    if not save_stats:
        # inference: no stats output (its write-back would cost real HBM BW)
        kernel = functools.partial(kernel, lse_ref=None)

    out_specs = [pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, t_qp, d), q.dtype)]
    if save_stats:
        out_specs.append(pl.BlockSpec((None, block_q, STAT_LANES), lambda b, i: (b, i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((bh, t_qp, STAT_LANES), jnp.float32))

    res = pl.pallas_call(
        kernel,
        grid=(bh, t_qp // block_q),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
    )(q, k, v)

    out = res[0]
    if pq:
        out = out[:, :t_q]
    return (out, res[1]) if save_stats else out


def _xla_reference(q, k, v, causal):
    scale = 1.0 / math.sqrt(q.shape[-1])
    logits = jnp.einsum("bid,bjd->bij", q.astype(jnp.float32), k.astype(jnp.float32)) * scale
    if causal:
        i, j = q.shape[-2], k.shape[-2]
        mask = jnp.tril(jnp.ones((i, j), bool), k=j - i)
        logits = jnp.where(mask, logits, -1e30)
    p = jax.nn.softmax(logits, axis=-1)
    return jnp.einsum("bij,bjd->bid", p.astype(v.dtype), v).astype(q.dtype)


# ---------------------------------------------------------------------------
# backward: FlashAttention-2 two-pass recomputation with saved LSE
# ---------------------------------------------------------------------------

BWD_CHUNK = 512  # inner fori chunk over the non-gridded sequence axis


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dq_ref, *,
                   scale: float, kv_len: int, causal: bool, block_q: int):
    t_kp, d = k_ref.shape
    bq = q_ref.shape[0]
    qi = pl.program_id(1)
    q = q_ref[:]
    do = do_ref[:]
    # D_i = rowsum(dO * O) (fp32)
    dcap = jnp.sum(do.astype(jnp.float32) * o_ref[:].astype(jnp.float32), axis=1, keepdims=True)
    lse = lse_ref[:, :1]
    n_chunks = t_kp // BWD_CHUNK

    def body(j, acc):
        k = k_ref[pl.ds(j * BWD_CHUNK, BWD_CHUNK), :]
        v = v_ref[pl.ds(j * BWD_CHUNK, BWD_CHUNK), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        k_pos = j * BWD_CHUNK + jax.lax.broadcasted_iota(jnp.int32, (bq, BWD_CHUNK), 1)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (bq, BWD_CHUNK), 0)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        if kv_len % BWD_CHUNK != 0 or kv_len < t_kp:
            s = jnp.where(k_pos < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - dcap) * scale).astype(q.dtype)
        return acc + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    acc = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = acc.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, o_ref, lse_ref, dk_ref, dv_ref, *,
                         scale: float, kv_len: int, causal: bool, block_k: int):
    t_qp, d = q_ref.shape
    bk = k_ref.shape[0]
    ki = pl.program_id(1)
    k = k_ref[:]
    v = v_ref[:]
    n_chunks = t_qp // BWD_CHUNK

    def body(i, carry):
        dk, dv = carry
        q = q_ref[pl.ds(i * BWD_CHUNK, BWD_CHUNK), :]
        do = do_ref[pl.ds(i * BWD_CHUNK, BWD_CHUNK), :]
        o = o_ref[pl.ds(i * BWD_CHUNK, BWD_CHUNK), :]
        lse = lse_ref[pl.ds(i * BWD_CHUNK, BWD_CHUNK), :1]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * scale
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (BWD_CHUNK, bk), 1)
        if causal:
            q_pos = i * BWD_CHUNK + jax.lax.broadcasted_iota(jnp.int32, (BWD_CHUNK, bk), 0)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        if kv_len % block_k != 0:
            s = jnp.where(k_pos < kv_len, s, NEG_INF)
        p = jnp.exp(s - lse)  # padded q rows have do = 0, so they contribute 0
        pb = p.astype(do.dtype)
        dv = dv + jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dcap = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32), axis=1, keepdims=True)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - dcap) * scale).astype(q.dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    z = jnp.zeros((bk, d), jnp.float32)
    dk, dv = jax.lax.fori_loop(0, n_chunks, body, (z, z))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, causal, block_q, block_k):
    """FA2 backward: dq gridded over q blocks, dk/dv gridded over k blocks."""
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    scale = 1.0 / math.sqrt(d)

    # bwd blocks are independent of the fwd's; clamp to the chunk size so
    # padded lengths stay multiples of both the block and BWD_CHUNK
    block_q = min(block_q, BWD_CHUNK)
    block_k = min(block_k, BWD_CHUNK)
    pq = (-t_q) % BWD_CHUNK
    pk = (-t_k) % BWD_CHUNK
    qp = jnp.pad(q, ((0, 0), (0, pq), (0, 0)))
    dop = jnp.pad(g, ((0, 0), (0, pq), (0, 0)))
    op = jnp.pad(out, ((0, 0), (0, pq), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, pk), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, pk), (0, 0)))
    # lse comes padded to the forward's q padding; re-pad to bwd alignment.
    # padded q rows: lse = 0 -> p = exp(s) finite; their do rows are zero.
    lsep = jnp.pad(lse[:, :t_q], ((0, 0), (0, pq), (0, 0)))
    t_qp, t_kp = qp.shape[1], kp.shape[1]

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=t_k, causal=causal,
                          block_q=block_q),
        grid=(bh, t_qp // block_q),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, STAT_LANES), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t_qp, d), q.dtype),
    )(qp, kp, vp, dop, op, lsep)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=t_k, causal=causal,
                          block_k=block_k),
        grid=(bh, t_kp // block_k),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, t_qp, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, t_qp, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, t_qp, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, t_qp, STAT_LANES), lambda b, j: (b, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_kp, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t_kp, d), q.dtype),
        ],
    )(qp, kp, vp, dop, op, lsep)

    return dq[:, :t_q], dk[:, :t_k], dv[:, :t_k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def _flash(q, k, v, causal, block_q, block_k):
    return _flash_forward(q, k, v, causal, block_q, block_k)


def _flash_fwd(q, k, v, causal, block_q, block_k):
    out, lse = _flash_forward(q, k, v, causal, block_q, block_k, save_stats=True)
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, block_q, block_k, res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g, causal, block_q, block_k)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, causal: bool = False,
                    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K):
    """q/k/v: [B, H, T, D] -> [B, H, T, D]. Self-attention (Tq == Tk), no
    padding mask (the DiT inference path guarantees this; ops/attention.py
    falls back to the XLA path otherwise)."""
    b, h, t, d = q.shape
    bq = min(block_q, (t + 7) // 8 * 8)
    bk = min(block_k, (t + 7) // 8 * 8)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t, d)
    vf = v.reshape(b * h, t, d)
    out = _flash(qf, kf, vf, causal, bq, bk)
    return out.reshape(b, h, t, d)
