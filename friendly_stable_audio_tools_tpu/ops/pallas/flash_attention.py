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
    in VMEM (no [T, T] materialization in HBM). The non-gridded sequence
    operands (whole K/V for dq, whole Q/dO + stats for dk/dv) live in VMEM,
    which caps the trainable sequence length at roughly 24-32k tokens at
    head_dim 64 — 4-5x the longest model in this family (SA-2.0, 6144+2).
    CPU falls back to the XLA vjp.

Perf note: at head_dim 64 the score/PV dots use half the MXU's 128-wide
contraction, capping attention at ~0.5x GEMM peak regardless of scheduling;
softmax VPU passes are the other half of the budget. The single-dot variant
measures ~1.4x faster than the online-softmax loop at DiT shapes
([48, 1025, 64]: 0.45ms vs 0.62ms per layer).
"""

from __future__ import annotations

import functools
import math
import os

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

# Softmax runs in base 2: the VPU's transcendental unit computes exp(x) as
# exp2(x * log2(e)) with an extra per-element multiply; folding log2(e) into
# the score scale (one scalar) removes that multiply from every element of
# every [bq, t_k] tile. All in-kernel softmax stats (m, lse) live in base-2
# space; exp(s*scale - lse_e) == exp2(s*scale*LOG2E - lse_2) exactly.
LOG2E = 1.4426950408889634


def _apply_rope_tile(t_ref, c_ref, s_ref, p_ref):
    """Reference partial rotary (transformer.py:164-183) on a VMEM tile:
    rope(t) = t*C + (t @ P)*S with P the rotate-half matrix and C/S cos/sin
    tables padded to identity over the non-rotary tail. The rotate-half dot
    runs in bf16 — P is a +-1 permutation so the product is EXACT for bf16
    inputs and stays on the MXU's single-pass mode (an fp32 dot here would
    triple the pass count); the cos/sin combine is fp32 like the reference.
    Returns bf16 for the MXU score dot."""
    t = t_ref[:]
    rot = jax.lax.dot(t.astype(jnp.bfloat16), p_ref[:].astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    t = t.astype(jnp.float32) * c_ref[:] + rot * s_ref[:]
    return t.astype(jnp.bfloat16)


def _apply_rope_tile_t(kt_ref, c_ref, s_ref, pt_ref):
    """Rope on an already-TRANSPOSED [d, t] K tile: rope(k)^T = k^T * C^T +
    (P^T @ k^T) * S^T — same math as _apply_rope_tile with every operand
    transposed, so the output feeds the score dot in its canonical
    [bq, d] @ [d, t] form with no in-kernel K transpose."""
    kt = kt_ref[:]
    rot = jax.lax.dot(pt_ref[:].astype(jnp.bfloat16), kt.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    kt = kt.astype(jnp.float32) * c_ref[:] + rot * s_ref[:]
    return kt.astype(jnp.bfloat16)


def _single_dot_core(q, kt, v_ref, o_ref, lse_ref, *, kv_len: int,
                     save_stats: bool):
    """Whole-K attention for one q block: one score dot, exact softmax,
    normalization on the output.

    q arrives PRESCALED by scale*LOG2E (folded into the q tile / rope tables
    — one [bq, d] multiply instead of a [bq, t_k] pass over the score tile)
    and kt arrives TRANSPOSED [d, t_k] (canonical [M,K]@[K,N] score dot; the
    MXU pays ~10% for a contracting-dim-1 RHS at head_dim 64 — measured
    0.179 vs 0.208 ms/layer at the SAO shape, scripts/attn_probe.py)."""
    s = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    if kv_len < kt.shape[1]:
        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kpos < kv_len, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(
        p.astype(v_ref.dtype), v_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
    if save_stats:
        lse_ref[:] = jnp.broadcast_to(m + jnp.log2(jnp.maximum(l, 1e-30)), lse_ref.shape)


def _single_dot_kernel(q_ref, kt_ref, v_ref, o_ref, lse_ref, *, scale: float,
                       kv_len: int, save_stats: bool):
    # prescale on the [bq, d] q tile (t_k/d-fold cheaper than scaling the
    # score tile); fp32 multiply, then back to the input dtype so bf16
    # callers keep single-pass MXU dots and fp32 callers keep exact math
    q = q_ref[:]
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    _single_dot_core(q, kt_ref[:], v_ref, o_ref, lse_ref,
                     kv_len=kv_len, save_stats=save_stats)


def _single_dot_rope_kernel(q_ref, kt_ref, v_ref, cq_ref, sq_ref, ckt_ref,
                            skt_ref, p_ref, pt_ref, o_ref, lse_ref, *,
                            kv_len: int, save_stats: bool):
    """Single-dot attention with the reference's fp32 partial rotary applied
    to q/k on the VMEM tiles (saves the separate rope HBM round trips).
    The q cos/sin tables arrive pre-multiplied by scale*LOG2E (prescale is
    FREE here — folded into the fp32 rope combine before its one bf16
    rounding); K is roped in its transposed layout."""
    q = _apply_rope_tile(q_ref, cq_ref, sq_ref, p_ref)
    kt = _apply_rope_tile_t(kt_ref, ckt_ref, skt_ref, pt_ref)
    _single_dot_core(q, kt, v_ref, o_ref, lse_ref,
                     kv_len=kv_len, save_stats=save_stats)


def _online_kernel(q_ref, k_ref, v_ref, o_ref, lse_ref, *, block_k: int, causal: bool,
                   scale: float, kv_len: int, save_stats: bool):
    bq = q_ref.shape[0]
    t_k = k_ref.shape[0]
    d = q_ref.shape[1]
    n_k = t_k // block_k
    qi = pl.program_id(1)

    # prescale q once ([bq, d] fp32 multiply, one bf16 rounding — same trick
    # as _single_dot_kernel) instead of a [bq, block_k] score-tile multiply
    # per K block
    q = q_ref[:]
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)

    def body(j, carry):
        m, l, acc = carry
        k = k_ref[pl.ds(j * block_k, block_k), :]
        v = v_ref[pl.ds(j * block_k, block_k), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        k_pos = j * block_k + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 1)
        if causal:
            q_pos = qi * bq + jax.lax.broadcasted_iota(jnp.int32, (bq, block_k), 0)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        if kv_len % block_k != 0 or kv_len < t_k:
            s = jnp.where(k_pos < kv_len, s, NEG_INF)
        m_new = jnp.maximum(m, jnp.max(s, axis=1, keepdims=True))
        p = jnp.exp2(s - m_new)
        alpha = jnp.exp2(m - m_new)
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
        lse_ref[:] = jnp.broadcast_to(m + jnp.log2(jnp.maximum(l, 1e-30)), lse_ref.shape)


STAT_LANES = 128  # lse stored broadcast over one lane tile (layout-friendly)


# VMEM working-set budget for the single-dot score tile: the fp32 scores
# (bq x t_kp) plus their bf16 probability copy plus resident K/V and q/o
# tiles must fit scoped VMEM (16 MB) with headroom for double buffering.
_SINGLE_DOT_VMEM_BUDGET = 12 * 2**20


def _single_dot_fits(bq: int, t_kp: int, d: int) -> bool:
    scores = bq * t_kp * 4        # fp32 score tile
    probs = bq * t_kp * 2         # bf16 p copy for the PV dot
    kv = 2 * t_kp * d * 2         # resident K and V
    qo = 2 * bq * d * 4           # q tile + fp32 acc
    return scores + probs + kv + qo <= _SINGLE_DOT_VMEM_BUDGET


def _pick_block_q(t_q: int, block_q: int, single_dot: bool, t_kp: int, d: int) -> int:
    """Pick the q block minimizing pad waste (the DiT's prepend tokens make
    t_q = latent_len + 2, never 128-aligned; a fixed 256 block pads 1026 ->
    1280 = +25% attention FLOPs), subject to the single-dot VMEM budget:
    at 512-multiple lengths near SINGLE_DOT_MAX_TK an unconstrained 512
    block's score tile alone exceeds scoped VMEM (512*8192*4 = 16.8 MB)."""
    if t_q <= 128:
        return (t_q + 7) // 8 * 8
    if not single_dot:
        return block_q
    cands = [b for b in (512, 384, 256, 128) if _single_dot_fits(b, t_kp, d)]
    if not cands:
        cands = [128]
    return min(cands, key=lambda b: ((-t_q) % b, -b))


def _flash_forward(q, k, v, causal: bool, block_q: int, block_k: int,
                   save_stats: bool = False, freqs=None, kv_len=None):
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    # kv_len: true K/V length when the caller pre-padded q/k/v to aligned
    # lengths (padded-sequence transformer path); padded output is returned.
    true_k = t_k if kv_len is None else kv_len
    scale = 1.0 / math.sqrt(d)

    single_dot = (not causal) and t_k <= SINGLE_DOT_MAX_TK
    t_kp_est = (t_k + 127) // 128 * 128 if single_dot else (t_k + block_k - 1) // block_k * block_k
    block_q = _pick_block_q(t_q, block_q, single_dot, t_kp_est, d)
    if single_dot and t_q <= 2048 and t_k <= 1536 and t_q > 128:
        # one program per (batch*head) when the score tile fits VMEM: fewer
        # per-program fixed costs, and the fused-rope variant ropes K once.
        # q only needs 16-row (bf16 sublane) alignment — the DiT's 1026
        # tokens pad to 1040, not 1152, saving ~10% of the q rows (measured
        # 0.179 vs 0.196 ms/layer, scripts/attn_probe.py); K stays 128-
        # aligned because t_k is the score tile's LANE dim.
        whole = (t_q + 15) // 16 * 16
        if _single_dot_fits(whole, t_kp_est, d):
            block_q = whole

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

    use_rope = freqs is not None
    if single_dot:
        # transposed-K layout: the one-time [bh, t_kp, d] -> [bh, d, t_kp]
        # transpose in HBM is far cheaper than the MXU's non-canonical
        # contracting-dim-1 score dot it replaces (scripts/attn_probe.py)
        kt = k.transpose(0, 2, 1)
    if use_rope:
        assert single_dot, "fused rope requires the single-dot path"
        prescale = scale * LOG2E
        cos, sin, p_mat = _rope_tables(freqs, d, t_q)
        cos_q = jnp.pad(cos * prescale, ((0, t_qp - t_q), (0, 0)),
                        constant_values=prescale)
        sin_q = jnp.pad(sin * prescale, ((0, t_qp - t_q), (0, 0)))
        cos_kt = jnp.pad(cos, ((0, t_kp - t_q), (0, 0)), constant_values=1.0).T
        sin_kt = jnp.pad(sin, ((0, t_kp - t_q), (0, 0))).T
        kernel = functools.partial(_single_dot_rope_kernel, kv_len=true_k,
                                   save_stats=save_stats)
    elif single_dot:
        kernel = functools.partial(_single_dot_kernel, scale=scale, kv_len=true_k,
                                   save_stats=save_stats)
    else:
        kernel = functools.partial(_online_kernel, block_k=block_k, causal=causal,
                                   scale=scale, kv_len=true_k, save_stats=save_stats)
    if not save_stats:
        # inference: no stats output (its write-back would cost real HBM BW)
        kernel = functools.partial(kernel, lse_ref=None)

    out_specs = [pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0))]
    out_shape = [jax.ShapeDtypeStruct((bh, t_qp, d), q.dtype)]
    if save_stats:
        out_specs.append(pl.BlockSpec((None, block_q, STAT_LANES), lambda b, i: (b, i, 0)))
        out_shape.append(jax.ShapeDtypeStruct((bh, t_qp, STAT_LANES), jnp.float32))

    in_specs = [
        pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
        (pl.BlockSpec((None, d, t_kp), lambda b, i: (b, 0, 0)) if single_dot
         else pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0))),
        pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
    ]
    args = [q, kt if single_dot else k, v]
    if use_rope:
        in_specs += [
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0)),
            pl.BlockSpec((block_q, d), lambda b, i: (i, 0)),
            pl.BlockSpec((d, t_kp), lambda b, i: (0, 0)),
            pl.BlockSpec((d, t_kp), lambda b, i: (0, 0)),
            pl.BlockSpec((d, d), lambda b, i: (0, 0)),
            pl.BlockSpec((d, d), lambda b, i: (0, 0)),
        ]
        args += [cos_q, sin_q, cos_kt, sin_kt, p_mat, p_mat.T]

    res = pl.pallas_call(
        kernel,
        grid=(bh, t_qp // block_q),
        interpret=_interpret(),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*args)

    out = res[0]
    if pq:
        out = out[:, :t_q]
    return (out, res[1]) if save_stats else out


def _xla_reference(q, k, v, causal):
    """Kernel-local 3D XLA attention for CPU fallback and parity tests.

    Deliberately NOT ops/attention.py's _xla_attention (importing it here
    would be a cycle: that module imports this one); kept minimal — no
    mask/kv_len handling — so there is little surface to drift."""
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


# -- fused single-pass backward (non-causal, moderate T: the training hot
# path). The two-pass kernels below recompute the score AND dp dots in both
# passes (7 dots per element tile) and pad both sequence axes to BWD_CHUNK
# multiples — at the SAO training shape (1040 tokens) that is 1536-padded,
# i.e. (1536/1040)^2 = 2.2x the true dot FLOPs, which round-4 measured as
# the training-MFU gap (scripts/bwd_probe.py: bwd at ~23 TFLOP/s-eq true).
# This kernel computes s/p/dp ONCE per (q-block, whole-K) tile and emits all
# three grads — 5 dots — with 16-aligned padding (1026 -> 1040 like the
# forward), accumulating dk/dv in fp32 across the sequential q-block grid
# iterations (out index_map ignores the q axis -> the block stays resident).


def _bwd_fused_kernel(q_ref, kt_ref, k_ref, vt_ref, do_ref, stats_ref,
                      dq_ref, dk_ref, dv_ref, *, scale: float, kv_len: int):
    i = pl.program_id(1)

    @pl.when(i == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    t_kp = k_ref.shape[0]
    q = q_ref[:]
    # prescale like the forward: one [bq, d] multiply, not a score-tile pass
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    do = do_ref[:]
    lse = stats_ref[:, :1]
    dcap = stats_ref[:, 1:2]
    s = jax.lax.dot_general(qs, kt_ref[:], (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len < t_kp:
        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
        s = jnp.where(kpos < kv_len, s, NEG_INF)
    p = jnp.exp2(s - lse)  # base-2 lse; padded q rows have do = 0 -> grads 0
    dp = jax.lax.dot_general(do, vt_ref[:], (((1,), (0,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # ds here is p*(dp - D) WITHOUT the scale factor; scale lands on the
    # [*, d] outputs instead (d-fold cheaper than scaling the score tile,
    # and dk reuses the PRESCALED q so the dot stays single-fetch:
    # dk = scale * ds^T q = (ds^T qs) / LOG2E).
    ds = (p * (dp - dcap)).astype(q.dtype)
    pb = p.astype(do.dtype)
    dq_ref[:] = (jax.lax.dot_general(ds, k_ref[:], (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
                 * scale).astype(dq_ref.dtype)
    dv_ref[:] += jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dk_ref[:] += jax.lax.dot_general(ds, qs, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32) * (1.0 / LOG2E)


def _bwd_fused_fits(bq: int, t_kp: int, d: int) -> bool:
    tiles = bq * t_kp * 12          # s fp32 + dp fp32 + p bf16 + ds bf16
    resid = (3 * t_kp * d * 2       # kt, k, vt resident
             + 2 * t_kp * d * 4     # fp32 dk/dv accumulators
             + 3 * bq * d * 4)      # q/do/dq tiles
    return tiles + resid <= 12 * 2**20


def _bwd_fused_plan(t_q: int, t_kp: int, d: int):
    """16-aligned q padding + a q-block count whose block divides it."""
    t_qp = (t_q + 15) // 16 * 16
    n_q = 1
    while n_q <= 64:
        blk, rem = divmod(t_qp, n_q)
        if rem == 0 and blk % 8 == 0 and _bwd_fused_fits(blk, t_kp, d):
            return t_qp, blk
        n_q += 1
    return None


def _flash_backward_fused(q, k, v, out, lse, g, kv_len):
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    scale = 1.0 / math.sqrt(d)
    t_kp = (t_k + 15) // 16 * 16
    plan = _bwd_fused_plan(t_q, t_kp, d)
    if plan is None:
        return None
    t_qp, block_q = plan

    qp = jnp.pad(q, ((0, 0), (0, t_qp - t_q), (0, 0)))
    dop = jnp.pad(g, ((0, 0), (0, t_qp - t_q), (0, 0)))
    op = jnp.pad(out, ((0, 0), (0, t_qp - t_q), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, t_kp - t_k), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, t_kp - t_k), (0, 0)))
    lsep = jnp.pad(lse[:, :t_q], ((0, 0), (0, t_qp - t_q), (0, 0)))

    delta = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32),
                    axis=2, keepdims=True)
    stats = jnp.concatenate([lsep[:, :, :1], delta], axis=2)
    stats = jnp.pad(stats, ((0, 0), (0, 0), (0, STAT_LANES - 2)))

    kt = kp.transpose(0, 2, 1)
    vt = vp.transpose(0, 2, 1)

    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, kv_len=kv_len),
        grid=(bh, t_qp // block_q),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, d, t_kp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, d, t_kp), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, STAT_LANES), lambda b, i: (b, i, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, t_qp, d), q.dtype),
            jax.ShapeDtypeStruct((bh, t_kp, d), jnp.float32),
            jax.ShapeDtypeStruct((bh, t_kp, d), jnp.float32),
        ],
    )(qp, kt, kp, vt, dop, stats)
    return (dq[:, :t_q], dk[:, :t_k].astype(q.dtype), dv[:, :t_k].astype(q.dtype))


def _bwd_dq_kernel(q_ref, k_ref, v_ref, do_ref, stats_ref, dq_ref, *,
                   scale: float, kv_len: int, causal: bool, block_q: int):
    """stats lanes: 0 = lse, 1 = D (rowsum(dO*O), precomputed once in XLA —
    FA2's D vector; recomputing it per kernel would stream the whole O
    tensor into every program)."""
    t_kp, d = k_ref.shape
    bq = q_ref.shape[0]
    qi = pl.program_id(1)
    q = q_ref[:]
    do = do_ref[:]
    lse = stats_ref[:, :1]
    dcap = stats_ref[:, 1:2]
    n_chunks = t_kp // BWD_CHUNK

    def body(j, acc):
        k = k_ref[pl.ds(j * BWD_CHUNK, BWD_CHUNK), :]
        v = v_ref[pl.ds(j * BWD_CHUNK, BWD_CHUNK), :]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (scale * LOG2E)
        k_pos = j * BWD_CHUNK + jax.lax.broadcasted_iota(jnp.int32, (bq, BWD_CHUNK), 1)
        if causal:
            q_pos = qi * block_q + jax.lax.broadcasted_iota(jnp.int32, (bq, BWD_CHUNK), 0)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        if kv_len % BWD_CHUNK != 0 or kv_len < t_kp:
            s = jnp.where(k_pos < kv_len, s, NEG_INF)
        p = jnp.exp2(s - lse)  # lse is base-2 (see LOG2E note at top)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - dcap) * scale).astype(q.dtype)
        return acc + jax.lax.dot_general(ds, k, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32)

    if causal:
        # q block qi sees only k chunks overlapping [0, qi*block_q + bq)
        n_active = jnp.minimum((qi * block_q + bq + BWD_CHUNK - 1) // BWD_CHUNK, n_chunks)
        acc = jax.lax.fori_loop(0, n_active, body, jnp.zeros((bq, d), jnp.float32))
    else:
        acc = jax.lax.fori_loop(0, n_chunks, body, jnp.zeros((bq, d), jnp.float32))
    dq_ref[:] = acc.astype(dq_ref.dtype)


def _bwd_dkv_kernel(q_ref, k_ref, v_ref, do_ref, stats_ref, dk_ref, dv_ref, *,
                         scale: float, kv_len: int, total_k: int, causal: bool,
                         block_k: int):
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
        lse = stats_ref[pl.ds(i * BWD_CHUNK, BWD_CHUNK), :1]
        dcap = stats_ref[pl.ds(i * BWD_CHUNK, BWD_CHUNK), 1:2]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32) * (scale * LOG2E)
        k_pos = ki * block_k + jax.lax.broadcasted_iota(jnp.int32, (BWD_CHUNK, bk), 1)
        if causal:
            q_pos = i * BWD_CHUNK + jax.lax.broadcasted_iota(jnp.int32, (BWD_CHUNK, bk), 0)
            s = jnp.where(k_pos <= q_pos, s, NEG_INF)
        if kv_len % block_k != 0 or kv_len < total_k:
            s = jnp.where(k_pos < kv_len, s, NEG_INF)
        p = jnp.exp2(s - lse)  # base-2 lse; padded q rows have do = 0 -> contribute 0
        pb = p.astype(do.dtype)
        dv = dv + jax.lax.dot_general(pb, do, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - dcap) * scale).astype(q.dtype)
        dk = dk + jax.lax.dot_general(ds, q, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
        return dk, dv

    z = jnp.zeros((bk, d), jnp.float32)
    if causal:
        # k block ki only receives gradient from q chunks at positions >= its
        # first k position
        start = (ki * block_k) // BWD_CHUNK
        dk, dv = jax.lax.fori_loop(start, n_chunks, body, (z, z))
    else:
        dk, dv = jax.lax.fori_loop(0, n_chunks, body, (z, z))
    dk_ref[:] = dk.astype(dk_ref.dtype)
    dv_ref[:] = dv.astype(dv_ref.dtype)


def _flash_backward(q, k, v, out, lse, g, causal, block_q, block_k, kv_len=None):
    """FA2 backward: dq gridded over q blocks, dk/dv gridded over k blocks.

    With kv_len set (pre-padded inputs), cotangents of padded q rows MUST be
    zero — guaranteed in the padded-sequence transformer because padded rows
    are sliced off the final output."""
    bh, t_q, d = q.shape
    t_k = k.shape[1]
    true_k = t_k if kv_len is None else kv_len
    scale = 1.0 / math.sqrt(d)

    if not causal and os.environ.get("FSAT_FUSED_BWD") != "0":
        fused = _flash_backward_fused(q, k, v, out, lse, g, kv_len=true_k)
        if fused is not None:
            return fused

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
    # padded q rows: lse = 0 -> p = exp2(s) finite; their do rows are zero.
    lsep = jnp.pad(lse[:, :t_q], ((0, 0), (0, pq), (0, 0)))
    t_qp, t_kp = qp.shape[1], kp.shape[1]

    # FA2's D = rowsum(dO * O), computed ONCE here and packed into lane 1 of
    # the stats buffer (lane 0 = lse). This removes the O tensor from both
    # kernels' inputs — the dkv kernel previously streamed the entire O into
    # every k-block program just to recompute D per chunk.
    delta = jnp.sum(dop.astype(jnp.float32) * op.astype(jnp.float32), axis=2, keepdims=True)
    stats = jnp.concatenate([lsep[:, :, :1], delta], axis=2)
    stats = jnp.pad(stats, ((0, 0), (0, 0), (0, STAT_LANES - 2)))

    dq = pl.pallas_call(
        functools.partial(_bwd_dq_kernel, scale=scale, kv_len=true_k, causal=causal,
                          block_q=block_q),
        grid=(bh, t_qp // block_q),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, t_kp, d), lambda b, i: (b, 0, 0)),
            pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
            pl.BlockSpec((None, block_q, STAT_LANES), lambda b, i: (b, i, 0)),
        ],
        out_specs=pl.BlockSpec((None, block_q, d), lambda b, i: (b, i, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, t_qp, d), q.dtype),
    )(qp, kp, vp, dop, stats)

    dk, dv = pl.pallas_call(
        functools.partial(_bwd_dkv_kernel, scale=scale, kv_len=true_k, total_k=t_kp,
                          causal=causal, block_k=block_k),
        grid=(bh, t_kp // block_k),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, t_qp, d), lambda b, j: (b, 0, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
            pl.BlockSpec((None, block_k, d), lambda b, j: (b, j, 0)),
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
    )(qp, kp, vp, dop, stats)

    return dq[:, :t_q], dk[:, :t_k], dv[:, :t_k]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def _flash(q, k, v, causal, block_q, block_k, kv_len=None):
    return _flash_forward(q, k, v, causal, block_q, block_k, kv_len=kv_len)


def _flash_fwd(q, k, v, causal, block_q, block_k, kv_len=None):
    out, lse = _flash_forward(q, k, v, causal, block_q, block_k, save_stats=True,
                              kv_len=kv_len)
    return out, (q, k, v, out, lse)


def _flash_bwd(causal, block_q, block_k, kv_len, res, g):
    q, k, v, out, lse = res
    return _flash_backward(q, k, v, out, lse, g, causal, block_q, block_k,
                           kv_len=kv_len)


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, causal: bool = False,
                    block_q: int = DEFAULT_BLOCK_Q, block_k: int = DEFAULT_BLOCK_K,
                    freqs=None, kv_len: int = None):
    """q/k/v: [B, H, Tq, D] / [B, H, Tk, D] -> [B, H, Tq, D]. Supports
    rectangular (cross) attention when not causal — short Tk (e.g. the DiT's
    ~130 cond tokens) is padded to lane alignment and masked via kv_len
    inside the kernel. `freqs` ([T', rot_dim] rotary angles, self-attention
    only) fuses the reference's fp32 partial rotary into the kernel. No
    padding mask (the DiT drops cross-attn masks for parity with the
    reference, dit.py:250-252; ops/attention.py falls back to the XLA path
    otherwise)."""
    b, h, t, d = q.shape
    t_k = k.shape[2]
    assert t == t_k or not causal, "causal rectangular attention unsupported"
    if kv_len is not None:
        # pre-padded inputs (padded-sequence transformer): q/k/v lengths are
        # already lane-aligned, kv_len is the true K/V length; the output
        # keeps the padded length (caller slices once at the end).
        assert freqs is None and not causal and kv_len <= t_k
        assert t % 8 == 0 and t_k % 8 == 0, "kv_len path expects aligned inputs"
    bq = min(block_q, (t + 7) // 8 * 8)
    bk = min(block_k, (t_k + 7) // 8 * 8)
    qf = q.reshape(b * h, t, d)
    kf = k.reshape(b * h, t_k, d)
    vf = v.reshape(b * h, t_k, d)
    if freqs is not None:
        assert t == t_k and not causal, "fused rope is for full self-attention"
        if t > 2048:
            # long sequences grid over many q blocks; in-kernel K-rope would
            # be recomputed per block — rope outside instead
            qf = _rope_outside(qf, freqs)
            kf = _rope_outside(kf, freqs)
            out = _flash(qf, kf, vf, causal, bq, bk, None)
        else:
            out = _flash_rope(qf, kf, vf, freqs, causal, bq, bk)
    else:
        out = _flash(qf, kf, vf, causal, bq, bk, kv_len)
    return out.reshape(b, h, t, d)


# ---------------------------------------------------------------------------
# rope-fused flash attention (the DiT self-attention hot path)
# ---------------------------------------------------------------------------
#
# The DiT hot loop computes qkv -> split -> head transposes -> fp32 rope over
# q and k -> flash attention. The rope pass alone is several HBM round trips
# over [B,H,T,D] fp32 tensors per layer (~2-3 ms of the 35 ms denoise step at
# SAO shapes). `flash_attention(..., freqs=...)` applies the reference's fp32
# partial rotary (transformer.py:164-183) on the q/k tiles in VMEM instead —
# rotate_half expressed as a tiny [D, D] matmul so the lane dim stays
# MXU-aligned — for zero extra HBM traffic. Training backward falls back to
# rope-outside + the standard FA2 backward kernels (one extra rope pass).


def _rope_tables(freqs, head_dim: int, t: int):
    """cos/sin tables for the LAST t positions of `freqs`, padded to head_dim
    (identity over the non-rotary tail), plus the rotate-half matrix P with
    rotate_half(x) == x @ P (within the rotary dims; zero elsewhere)."""
    import numpy as np

    rot = freqs.shape[-1]
    f = freqs[-t:, :].astype(jnp.float32)
    cos = jnp.concatenate([jnp.cos(f), jnp.ones((t, head_dim - rot), jnp.float32)], axis=-1)
    sin = jnp.concatenate([jnp.sin(f), jnp.zeros((t, head_dim - rot), jnp.float32)], axis=-1)
    p = np.zeros((head_dim, head_dim), np.float32)
    half = rot // 2
    for j in range(half):
        p[j + half, j] = -1.0  # out[:half] = -x[half:rot]
        p[j, j + half] = 1.0   # out[half:rot] = x[:half]
    return cos, sin, jnp.asarray(p)


def _rope_outside(x, freqs):
    """Plain-JAX rope identical to the kernel's (and the reference's) math;
    used by the training backward."""
    from ..embeddings import apply_rotary_pos_emb

    return apply_rotary_pos_emb(x, freqs)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _flash_rope(q, k, v, freqs, causal, block_q, block_k):
    return _flash_forward(q, k, v, causal, block_q, block_k, freqs=freqs)


def _flash_rope_fwd(q, k, v, freqs, causal, block_q, block_k):
    # training path: materialize roped q/k so the FA2 backward kernels (which
    # recompute scores from their inputs) see the post-rope tensors
    qr = _rope_outside(q, freqs)
    kr = _rope_outside(k, freqs)
    out, lse = _flash_forward(qr, kr, v, causal, block_q, block_k, save_stats=True)
    return out, (qr, kr, v, out, lse, freqs)


def _flash_rope_bwd(causal, block_q, block_k, res, g):
    qr, kr, v, out, lse, freqs = res
    dqr, dkr, dv = _flash_backward(qr, kr, v, out, lse, g, causal, block_q, block_k)
    # rope is linear: y = x*C + (x@P)*S  =>  dx = dy*C + (dy*S) @ P^T
    d = qr.shape[-1]
    t = qr.shape[-2]
    cos, sin, p = _rope_tables(freqs, d, t)
    pt = p.T

    def unrope(dy):
        dy32 = dy.astype(jnp.float32)
        dx = dy32 * cos + (dy32 * sin) @ pt
        return dx.astype(dy.dtype)

    # freqs cotangent is DEFINED as zero: rotary tables here are always
    # non-trainable position tables (rotary_freqs); if rotary angles ever
    # become learned parameters, this custom_vjp must compute the true
    # d(out)/d(freqs) through cos/sin instead.
    return unrope(dqr), unrope(dkr), dv, jnp.zeros_like(freqs)


_flash_rope.defvjp(_flash_rope_fwd, _flash_rope_bwd)


def _use_xla_fallback() -> bool:
    return jax.default_backend() == "cpu" and not _interpret()


def _rope_arr(x, c, s, p):
    """Array form of _apply_rope_tile (same math/rounding): rope(x) =
    x*C + (x@P)*S in fp32, returned bf16 for the MXU."""
    rot = jax.lax.dot(x.astype(jnp.bfloat16), p.astype(jnp.bfloat16),
                      preferred_element_type=jnp.float32)
    return (x.astype(jnp.float32) * c + rot * s).astype(jnp.bfloat16)


def _fused_pair_kernel(q2_ref, k2_ref, v2_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                       p2_ref, o_ref, *, kv_len: int, block_q: int, d: int):
    """Two heads per program (their 2*d = 128 columns form one lane-aligned
    block of the qkv tensor). Rope runs on the full 128-lane pair in ONE MXU
    dot (block-diagonal rotate-half matrix); the per-head score/PV dots then
    slice 64-lane halves in VMEM — far cheaper than the HBM head-split
    transposes this kernel replaces. q tables arrive pre-multiplied by
    scale*LOG2E (free prescale, see _single_dot_rope_kernel)."""
    t_p = k2_ref.shape[0]
    q2 = _rope_arr(q2_ref[:], cq_ref[:], sq_ref[:], p2_ref[:])
    k2 = _rope_arr(k2_ref[:], ck_ref[:], sk_ref[:], p2_ref[:])
    v2 = v2_ref[:]
    n_q = q2.shape[0] // block_q
    for j in range(2):
        k = k2[:, j * d:(j + 1) * d]
        v = v2[:, j * d:(j + 1) * d]
        for qi in range(n_q):
            q = q2[qi * block_q:(qi + 1) * block_q, j * d:(j + 1) * d]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if kv_len < t_p:
                kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(kpos < kv_len, s, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            o_ref[qi * block_q:(qi + 1) * block_q, j * d:(j + 1) * d] = (
                acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _fused_pair_forward(qkv, freqs, num_heads: int, kv_len=None):
    """Inference fast path: per-head-PAIR BlockSpec fetches straight from the
    [B, T, 3HD] qkv tensor and direct [B, T, HD] output writes — the only
    HBM layout op left is one pad of qkv to a 128-aligned length (padded K
    columns are masked via kv_len; padded V rows multiply exactly-zero
    probabilities, and the pad keeps them finite).

    kv_len: true token count when the caller pre-padded qkv to an aligned
    length (16-aligned padded-sequence transformer path). With T already a
    16-multiple the pad/slice pair below are no-ops — at CFG batch 16 the
    per-layer qkv pad alone is ~0.45 ms of HBM copy (scripts/
    pair_batch_exp.py), which is why the transformer pre-pads instead."""
    b, t, three_hd = qkv.shape
    valid = t if kv_len is None else kv_len
    d = three_hd // (3 * num_heads)
    g = num_heads // 2          # head pairs = 128-lane column blocks
    scale = 1.0 / math.sqrt(d)
    prescale = scale * LOG2E

    # the kernel is bf16 throughout (rope rounds q/k to bf16 for the MXU in
    # every variant; V follows the module's bf16 design) — fp32 callers
    # (param-init traces) would double every VMEM fetch and blow the 16 MB
    # scoped budget at [1152, 4608]-scale operands
    in_dtype = qkv.dtype
    if in_dtype != jnp.bfloat16:
        qkv = qkv.astype(jnp.bfloat16)

    # Whole-tile 16-aligned padding when the fp32 score tile plus its bf16
    # copy fit VMEM comfortably: Mosaic masks the non-128-multiple score
    # LANES (verified bit-identical and ~10% faster than 128-alignment at
    # the SAO shape: 1026 pads to 1040, not 1152). Longer sequences fall
    # back to 128-aligned q-blocking.
    t16 = (t + 15) // 16 * 16
    if t16 * t16 * 6 <= 8 * 2**20:
        t_p = t16
        # small grids (CFG batch 2 = the batch-1 headline path) run ~7%
        # faster with TWO q blocks — the halved fp32 score tile pipelines
        # better against the rope+fetch phases; at batch >= 8 the extra
        # per-block overhead wins instead (scripts/pair_batch_exp.py
        # grid_nq2 vs prepad: 0.100 vs 0.108 ms/sample at b2, 0.108 vs
        # 0.107 at b8). Sublane alignment: t_p is a 16-multiple, so
        # t_p // 2 is a multiple of 8.
        n_q = 2 if b <= 2 else 1
    else:
        t_p = (t + 127) // 128 * 128
        # q-block: bound the fp32 score tile (block_q x t_p) to ~2.7 MB
        n_q = max(1, -(-(t_p * t_p * 4) // (3 * 2**20)))
        while t_p % n_q or (t_p // n_q) % 16:
            n_q += 1
    if t_p != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, t_p - t), (0, 0)))
    block_q = t_p // n_q

    cos, sin, p_mat = _rope_tables(freqs, d, t)
    pad = ((0, t_p - t), (0, 0))
    cq = jnp.concatenate([jnp.pad(cos * prescale, pad, constant_values=prescale)] * 2, axis=1)
    sq = jnp.concatenate([jnp.pad(sin * prescale, pad)] * 2, axis=1)
    ck = jnp.concatenate([jnp.pad(cos, pad, constant_values=1.0)] * 2, axis=1)
    sk = jnp.concatenate([jnp.pad(sin, pad)] * 2, axis=1)
    p2 = jax.scipy.linalg.block_diag(p_mat, p_mat)

    kernel = functools.partial(_fused_pair_kernel, kv_len=valid, block_q=block_q, d=d)
    out = pl.pallas_call(
        kernel,
        grid=(b, g),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_: (b_, 0, g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, _g=g: (b_, 0, _g + g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, _g=g: (b_, 0, 2 * _g + g_)),
            pl.BlockSpec((t_p, 2 * d), lambda b_, g_: (0, 0)),
            pl.BlockSpec((t_p, 2 * d), lambda b_, g_: (0, 0)),
            pl.BlockSpec((t_p, 2 * d), lambda b_, g_: (0, 0)),
            pl.BlockSpec((t_p, 2 * d), lambda b_, g_: (0, 0)),
            pl.BlockSpec((2 * d, 2 * d), lambda b_, g_: (0, 0)),
        ],
        out_specs=pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_: (b_, 0, g_)),
        out_shape=jax.ShapeDtypeStruct((b, t_p, num_heads * d), qkv.dtype),
    )(qkv, qkv, qkv, cq, sq, ck, sk, p2)
    return out[:, :t].astype(in_dtype)


# ---------------------------------------------------------------------------
# pair-layout TRAINING path: stats-saving pair forward + pair-layout fused
# backward (rope/unrope in-kernel, dk/dv accumulated across q blocks)
# ---------------------------------------------------------------------------
#
# The original training path unpacked qkv (head split/merge transposes +
# separate rope HBM passes) so the generic FA2 kernels could recompute
# post-rope scores. That layout overhead measured 0.38 ms/layer at batch 4
# and 0.97 ms/layer at batch 8 (scripts/bwd_probe.py: pair fwd+bwd minus the
# bare kernels) — ~9/23 ms per train step. These kernels keep the native
# [B, T, 3HD] layout end to end, like the inference pair kernel:
#   forward: _fused_pair_kernel + per-head base-2 LSE written to a
#            [B, G, T, STAT_LANES] stats tensor (lanes 0/1 = head 0/1);
#   backward: gridded over (batch, pair, q-block); q roped in-kernel from
#            blocked tables, K pre-roped once by _rope_pair_k_kernel
#            (recomputed, not saved — one cheap pass beats holding another
#            [B, T, HD] residual in training HBM), 5 dots per head, dq
#            un-roped per block and dk un-roped once on the last q block
#            (rope is linear: vjp(y) = y*C + (y*S) @ P^T).


def _fused_pair_stats_kernel(q2_ref, k2_ref, v2_ref, cq_ref, sq_ref, ck_ref,
                             sk_ref, p2_ref, o_ref, stats_ref, *, kv_len: int,
                             block_q: int, d: int):
    t_p = k2_ref.shape[0]
    q2 = _rope_arr(q2_ref[:], cq_ref[:], sq_ref[:], p2_ref[:])
    k2 = _rope_arr(k2_ref[:], ck_ref[:], sk_ref[:], p2_ref[:])
    v2 = v2_ref[:]
    n_q = q2.shape[0] // block_q
    for j in range(2):
        k = k2[:, j * d:(j + 1) * d]
        v = v2[:, j * d:(j + 1) * d]
        for qi in range(n_q):
            rows = slice(qi * block_q, (qi + 1) * block_q)
            q = q2[rows, j * d:(j + 1) * d]
            s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            if kv_len < t_p:
                kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                s = jnp.where(kpos < kv_len, s, NEG_INF)
            m = jnp.max(s, axis=1, keepdims=True)
            p = jnp.exp2(s - m)
            l = jnp.sum(p, axis=1, keepdims=True)
            acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
            o_ref[rows, j * d:(j + 1) * d] = (
                acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)
            stats_ref[rows, j:j + 1] = m + jnp.log2(jnp.maximum(l, 1e-30))


def _pair_tables(freqs, d: int, t: int, t_p: int, prescale: float):
    cos, sin, p_mat = _rope_tables(freqs, d, t)
    pad = ((0, t_p - t), (0, 0))
    cq = jnp.concatenate([jnp.pad(cos * prescale, pad, constant_values=prescale)] * 2, axis=1)
    sq = jnp.concatenate([jnp.pad(sin * prescale, pad)] * 2, axis=1)
    ck = jnp.concatenate([jnp.pad(cos, pad, constant_values=1.0)] * 2, axis=1)
    sk = jnp.concatenate([jnp.pad(sin, pad)] * 2, axis=1)
    p2 = jax.scipy.linalg.block_diag(p_mat, p_mat)
    return cq, sq, ck, sk, p2


def _pair_whole_tile(t: int):
    """The whole-tile pair padding rule (16-aligned when the score tile
    fits); returns None when the whole-tile kernel is ineligible."""
    t16 = (t + 15) // 16 * 16
    if t16 * t16 * 6 <= 8 * 2**20:
        return t16
    return None


def _fused_pair_forward_stats(qkv, freqs, num_heads: int, kv_len=None):
    """Whole-tile pair forward that also emits per-head base-2 LSE stats
    ([B, G, t_p, STAT_LANES], lanes 0/1). Only valid when _pair_whole_tile
    accepts the length (the training path's eligibility gate)."""
    b, t, three_hd = qkv.shape
    valid = t if kv_len is None else kv_len
    d = three_hd // (3 * num_heads)
    g = num_heads // 2
    prescale = (1.0 / math.sqrt(d)) * LOG2E

    in_dtype = qkv.dtype
    if in_dtype != jnp.bfloat16:
        qkv = qkv.astype(jnp.bfloat16)
    t_p = _pair_whole_tile(t)
    n_q = 2 if b <= 2 else 1
    if t_p != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, t_p - t), (0, 0)))
    block_q = t_p // n_q

    cq, sq, ck, sk, p2 = _pair_tables(freqs, d, t, t_p, prescale)

    kernel = functools.partial(_fused_pair_stats_kernel, kv_len=valid,
                               block_q=block_q, d=d)
    out, stats = pl.pallas_call(
        kernel,
        grid=(b, g),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_: (b_, 0, g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, _g=g: (b_, 0, _g + g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, _g=g: (b_, 0, 2 * _g + g_)),
            pl.BlockSpec((t_p, 2 * d), lambda b_, g_: (0, 0)),
            pl.BlockSpec((t_p, 2 * d), lambda b_, g_: (0, 0)),
            pl.BlockSpec((t_p, 2 * d), lambda b_, g_: (0, 0)),
            pl.BlockSpec((t_p, 2 * d), lambda b_, g_: (0, 0)),
            pl.BlockSpec((2 * d, 2 * d), lambda b_, g_: (0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_: (b_, 0, g_)),
            pl.BlockSpec((None, None, t_p, STAT_LANES), lambda b_, g_: (b_, g_, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_p, num_heads * d), qkv.dtype),
            jax.ShapeDtypeStruct((b, g, t_p, STAT_LANES), jnp.float32),
        ],
    )(qkv, qkv, qkv, cq, sq, ck, sk, p2)
    return out[:, :t].astype(in_dtype), stats


def _pair_bwd_kernel(q2_ref, khat2_ref, v2_ref, do2_ref, stats_ref,
                     cq_ref, sq_ref, ck_ref, sk_ref, p2_ref, p2t_ref,
                     dq_ref, dk_ref, dv_ref, *, kv_len: int, d: int,
                     n_q: int, inv_prescale: float):
    """One (batch, head-pair, q-block) program of the pair-layout backward.

    q tables (cq/sq) arrive PRESCALED by scale*LOG2E like the forward; the
    same tables scaled by 1/prescale un-rope dq (rope vjp), so only one set
    of blocked q tables rides in VMEM. dk accumulates in POST-rope space
    across the sequential q-block grid and is un-roped once on the last
    block (ck/sk are the unscaled whole tables)."""
    i = pl.program_id(2)

    @pl.when(i == 0)
    def _init():
        dk_ref[:] = jnp.zeros_like(dk_ref)
        dv_ref[:] = jnp.zeros_like(dv_ref)

    t_p = khat2_ref.shape[0]
    # qr2 in prescaled-rope space (matches the forward's score dot exactly)
    qr2 = _rope_arr(q2_ref[:], cq_ref[:], sq_ref[:], p2_ref[:])
    khat2 = khat2_ref[:]
    v2 = v2_ref[:]
    do2 = do2_ref[:]
    dq_parts = []
    for j in range(2):
        qs = qr2[:, j * d:(j + 1) * d]
        kh = khat2[:, j * d:(j + 1) * d]
        v = v2[:, j * d:(j + 1) * d]
        do = do2[:, j * d:(j + 1) * d]
        lse = stats_ref[:, j:j + 1]
        dcap = stats_ref[:, 2 + j:3 + j]
        # s in prescaled base-2 space: qs already carries scale*LOG2E
        s = jax.lax.dot_general(qs, kh, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if kv_len < t_p:
            kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kpos < kv_len, s, NEG_INF)
        p = jnp.exp2(s - lse)
        dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.float32)
        ds = (p * (dp - dcap)).astype(jnp.bfloat16)
        pb = p.astype(do.dtype)
        # d(roped q) before scale: ds @ khat (scale folds into the un-rope
        # tables below); dk accumulates dkr = scale * ds^T qr, with qr
        # recovered from the PRESCALED qs via 1/LOG2E (scale*qs/prescale)
        dq_parts.append(jax.lax.dot_general(
            ds, kh, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))
        dv_ref[:, j * d:(j + 1) * d] += jax.lax.dot_general(
            pb, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
        dk_ref[:, j * d:(j + 1) * d] += jax.lax.dot_general(
            ds, qs, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) * (1.0 / LOG2E)

    # un-rope dq (rope is linear: vjp(y) = y*C + (y*S) @ P^T). The q tables
    # are prescaled by scale*LOG2E; multiplying them by inv_prescale=1/LOG2E
    # leaves exactly scale*C / scale*S — the true-scale un-rope in one pass.
    dq2 = jnp.concatenate(dq_parts, axis=1)
    cqu = cq_ref[:] * inv_prescale
    squ = sq_ref[:] * inv_prescale
    p2t = p2t_ref[:].astype(jnp.float32)
    rot = jax.lax.dot(dq2 * squ, p2t, preferred_element_type=jnp.float32)
    dq_ref[:] = (dq2 * cqu + rot).astype(dq_ref.dtype)

    @pl.when(i == n_q - 1)
    def _finish():
        dk2 = dk_ref[:]
        rotk = jax.lax.dot(dk2 * sk_ref[:], p2t_ref[:].astype(jnp.float32),
                           preferred_element_type=jnp.float32)
        dk_ref[:] = dk2 * ck_ref[:] + rotk


def _pair_bwd_plan(t_p: int, d: int):
    """q-block count for the pair backward: per-head-sequential score tiles
    (~12 B/elem) + fp32 dk/dv pair accumulators + whole K/V/tables."""
    n_q = 1
    while n_q <= 64:
        blk, rem = divmod(t_p, n_q)
        if rem == 0 and blk % 8 == 0:
            tiles = blk * t_p * 12
            resid = (3 * t_p * 2 * d * 2      # khat2/v2 + k tables
                     + 2 * t_p * 2 * d * 4    # dk/dv fp32 accumulators
                     + 4 * blk * 2 * d * 4)   # q/do/dq tiles + q tables
            if tiles + resid <= 12 * 2**20:
                return blk
        n_q += 1
    return None


def _pair_backward(qkv, out, stats, g_out, freqs, num_heads: int, kv_len=None):
    b, t, three_hd = qkv.shape
    valid = t if kv_len is None else kv_len
    d = three_hd // (3 * num_heads)
    g = num_heads // 2
    scale = 1.0 / math.sqrt(d)
    prescale = scale * LOG2E

    in_dtype = qkv.dtype
    qkv16 = qkv.astype(jnp.bfloat16)
    t_p = _pair_whole_tile(t)
    block_q = _pair_bwd_plan(t_p, d)
    if t_p != t:
        qkv16 = jnp.pad(qkv16, ((0, 0), (0, t_p - t), (0, 0)))
    n_q = t_p // block_q

    cq, sq, ck, sk, p2 = _pair_tables(freqs, d, t, t_p, prescale)

    # K roped once in pair layout (recompute; see section comment)
    tab = lambda b_, g_: (0, 0)
    khat = pl.pallas_call(
        _rope_pair_k_kernel,
        grid=(b, g),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, _g=g: (b_, 0, _g + g_)),
            pl.BlockSpec((t_p, 2 * d), tab),
            pl.BlockSpec((t_p, 2 * d), tab),
            pl.BlockSpec((2 * d, 2 * d), tab),
        ],
        out_specs=pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_: (b_, 0, g_)),
        out_shape=jax.ShapeDtypeStruct((b, t_p, num_heads * d), jnp.bfloat16),
    )(qkv16, ck, sk, p2)

    # FA2 D = rowsum(dO * O) per head, packed into stats lanes 2/3
    pad_t = ((0, 0), (0, t_p - t), (0, 0))
    do_p = jnp.pad(g_out.astype(jnp.bfloat16), pad_t)
    o_p = jnp.pad(out.astype(jnp.bfloat16), pad_t)
    delta = (do_p.astype(jnp.float32) * o_p.astype(jnp.float32)).reshape(
        b, t_p, num_heads, d).sum(axis=3)                      # [B, t_p, H]
    delta = delta.reshape(b, t_p, g, 2).transpose(0, 2, 1, 3)  # [B, G, t_p, 2]
    bstats = jnp.concatenate(
        [stats[:, :, :, :2], delta,
         jnp.zeros((b, g, t_p, STAT_LANES - 4), jnp.float32)], axis=3)

    kernel = functools.partial(_pair_bwd_kernel, kv_len=valid, d=d, n_q=n_q,
                               inv_prescale=1.0 / LOG2E)
    tab3 = lambda b_, g_, i: (0, 0)
    dq, dk, dv = pl.pallas_call(
        kernel,
        # i innermost: khat/v blocks and the dk/dv accumulators stay
        # resident across the q blocks of one (batch, pair)
        grid=(b, g, n_q),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, block_q, 2 * d), lambda b_, g_, i: (b_, i, g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, i: (b_, 0, g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, i, _g=g: (b_, 0, 2 * _g + g_)),
            pl.BlockSpec((None, block_q, 2 * d), lambda b_, g_, i: (b_, i, g_)),
            pl.BlockSpec((None, None, block_q, STAT_LANES), lambda b_, g_, i: (b_, g_, i, 0)),
            pl.BlockSpec((block_q, 2 * d), lambda b_, g_, i: (i, 0)),
            pl.BlockSpec((block_q, 2 * d), lambda b_, g_, i: (i, 0)),
            pl.BlockSpec((t_p, 2 * d), tab3),
            pl.BlockSpec((t_p, 2 * d), tab3),
            pl.BlockSpec((2 * d, 2 * d), tab3),
            pl.BlockSpec((2 * d, 2 * d), tab3),
        ],
        out_specs=[
            pl.BlockSpec((None, block_q, 2 * d), lambda b_, g_, i: (b_, i, g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, i: (b_, 0, g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, i: (b_, 0, g_)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, t_p, num_heads * d), jnp.float32),
            jax.ShapeDtypeStruct((b, t_p, num_heads * d), jnp.float32),
            jax.ShapeDtypeStruct((b, t_p, num_heads * d), jnp.float32),
        ],
    )(qkv16, khat, qkv16, do_p, bstats, cq, sq, ck, sk, p2, p2.T)

    # dq/dk leave the kernel fully scaled and un-roped (see _pair_bwd_kernel)
    dqkv = jnp.concatenate([dq[:, :t], dk[:, :t], dv[:, :t]],
                           axis=-1).astype(in_dtype)
    return dqkv


def _pair_bwd_eligible(t: int, d: int, num_heads: int) -> bool:
    if os.environ.get("FSAT_PAIR_BWD") == "0":
        return False
    if d != 64 or num_heads % 2:
        return False
    t_p = _pair_whole_tile(t)
    return t_p is not None and _pair_bwd_plan(t_p, d) is not None


# ---------------------------------------------------------------------------
# long-sequence pair path (2048 < T <= SINGLE_DOT_MAX_TK): SA-2.0 long-form
# ---------------------------------------------------------------------------
#
# The whole-tile pair kernel caps at 2048 tokens (fp32 score tile + four
# fp32 rope tables in VMEM). Beyond that the old fallback paid ~14 ms/step
# at 6144 frames in head split/merge transposes + separate rope HBM passes.
# This path keeps the native [B, T, 3HD] layout end to end:
#   kernel R — rope all K head-pairs in pair layout (one HBM pass, ~0.1 ms
#              per layer vs ~0.6 for the transpose+rope chain);
#   kernel A — gridded over 128-row q blocks, q roped in-kernel from BLOCKED
#              tables (the full-table VMEM blowup only applied to K), one
#              whole-K score dot per head (same single-dot design as
#              _single_dot_rope_kernel, which already runs t_k <= 8192).


def _rope_pair_k_kernel(k2_ref, ck_ref, sk_ref, p2_ref, o_ref):
    o_ref[:] = _rope_arr(k2_ref[:], ck_ref[:], sk_ref[:], p2_ref[:])


def _pair_long_kernel(q2_ref, kh2_ref, v2_ref, cq_ref, sq_ref, p2_ref, o_ref,
                      *, kv_len: int, d: int):
    t_pk = kh2_ref.shape[0]
    q2 = _rope_arr(q2_ref[:], cq_ref[:], sq_ref[:], p2_ref[:])
    for j in range(2):
        q = q2[:, j * d:(j + 1) * d]
        k = kh2_ref[:, j * d:(j + 1) * d]
        v = v2_ref[:, j * d:(j + 1) * d]
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if kv_len < t_pk:
            kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
            s = jnp.where(kpos < kv_len, s, NEG_INF)
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
        l = jnp.sum(p, axis=1, keepdims=True)
        acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        o_ref[:, j * d:(j + 1) * d] = (
            acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def _pair_long_forward(qkv, freqs, num_heads: int, kv_len=None):
    b, t, three_hd = qkv.shape
    valid = t if kv_len is None else kv_len
    d = three_hd // (3 * num_heads)
    g = num_heads // 2
    prescale = (1.0 / math.sqrt(d)) * LOG2E

    in_dtype = qkv.dtype
    if in_dtype != jnp.bfloat16:
        qkv = qkv.astype(jnp.bfloat16)

    block_q = 128
    t_p = (t + block_q - 1) // block_q * block_q
    if t_p != t:
        qkv = jnp.pad(qkv, ((0, 0), (0, t_p - t), (0, 0)))
    n_q = t_p // block_q

    cos, sin, p_mat = _rope_tables(freqs, d, t)
    pad = ((0, t_p - t), (0, 0))
    cq = jnp.concatenate([jnp.pad(cos * prescale, pad, constant_values=prescale)] * 2, axis=1)
    sq = jnp.concatenate([jnp.pad(sin * prescale, pad)] * 2, axis=1)
    ck = jnp.concatenate([jnp.pad(cos, pad, constant_values=1.0)] * 2, axis=1)
    sk = jnp.concatenate([jnp.pad(sin, pad)] * 2, axis=1)
    p2 = jax.scipy.linalg.block_diag(p_mat, p_mat)

    tab = lambda b_, g_: (0, 0)
    khat = pl.pallas_call(
        _rope_pair_k_kernel,
        grid=(b, g),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, _g=g: (b_, 0, _g + g_)),
            pl.BlockSpec((t_p, 2 * d), tab),
            pl.BlockSpec((t_p, 2 * d), tab),
            pl.BlockSpec((2 * d, 2 * d), tab),
        ],
        out_specs=pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_: (b_, 0, g_)),
        out_shape=jax.ShapeDtypeStruct((b, t_p, num_heads * d), jnp.bfloat16),
    )(qkv, ck, sk, p2)

    kernel = functools.partial(_pair_long_kernel, kv_len=valid, d=d)
    tab3 = lambda b_, g_, i: (0, 0)
    out = pl.pallas_call(
        kernel,
        # i fastest (row-major grid): k-hat/v blocks stay resident across
        # the q blocks of one (batch, pair)
        grid=(b, g, n_q),
        interpret=_interpret(),
        in_specs=[
            pl.BlockSpec((None, block_q, 2 * d), lambda b_, g_, i: (b_, i, g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, i: (b_, 0, g_)),
            pl.BlockSpec((None, t_p, 2 * d), lambda b_, g_, i, _g=g: (b_, 0, 2 * _g + g_)),
            pl.BlockSpec((block_q, 2 * d), lambda b_, g_, i: (i, 0)),
            pl.BlockSpec((block_q, 2 * d), lambda b_, g_, i: (i, 0)),
            pl.BlockSpec((2 * d, 2 * d), tab3),
        ],
        out_specs=pl.BlockSpec((None, block_q, 2 * d), lambda b_, g_, i: (b_, i, g_)),
        out_shape=jax.ShapeDtypeStruct((b, t_p, num_heads * d), jnp.bfloat16),
    )(qkv, khat, qkv, cq, sq, p2)
    return out[:, :t].astype(in_dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _pair_long(qkv, freqs, num_heads, kv_len=None):
    return _pair_long_forward(qkv, freqs, num_heads, kv_len)


def _fused_unpack(qkv, freqs, num_heads: int):
    """Training-path layout: split + head transpose + rope outside (the FA2
    backward kernels recompute scores from post-rope tensors)."""
    b, t, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(x):
        return x.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    return _rope_outside(q, freqs), _rope_outside(k, freqs), v


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _fused_pair(qkv, freqs, num_heads, kv_len=None):
    return _fused_pair_forward(qkv, freqs, num_heads, kv_len)


def _fused_pair_fwd(qkv, freqs, num_heads, kv_len=None):
    b, t, _ = qkv.shape
    d = qkv.shape[-1] // (3 * num_heads)
    if _pair_bwd_eligible(t, d, num_heads) and not _use_xla_fallback():
        # pair-layout training path: stats-saving pair forward, pair-layout
        # fused backward — no head split/merge transposes or separate rope
        # HBM passes on either side (measured 0.38/0.97 ms-per-layer layout
        # overhead at train batch 4/8 on the unpack path, scripts/bwd_probe)
        out, stats = _fused_pair_forward_stats(qkv, freqs, num_heads, kv_len)
        return out, (qkv, out, stats, freqs)
    qr, kr, v = _fused_unpack(qkv, freqs, num_heads)
    flat = lambda x: x.reshape(b * num_heads, t, d)
    out, lse = _flash_forward(flat(qr), flat(kr), flat(v), False,
                              DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K, save_stats=True,
                              kv_len=kv_len)
    merged = (out[:, :t].reshape(b, num_heads, t, d)
              .transpose(0, 2, 1, 3).reshape(b, t, num_heads * d))
    return merged, (qr, kr, v, out[:, :t], lse, freqs)


def _fused_pair_bwd(num_heads, kv_len, res, g):
    if len(res) == 4:  # pair-layout training path residuals
        qkv, out, stats, freqs = res
        dqkv = _pair_backward(qkv, out, stats, g, freqs, num_heads,
                              kv_len=kv_len)
        return dqkv, jnp.zeros_like(freqs)
    qr, kr, v, out, lse, freqs = res
    b, _, t, d = qr.shape
    flat = lambda x: x.reshape(b * num_heads, t, d)
    go = g.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)
    dqr, dkr, dv = _flash_backward(flat(qr), flat(kr), flat(v), flat(out), lse,
                                   flat(go), False, DEFAULT_BLOCK_Q, DEFAULT_BLOCK_K,
                                   kv_len=kv_len)
    cos, sin, p = _rope_tables(freqs, d, t)
    pt = p.T

    def unrope(dy):
        dy32 = dy.astype(jnp.float32)
        return (dy32 * cos + (dy32 * sin) @ pt).astype(dy.dtype)

    def merge(x):
        return (x.reshape(b, num_heads, t, d).transpose(0, 2, 1, 3)
                .reshape(b, t, num_heads * d))

    dqkv = jnp.concatenate([merge(unrope(dqr)), merge(unrope(dkr)),
                            merge(dv)], axis=-1)
    # non-trainable rotary tables: zero cotangent by definition (see
    # _flash_rope_bwd)
    return dqkv, jnp.zeros_like(freqs)


_fused_pair.defvjp(_fused_pair_fwd, _fused_pair_bwd)
# long-pair training path is identical: unpack + rope outside + FA2 kernels
_pair_long.defvjp(_fused_pair_fwd, _fused_pair_bwd)


def fused_qkv_rope_attention(qkv, freqs, num_heads: int,
                             block_q: int = DEFAULT_BLOCK_Q, kv_len=None):
    """qkv: [B, T, 3*H*D] (fused Dense output, q|k|v concatenated),
    freqs: [T', rot_dim] rotary angles (last T rows used) -> [B, T, H*D].

    Non-causal full self-attention with the reference's fp32 partial rotary
    (transformer.py:164-183) fused into the attention kernel. At head_dim 64
    with an even head count and a moderate sequence, the head-pair kernel
    (_fused_pair_forward) reads qkv and writes the output in their NATIVE
    [B, T, C] layouts — no head split/merge transposes touch HBM at all.

    kv_len: true token count when qkv is pre-padded (16-aligned
    padded-sequence path, models/transformer.py); K/V masked in-kernel."""
    b, t, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)

    if (not _use_xla_fallback()) and d == 64 and num_heads % 2 == 0 \
            and t <= 2048:
        return _fused_pair(qkv, freqs, num_heads, kv_len)

    if (not _use_xla_fallback()) and d == 64 and num_heads % 2 == 0 \
            and t <= SINGLE_DOT_MAX_TK:
        # SA-2.0 long-form: gridded pair kernel + pair-layout K rope — no
        # head split/merge transposes, no separate rope HBM passes
        return _pair_long(qkv, freqs, num_heads, kv_len)

    if kv_len is not None and kv_len < t:
        # non-pair fallback: run at the true length, re-pad the output
        # (correct everywhere; only exercised on forced-CPU parity runs)
        out = fused_qkv_rope_attention(qkv[:, :kv_len], freqs[:kv_len],
                                       num_heads, block_q)
        return jnp.pad(out, ((0, 0), (0, t - kv_len), (0, 0)))

    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(x):
        return x.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    if _use_xla_fallback():
        q = _rope_outside(q, freqs)
        k = _rope_outside(k, freqs)
        out = _xla_reference(
            q.reshape(b * num_heads, t, d), k.reshape(b * num_heads, t, d),
            v.reshape(b * num_heads, t, d), False).reshape(b, num_heads, t, d)
    else:
        # flash_attention handles long sequences itself (t > 2048: rope
        # outside + the online-softmax kernel) — no separate branch needed
        out = flash_attention(q, k, v, freqs=freqs, block_q=block_q)
    return out.transpose(0, 2, 1, 3).reshape(b, t, num_heads * d)


def _fused_reference(qkv, freqs, num_heads: int):
    """Unfused reference (rope outside the kernel) for parity tests."""
    b, t, three_hd = qkv.shape
    d = three_hd // (3 * num_heads)
    q, k, v = jnp.split(qkv, 3, axis=-1)

    def heads(x):
        return x.reshape(b, t, num_heads, d).transpose(0, 2, 1, 3)

    q, k, v = heads(q), heads(k), heads(v)
    q = _rope_outside(q, freqs)
    k = _rope_outside(k, freqs)
    if _use_xla_fallback():
        out = _xla_reference(
            q.reshape(b * num_heads, t, d), k.reshape(b * num_heads, t, d),
            v.reshape(b * num_heads, t, d), False).reshape(b, num_heads, t, d)
    else:
        out = flash_attention(q, k, v)
    return out.transpose(0, 2, 1, 3).reshape(b, t, num_heads * d)
