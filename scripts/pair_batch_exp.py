"""Pair-kernel batch-16 regression experiments (docs/performance.md "Batch
scaling"): per-sample kernel time is flat at CFG batches 2-8 (~0.11 ms) but
jumps ~37% at batch 16 (`scripts/batch_probe.py`). Variants timed here, all
on the production kernel body (`_fused_pair_kernel`):

  base      production _fused_pair_forward (pad + tables + grid (b, g))
  prepad    input already 16-aligned: isolates the jnp.pad HBM copy
  grid_gb   grid order (g, b): batch iterates fastest
  grid_3d   grid (b, g, n_q=5): 208-row q blocks, smaller score tiles
  bf16exp   exp2 on bf16 scores (half the VPU softmax bytes)

Run on the real chip: python scripts/pair_batch_exp.py
"""

import functools
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpu_probe import emit, timeit_loop

from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
    NEG_INF, _fused_pair_forward, _fused_pair_kernel, _rope_tables, LOG2E,
)
from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs

T, DIM, HEADS, D = 1026, 1536, 24, 64
G = HEADS // 2


def _pair_call(qkv, freqs, *, grid_order="bg", n_q=1, bf16exp=False):
    """Production math, variant grid/blocking. qkv must be pre-padded to a
    16-multiple t_p; kv_len masks the pad like production."""
    b, t_p, _ = qkv.shape
    import math

    scale = 1.0 / math.sqrt(D)
    prescale = scale * LOG2E
    cos, sin, p_mat = _rope_tables(freqs, D, T)
    pad = ((0, t_p - T), (0, 0))
    cq = jnp.concatenate([jnp.pad(cos * prescale, pad, constant_values=prescale)] * 2, axis=1)
    sq = jnp.concatenate([jnp.pad(sin * prescale, pad)] * 2, axis=1)
    ck = jnp.concatenate([jnp.pad(cos, pad, constant_values=1.0)] * 2, axis=1)
    sk = jnp.concatenate([jnp.pad(sin, pad)] * 2, axis=1)
    p2 = jax.scipy.linalg.block_diag(p_mat, p_mat)

    block_q = t_p // n_q
    kernel = _fused_pair_kernel
    if bf16exp:
        def kernel(q2_ref, k2_ref, v2_ref, cq_ref, sq_ref, ck_ref, sk_ref,
                   p2_ref, o_ref, *, kv_len, block_q, d):
            from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import _rope_arr
            t_pk = k2_ref.shape[0]
            q2 = _rope_arr(q2_ref[:], cq_ref[:], sq_ref[:], p2_ref[:])
            k2 = _rope_arr(k2_ref[:], ck_ref[:], sk_ref[:], p2_ref[:])
            v2 = v2_ref[:]
            n_qq = q2.shape[0] // block_q
            for j in range(2):
                k = k2[:, j * d:(j + 1) * d]
                v = v2[:, j * d:(j + 1) * d]
                for qi in range(n_qq):
                    q = q2[qi * block_q:(qi + 1) * block_q, j * d:(j + 1) * d]
                    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                            preferred_element_type=jnp.float32)
                    if kv_len < t_pk:
                        kpos = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                        s = jnp.where(kpos < kv_len, s, NEG_INF)
                    m = jnp.max(s, axis=1, keepdims=True)
                    p = jnp.exp2((s - m).astype(jnp.bfloat16))  # variant
                    l = jnp.sum(p.astype(jnp.float32), axis=1, keepdims=True)
                    acc = jax.lax.dot_general(p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
                                              preferred_element_type=jnp.float32)
                    o_ref[qi * block_q:(qi + 1) * block_q, j * d:(j + 1) * d] = (
                        acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)

    kern = functools.partial(kernel, kv_len=T, block_q=block_q, d=D)
    tab = lambda b_, g_: (0, 0)
    if grid_order == "bg":
        grid = (b, G)
        qs = lambda b_, g_: (b_, 0, g_)
        ks = lambda b_, g_: (b_, 0, G + g_)
        vs = lambda b_, g_: (b_, 0, 2 * G + g_)
        os_ = qs
    elif grid_order == "gb":
        grid = (G, b)
        qs = lambda g_, b_: (b_, 0, g_)
        ks = lambda g_, b_: (b_, 0, G + g_)
        vs = lambda g_, b_: (b_, 0, 2 * G + g_)
        os_ = qs
        tab = lambda g_, b_: (0, 0)
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=[
            pl.BlockSpec((None, t_p, 2 * D), qs),
            pl.BlockSpec((None, t_p, 2 * D), ks),
            pl.BlockSpec((None, t_p, 2 * D), vs),
            pl.BlockSpec((t_p, 2 * D), tab),
            pl.BlockSpec((t_p, 2 * D), tab),
            pl.BlockSpec((t_p, 2 * D), tab),
            pl.BlockSpec((t_p, 2 * D), tab),
            pl.BlockSpec((2 * D, 2 * D), tab),
        ],
        out_specs=pl.BlockSpec((None, t_p, 2 * D), os_),
        out_shape=jax.ShapeDtypeStruct((b, t_p, HEADS * D), qkv.dtype),
    )(qkv, qkv, qkv, cq, sq, ck, sk, p2)
    return out


def main():
    rot = rotary_freqs(T, 32)
    t_p = 1040
    for b in (2, 8, 16):
        qkv_raw = jax.random.normal(jax.random.PRNGKey(b), (b, T, 3 * DIM), jnp.bfloat16) * 0.1
        qkv_pad = jnp.pad(qkv_raw, ((0, 0), (0, t_p - T), (0, 0)))

        dt = timeit_loop(lambda q: _fused_pair_forward(q, rot, HEADS), qkv_raw)
        emit(exp="base", batch=b, ms=round(dt * 1e3, 3), ms_per_sample=round(dt * 1e3 / b, 4))

        variants = [
            ("prepad", dict(grid_order="bg", n_q=1)),
            ("grid_gb", dict(grid_order="gb", n_q=1)),
            ("grid_nq2", dict(grid_order="bg", n_q=2)),
            ("grid_nq5", dict(grid_order="bg", n_q=5)),
            ("bf16exp", dict(grid_order="bg", n_q=1, bf16exp=True)),
        ]
        for name, kw in variants:
            fn = lambda q, _kw=kw: _pair_call(q, rot, **_kw)
            dt = timeit_loop(fn, qkv_pad)
            emit(exp=name, batch=b, ms=round(dt * 1e3, 3), ms_per_sample=round(dt * 1e3 / b, 4))


if __name__ == "__main__":
    main()
