"""Backward (FA2) attention probe — the training-MFU suspect.

Round-4 left the training step at 49%/43% MFU (batch 4/8) and named the FA2
backward as the gap with no number attached (docs/performance.md). This
probe measures the attention fwd and bwd kernels AT THE TRAINING SHAPES
(batch x 24 heads, 1040-token padded sequence, head_dim 64) so the gap has
a decomposition:

    python scripts/bwd_probe.py            # real chip

Reported per config:
  fwd_ms        forward flash kernel (single-dot, save_stats=True — the
                training forward saves LSE)
  bwd_ms        _flash_backward alone (dq + dkv kernels, prebuilt residuals)
  pair_fb_ms    full training-path op: _fused_pair fwd+bwd from [B,T,3HD]
                qkv (includes head split/merge transposes + rope passes)
  xla_fb_ms     XLA einsum-softmax-einsum fwd+bwd reference
  *_tflops      TFLOP/s-equivalent at TRUE (unpadded) FLOPs: fwd = 2 dots,
                bwd = 7 dots (dq: s/dp/dq, dkv: s/dv/dp/dk) of 2*bh*t^2*d.

Implied per-train-step cost = 24 layers x (fwd_ms + bwd_ms).
"""

from __future__ import annotations

import functools
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_probe import emit, timeit_loop  # noqa: E402  (same dir)

from friendly_stable_audio_tools_tpu.ops.pallas import flash_attention as fa  # noqa: E402


def true_flops(bh, t, d, dots):
    return dots * 2.0 * bh * t * t * d


def main():
    emit(probe="env", device=str(jax.devices()[0]))
    rng = np.random.default_rng(0)
    d = 64
    heads = 24
    for batch, t_pad, t_true in ((4, 1040, 1026), (8, 1040, 1026)):
        bh = batch * heads
        q = jnp.asarray(rng.standard_normal((bh, t_pad, d)), jnp.bfloat16)
        k = jnp.asarray(rng.standard_normal((bh, t_pad, d)), jnp.bfloat16)
        v = jnp.asarray(rng.standard_normal((bh, t_pad, d)), jnp.bfloat16)
        g = jnp.asarray(rng.standard_normal((bh, t_pad, d)), jnp.bfloat16)
        tag = f"b{batch}_t{t_pad}"

        # ---- forward (training mode: save_stats) --------------------------
        def fwd(q, k, v):
            out, lse = fa._flash_forward(q, k, v, False, fa.DEFAULT_BLOCK_Q,
                                         fa.DEFAULT_BLOCK_K, save_stats=True,
                                         kv_len=t_true)
            return out

        tf = timeit_loop(lambda x, kk, vv: fwd(x, kk, vv), q, k, v)
        f_fwd = true_flops(bh, t_true, d, 2)
        emit(probe="attn_fwd", cfg=tag, ms=round(tf * 1e3, 4),
             tflops=round(f_fwd / tf / 1e12, 1))

        # ---- backward kernels alone --------------------------------------
        out, lse = fa._flash_forward(q, k, v, False, fa.DEFAULT_BLOCK_Q,
                                     fa.DEFAULT_BLOCK_K, save_stats=True,
                                     kv_len=t_true)

        def bwd(g, q, k, v, out, lse):
            dq, dk, dv = fa._flash_backward(q, k, v, out, lse, g, False,
                                            fa.DEFAULT_BLOCK_Q, fa.DEFAULT_BLOCK_K,
                                            kv_len=t_true)
            return dq + dk + dv

        tb = timeit_loop(bwd, g, q, k, v, out, lse)
        f_bwd = true_flops(bh, t_true, d, 7)
        emit(probe="attn_bwd", cfg=tag, ms=round(tb * 1e3, 4),
             tflops=round(f_bwd / tb / 1e12, 1),
             per_step_24l_ms=round(24 * tb * 1e3, 1))

        # ---- full training-path op (qkv in, includes layout/rope) --------
        qkv = jnp.asarray(rng.standard_normal((batch, t_pad, 3 * heads * d)),
                          jnp.bfloat16)
        freqs = jnp.asarray(rng.standard_normal((t_pad, d // 2)), jnp.float32) * 0.01

        def pair_fb(qkv):
            f = lambda z: fa._fused_pair(z, freqs, heads, t_true).astype(jnp.float32).sum()
            return jax.grad(f)(qkv)

        tp = timeit_loop(pair_fb, qkv)
        f_tot = true_flops(bh, t_true, d, 9)
        emit(probe="attn_pair_fwd_bwd", cfg=tag, ms=round(tp * 1e3, 4),
             tflops=round(f_tot / tp / 1e12, 1),
             per_step_24l_ms=round(24 * tp * 1e3, 1))

        # ---- XLA reference fwd+bwd ---------------------------------------
        def xla_fb(q, k, v):
            def f(q):
                s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                               k.astype(jnp.float32)) / np.sqrt(d)
                p = jax.nn.softmax(s, axis=-1)
                return jnp.einsum("bqk,bkd->bqd", p.astype(v.dtype), v).astype(jnp.float32).sum()

            return jax.grad(f)(q)

        tx = timeit_loop(xla_fb, q, k, v)
        emit(probe="attn_xla_fwd_bwd", cfg=tag, ms=round(tx * 1e3, 4),
             tflops=round(f_tot / tx / 1e12, 1))


if __name__ == "__main__":
    main()
