"""Focused attention-kernel probes: decompose the per-layer flash-attention
cost at the SAO DiT self-attention shape (CFG batch 2 x 24 heads, 1026
tokens, head_dim 64).

Uses scripts/tpu_probe.py's fori_loop slope timing (full-output sum
dependence so XLA cannot dead-code-slice the kernel; adaptive iteration
counts so device work dominates the tunnel's ~30-40 ms sync jitter).

Sections:
  1. raw exp2 / FMA throughput, fp32 vs bf16, on large tiles
  2. kernel variants at the SAO shape: full softmax, pre-scaled q (no per-
     element score multiply), fixed-max (no max pass), bf16 exp2, polynomial
     exp2 (FMA + exponent bitcast, no EUP transcendental), dots-only floor
  3. q-pad variants: 1026 -> 1152 (current, 128-aligned) vs 1040 (16-aligned)
  4. the production kernel + XLA fused attention for context
"""

import functools
import json
import math
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from tpu_probe import emit, timeit_loop

LOG2E = 1.4426950408889634
NEG_INF = -1e30

BH, TQ_RAW, D = 48, 1026, 64
SCALE = 1.0 / math.sqrt(D)
# true-length FLOPs: what a generation step actually pays for
FLOPS = 4 * TQ_RAW * TQ_RAW * D * BH


# --- 1. transcendental throughput --------------------------------------------

def probe_transcendental():
    for dt, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        x = jnp.full((4096, 2048), 0.1, dt)

        def do_exp2(x):
            return jnp.exp2(x)

        def do_fma(x):
            return x * 1.0001 + 0.0001

        for opname, op in (("exp2", do_exp2), ("fma", do_fma)):
            dt_s = timeit_loop(op, x)
            emit(probe="transcendental", dtype=name, op=opname,
                 ms=round(dt_s * 1e3, 4),
                 gelem_per_s=round(x.size / dt_s / 1e9, 1))


# --- 2/3. kernel variants -----------------------------------------------------

def _poly_exp2(x):
    """exp2 for x <= 0 via degree-3 polynomial on the fractional part plus an
    exponent-bits bitcast — plain FMAs + integer ops, no EUP transcendental.
    |rel err| ~2e-4, below the bf16 rounding of p before the PV dot."""
    x = jnp.maximum(x, -120.0)
    n = jnp.floor(x + 0.5)
    f = x - n
    ni = n.astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type((ni + 127) << 23, jnp.float32)
    p = 1.0 + f * (0.69314718 + f * (0.24022651 + f * 0.05550411))
    return p * scale


def _core(q_ref, k_ref, v_ref, o_ref, *, mode: str):
    q = q_ref[:]
    k = k_ref[:]
    if mode.endswith("_kt"):
        # k arrives [D, T]: canonical [M,K]@[K,N] score dot, no in-kernel
        # transpose of the K tile
        s = jax.lax.dot_general(q, k, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        mode = mode[:-3]
    else:
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
    if mode not in ("prescaled", "prescaled_nomax", "prescaled_poly",
                    "prescaled_bf16exp"):
        s = s * (SCALE * LOG2E)
    if mode == "dots_only":
        p = s
    elif mode in ("nomax", "prescaled_nomax"):
        p = jnp.exp2(s - 16.0)
    elif mode in ("bf16exp", "prescaled_bf16exp"):
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2((s - m).astype(jnp.bfloat16)).astype(jnp.float32)
    elif mode in ("polyexp", "prescaled_poly"):
        m = jnp.max(s, axis=1, keepdims=True)
        p = _poly_exp2(s - m)
    else:  # full / prescaled
        m = jnp.max(s, axis=1, keepdims=True)
        p = jnp.exp2(s - m)
    l = jnp.sum(p, axis=1, keepdims=True)
    acc = jax.lax.dot_general(p.astype(v_ref.dtype), v_ref[:],
                              (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    o_ref[:] = (acc / jnp.maximum(l, 1e-30)).astype(o_ref.dtype)


def kernel_variant(mode, tq, tk):
    kspec = (pl.BlockSpec((None, D, tk), lambda b: (b, 0, 0)) if mode.endswith("_kt")
             else pl.BlockSpec((None, tk, D), lambda b: (b, 0, 0)))

    def f(q, k, v):
        if mode.endswith("_kt"):
            k = k.transpose(0, 2, 1)
        return pl.pallas_call(
            functools.partial(_core, mode=mode),
            grid=(BH,),
            in_specs=[pl.BlockSpec((None, tq, D), lambda b: (b, 0, 0)),
                      kspec,
                      pl.BlockSpec((None, tk, D), lambda b: (b, 0, 0))],
            out_specs=pl.BlockSpec((None, tq, D), lambda b: (b, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((BH, tq, D), q.dtype),
        )(q, k, v)
    return f


def probe_kernel_variants():
    key = jax.random.PRNGKey(0)
    tk = 1152
    q_raw = jax.random.normal(key, (BH, TQ_RAW, D), jnp.bfloat16)
    k = jax.random.normal(jax.random.fold_in(key, 1), (BH, tk, D), jnp.bfloat16)
    v = jax.random.normal(jax.random.fold_in(key, 2), (BH, tk, D), jnp.bfloat16)

    for tq in (1152, 1040):
        q = jnp.pad(q_raw, ((0, 0), (0, tq - TQ_RAW), (0, 0)))
        ref = np.asarray(kernel_variant("full", tq, tk)(q, k, v),
                         np.float32)[:, :TQ_RAW]
        modes = ("full", "prescaled", "full_kt", "prescaled_kt",
                 "dots_only", "dots_only_kt") if tq == 1152 else \
                ("full", "prescaled", "prescaled_kt",
                 "prescaled_poly", "prescaled_bf16exp")
        for mode in modes:
            f = kernel_variant(mode, tq, tk)
            qin = q * (SCALE * LOG2E) if mode.startswith("prescaled") else q
            got = np.asarray(f(qin, k, v), np.float32)[:, :TQ_RAW]
            rel = float(np.linalg.norm(got - ref) /
                        (np.linalg.norm(ref) + 1e-12))
            dt_s = timeit_loop(lambda q: f(q, k, v), qin)
            emit(probe="attn_variant", tq=tq, mode=mode,
                 ms=round(dt_s * 1e3, 4),
                 tflops_eq=round(FLOPS / dt_s / 1e12, 1),
                 rel_l2_vs_full=round(rel, 6))

    # production kernel at the true API shape
    from friendly_stable_audio_tools_tpu.ops.pallas.flash_attention import (
        flash_attention,
    )
    q1 = q_raw.reshape(2, BH // 2, TQ_RAW, D)
    k1 = k[:, :TQ_RAW].reshape(2, BH // 2, TQ_RAW, D)
    v1 = v[:, :TQ_RAW].reshape(2, BH // 2, TQ_RAW, D)
    dt_s = timeit_loop(lambda q: flash_attention(q, k1, v1), q1)
    emit(probe="attn_production", ms=round(dt_s * 1e3, 4),
         tflops_eq=round(FLOPS / dt_s / 1e12, 1))

    # XLA fused attention (fp32 softmax like ours)
    def xla_attn(q):
        s = jnp.einsum("bhid,bhjd->bhij", q, k1,
                       preferred_element_type=jnp.float32) * SCALE
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bhij,bhjd->bhid", p.astype(v1.dtype), v1,
                          preferred_element_type=jnp.float32).astype(q.dtype)
    dt_s = timeit_loop(xla_attn, q1)
    emit(probe="attn_xla", ms=round(dt_s * 1e3, 4),
         tflops_eq=round(FLOPS / dt_s / 1e12, 1))


if __name__ == "__main__":
    emit(probe="env", platform=jax.default_backend(),
         device=str(jax.devices()[0].device_kind))
    if os.environ.get("ATTN_PROBE_SKIP_TRANSCENDENTAL") != "1":
        probe_transcendental()
    probe_kernel_variants()
