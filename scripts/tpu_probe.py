"""Single-chip perf probe: the measurements behind docs/performance.md.

Run on a real TPU chip. Prints one JSON object per probe line so runs can be
diffed across kernel changes:

    python scripts/tpu_probe.py [--section gemm|attn|step|layout|all]

Sections
  gemm   : hot SAO DiT GEMM shapes, bf16 vs int8 (raw pre-quantized operand
           dots, and dynamic quantization inside the timed fn) vs fp32
           square references. Answers "what does int8 actually buy at our
           shapes, including quant overhead?"
  attn   : Pallas flash kernel vs XLA attention at SAO self-attention shapes,
           CFG batch 2 and 16 (the batch-scaling suspect).
  step   : full CFG denoise step, bf16 vs FSAT_INT8_MATMUL=1, batch 1 and 8.
  layout : qkv split/transpose layout ops in isolation vs batch.
  train  : SAO-scale DiT training step (fwd+bwd) on pre-encoded latents.

Timing notes: `block_until_ready` does not synchronize on the tunneled
backend — every timed call forces a scalar host transfer instead.
"""

from __future__ import annotations

import argparse
import functools
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    return float(jnp.asarray(x).ravel()[0].astype(jnp.float32))


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(n):
        t0 = time.time()
        sync(fn(*args))
        times.append(time.time() - t0)
    return min(times)


def timeit_loop(op, x, *rest, n=5):
    """Per-op time free of the tunnel's ~30-40 ms host-sync latency: run the
    op in a jitted fori_loop at two iteration counts and take the slope.
    `op(x, *rest)` must return something x-shaped-compatible via the scalar
    dependence trick (we add a tiny scalar of the output back into x so XLA
    cannot hoist the op out of the loop)."""
    @jax.jit
    def run(iters, x, *rest):
        def body(_, x):
            y = op(x, *rest)
            # depend on EVERY output element: a single-element dependence
            # lets XLA dead-code-slice a GEMM down to one row (observed:
            # "65,000 TFLOP/s"). The full-tensor reduce adds one read pass
            # over the output — small vs the ops being timed.
            return x + (y.astype(jnp.float32).sum() * 1e-30).astype(x.dtype)
        # dynamic trip count: ONE compile serves every iteration count
        return jax.lax.fori_loop(0, iters, body, x)

    # adaptive iteration counts: the tunnel's sync latency jitters by
    # several ms, so the i2-i1 delta must represent seconds of device work
    est = timeit(lambda *a: run(4, *a), x, *rest, n=2) / 4  # latency-polluted
    i2 = int(min(max(2.0 / max(est, 1e-6), 10), 2000))
    i1 = max(2, i2 // 5)
    t1 = timeit(lambda *a: run(i1, *a), x, *rest, n=n)
    t2 = timeit(lambda *a: run(i2, *a), x, *rest, n=n)
    return max((t2 - t1) / (i2 - i1), 1e-9)


def emit(**kw):
    print(json.dumps(kw), flush=True)


# ---------------------------------------------------------------- gemm --

# (M, K, N, tag) — SAO-1.0 DiT hot projections at CFG batch 2 (M = 2*1024
# tokens) and CFG batch 16, plus square references.
GEMM_SHAPES = [
    (2048, 1536, 4608, "qkv@b1"),
    (2048, 1536, 1536, "attn_out@b1"),
    (2048, 1536, 12288, "mlp_in_glu@b1"),
    (2048, 6144, 1536, "mlp_out@b1"),
    (16384, 1536, 4608, "qkv@b8"),
    (16384, 1536, 12288, "mlp_in_glu@b8"),
    (16384, 6144, 1536, "mlp_out@b8"),
    (4096, 4096, 4096, "square4k"),
    (8192, 8192, 8192, "square8k"),
]


def probe_gemm(n=10):
    from friendly_stable_audio_tools_tpu.ops.quant import (
        dynamic_int8_matmul, quantize_weight_int8,
    )

    rng = jax.random.PRNGKey(0)
    for (m, k, nn_, tag) in GEMM_SHAPES:
        x = jax.random.normal(rng, (m, k), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(rng, 1), (k, nn_), jnp.bfloat16) * 0.02
        flops = 2.0 * m * k * nn_

        t = timeit_loop(lambda a, b: a @ b, x, w, n=n)
        emit(probe="gemm", tag=tag, dtype="bf16", m=m, k=k, n=nn_,
             ms=round(t * 1e3, 3), tflops=round(flops / t / 1e12, 1))

        # dynamic int8: per-token act quant + per-channel weight quant inside
        # the timed fn, weight quant marked loop-invariant-like by jitting w
        # quantization separately (as the sampler scan would hoist it)
        wq2, ws = jax.jit(quantize_weight_int8)(w)

        def dyn(a, bq, bs):
            from friendly_stable_audio_tools_tpu.ops.quant import quantize_activation_int8
            aq, as_ = quantize_activation_int8(a)
            acc = jax.lax.dot_general(aq, bq, (((1,), (0,)), ((), ())),
                                      preferred_element_type=jnp.int32)
            return (acc.astype(jnp.float32) * as_ * bs).astype(a.dtype)

        t = timeit_loop(dyn, x, wq2, ws, n=n)
        emit(probe="gemm", tag=tag, dtype="int8_dynamic", m=m, k=k, n=nn_,
             ms=round(t * 1e3, 3), tflops_equiv=round(flops / t / 1e12, 1))


# ---------------------------------------------------------------- attn --

def probe_attn(n=10):
    from friendly_stable_audio_tools_tpu.ops.attention import scaled_dot_product_attention

    rng = jax.random.PRNGKey(0)
    for b in (2, 16):
        q = jax.random.normal(rng, (b, 24, 1024, 64), jnp.bfloat16)
        k = jax.random.normal(jax.random.fold_in(rng, 1), (b, 24, 1024, 64), jnp.bfloat16)
        v = jax.random.normal(jax.random.fold_in(rng, 2), (b, 24, 1024, 64), jnp.bfloat16)
        for impl in ("pallas", "xla"):
            try:
                t = timeit_loop(
                    lambda q, k, v: scaled_dot_product_attention(q, k, v, implementation=impl),
                    q, k, v, n=n)
                emit(probe="attn", impl=impl, batch=b, ms=round(t * 1e3, 3))
            except Exception as e:  # pallas unavailable off-TPU
                emit(probe="attn", impl=impl, batch=b, error=str(e)[:120])


# ---------------------------------------------------------------- step --

def probe_step(n=5):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_models

    _, dit = build_models()
    rng = jax.random.PRNGKey(0)
    batches = tuple(int(b) for b in
                    os.environ.get("PROBE_BATCHES", "1,8").split(","))
    # PROBE_FRAMES=6144 probes the SA-2.0 long-form step (285 s latents)
    frames = int(os.environ.get("PROBE_FRAMES", 1024))
    audio_s = frames * 2048 / 44100.0
    for batch in batches:
        x0 = jnp.zeros((batch, frames, 64), jnp.bfloat16)
        t0 = jnp.zeros((batch,), jnp.float32)
        cond = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 130, 768), jnp.bfloat16) * 0.02
        g = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 1536), jnp.bfloat16) * 0.02
        params = dit.init(jax.random.PRNGKey(0), x0, t0, cross_attn_cond=cond, global_embed=g)["params"]
        # de-zero the zero-init residual out-projections, or the transformer
        # body contributes nothing and the int8 fidelity number is vacuous
        from friendly_stable_audio_tools_tpu.utils.common import dezero_params

        params = dezero_params(params, dtype=jnp.bfloat16)
        x = jax.random.normal(jax.random.fold_in(rng, 3), (batch, frames, 64), jnp.bfloat16)
        t_sig = jnp.full((batch,), 0.5, jnp.float32)

        outs = {}
        for int8 in ("0", "1"):
            os.environ["FSAT_INT8_MATMUL"] = int8

            @jax.jit
            def step(p, x, t_sig, cond, g):
                return dit.apply({"params": p}, x, t_sig, cross_attn_cond=cond,
                                 global_embed=g, cfg_scale=7.0)

            t = timeit(step, params, x, t_sig, cond, g, n=n)
            outs[int8] = np.asarray(step(params, x, t_sig, cond, g), np.float32)
            emit(probe="cfg_step", batch=batch, frames=frames, int8=int8 == "1",
                 ms=round(t * 1e3, 2),
                 s_audio_per_s_per_chip_100steps=round(audio_s * batch / (t * 100), 2))
        rel = float(np.linalg.norm(outs["1"] - outs["0"]) /
                    (np.linalg.norm(outs["0"]) + 1e-12))
        emit(probe="cfg_step_int8_fidelity", batch=batch,
             rel_l2_vs_bf16=round(rel, 5))
        os.environ.pop("FSAT_INT8_MATMUL", None)


# -------------------------------------------------------------- layout --

def probe_layout(n=20):
    rng = jax.random.PRNGKey(0)
    for b in (2, 16):
        qkv = jax.random.normal(rng, (b, 1024, 4608), jnp.bfloat16)

        def split_heads(qkv):
            q, k, v = jnp.split(qkv, 3, axis=-1)
            def sh(t):
                return t.reshape(b, 1024, 24, 64).transpose(0, 2, 1, 3)
            # sum so the whole layout chain materializes
            return sh(q).sum() + sh(k).sum() + sh(v).sum()

        f = jax.jit(split_heads)
        t = timeit(f, qkv, n=n)
        emit(probe="layout_split_heads", batch=b, ms=round(t * 1e3, 3),
             gb_per_s=round(2 * qkv.nbytes / t / 1e9, 1))


# --------------------------------------------------------------- block --

def probe_block(n=5):
    """One SAO TransformerBlock (batch 2 = CFG-doubled, T=1026) loop-timed,
    plus its isolated GEMM chain and attention group, so the non-GEMM
    overhead (layout/pad/LN traffic) is measurable without a profiler
    (trace capture is unsupported on the tunnel)."""
    from friendly_stable_audio_tools_tpu.models.transformer import TransformerBlock
    from friendly_stable_audio_tools_tpu.ops.embeddings import rotary_freqs
    from friendly_stable_audio_tools_tpu.ops.attention import scaled_dot_product_attention

    rng = jax.random.PRNGKey(0)
    b = int(os.environ.get("PROBE_BLOCK_BATCH", "2"))  # CFG-doubled batch
    t, dim, heads, dh = 1026, 1536, 24, 64
    block = TransformerBlock(dim=dim, dim_heads=dh, cross_attend=True, dim_context=768)
    x = jax.random.normal(rng, (b, t, dim), jnp.bfloat16) * 0.1
    ctx = jax.random.normal(jax.random.fold_in(rng, 1), (b, 130, 768), jnp.bfloat16) * 0.1
    rot = rotary_freqs(t, 32)
    params = block.init(jax.random.PRNGKey(0), x, context=ctx, rotary_pos_emb=rot)["params"]
    from friendly_stable_audio_tools_tpu.utils.common import dezero_params

    params = dezero_params(params, dtype=jnp.bfloat16)

    tb = timeit_loop(
        lambda x, p: block.apply({"params": p}, x, context=ctx, rotary_pos_emb=rot,
                                 cross_half_batch=True),
        x, params, n=n)
    emit(probe="block_full", ms=round(tb * 1e3, 3), step24_ms=round(tb * 24e3, 2))

    # pure GEMM chain at the block's true shapes (no LN/rope/attention/layout)
    w_qkv = jax.random.normal(rng, (dim, 3 * dim), jnp.bfloat16) * 0.02
    w_out = jax.random.normal(rng, (dim, dim), jnp.bfloat16) * 0.02
    w_cq = jax.random.normal(rng, (dim, dim), jnp.bfloat16) * 0.02
    w_co = jax.random.normal(rng, (dim, dim), jnp.bfloat16) * 0.02
    w_in = jax.random.normal(rng, (dim, 2 * 4 * dim), jnp.bfloat16) * 0.02
    w_o2 = jax.random.normal(rng, (4 * dim, dim), jnp.bfloat16) * 0.02

    def gemms(x, w_qkv, w_out, w_cq, w_co, w_in, w_o2):
        qkv = x @ w_qkv
        a = qkv[..., :dim] @ w_out
        cq = (a[: b // 2] @ w_cq) @ w_co  # cross q/out on the cond half only
        h = a + jnp.concatenate([cq, jnp.zeros_like(cq)], 0)
        g = h @ w_in
        y = (g[..., : 4 * dim] * jax.nn.silu(g[..., 4 * dim:])) @ w_o2
        return h + y

    flops = (2 * b * t * dim * (3 * dim + dim + 8 * dim)
             + 2 * b * t * 4 * dim * dim + (b // 2) * 2 * t * dim * 2 * dim)
    tg = timeit_loop(gemms, x, w_qkv, w_out, w_cq, w_co, w_in, w_o2, n=n)
    emit(probe="block_gemms", ms=round(tg * 1e3, 3), step24_ms=round(tg * 24e3, 2),
         tflops=round(flops / tg / 1e12, 1))

    # attention group alone: split heads + rope + flash + merge, from a
    # precomputed qkv (isolates layout+kernel cost)
    from friendly_stable_audio_tools_tpu.ops.embeddings import apply_rotary_pos_emb

    qkv0 = jax.random.normal(rng, (b, t, 3 * dim), jnp.bfloat16) * 0.1

    def attn_group(qkv):
        q, k, v = jnp.split(qkv, 3, axis=-1)
        def sh(z):
            return z.reshape(b, t, heads, dh).transpose(0, 2, 1, 3)
        q, k, v = sh(q), sh(k), sh(v)
        q = apply_rotary_pos_emb(q, rot)
        k = apply_rotary_pos_emb(k, rot)
        o = scaled_dot_product_attention(q, k, v)
        return o.transpose(0, 2, 1, 3).reshape(b, t, dim)

    ta = timeit_loop(attn_group, qkv0, n=n)
    emit(probe="block_attn_group", ms=round(ta * 1e3, 3), step24_ms=round(ta * 24e3, 2))


# -------------------------------------------------------------- mlpvar --

def probe_mlpvar(n=5):
    """GEMM-rate variants at the DiT hot shapes. Answers, with measurements:
    (1) is the GLU silu-mul a separate (unfused) HBM pass or folded into the
    GEMMs; (2) how much of the 139-vs-178 TFLOP/s gap is the M=2052
    misalignment vs the shape itself; (3) does splitting/merging the N dim
    change the rate. All variants are output-exact candidates."""
    rng = jax.random.PRNGKey(0)
    k, ninner = 1536, 6144

    def mk(mm, kk, nn_):
        x = jax.random.normal(rng, (mm, kk), jnp.bfloat16)
        w = jax.random.normal(jax.random.fold_in(rng, 1), (kk, nn_), jnp.bfloat16) * 0.02
        return x, w

    # -- M alignment sweep on the in-GEMM shape
    for m in (1026, 2048, 2052, 2176, 4096):
        x, w = mk(m, k, 2 * ninner)
        t = timeit_loop(lambda a, b: a @ b, x, w, n=n)
        emit(probe="mlpvar_in_gemm", m=m, ms=round(t * 1e3, 3),
             tflops=round(2.0 * m * k * 2 * ninner / t / 1e12, 1))

    m = 2052
    x, w_in = mk(m, k, 2 * ninner)
    w_out = jax.random.normal(jax.random.fold_in(rng, 2), (ninner, k), jnp.bfloat16) * 0.02
    g0 = jax.random.normal(jax.random.fold_in(rng, 3), (m, 2 * ninner), jnp.bfloat16)
    h0 = jax.random.normal(jax.random.fold_in(rng, 4), (m, ninner), jnp.bfloat16)

    # -- pieces vs chain: if chain ~= in+out the silu-mul pass is free (fused)
    t_in = timeit_loop(lambda a, b: a @ b, x, w_in, n=n)
    t_act = timeit_loop(lambda g: g[:, :ninner] * jax.nn.silu(g[:, ninner:]), g0, n=n)
    t_out = timeit_loop(lambda h, b: h @ b, h0, w_out, n=n)

    def glu_chain(a, wi, wo):
        g = a @ wi
        return (g[:, :ninner] * jax.nn.silu(g[:, ninner:])) @ wo

    t_chain = timeit_loop(glu_chain, x, w_in, w_out, n=n)
    flops_chain = 2.0 * m * k * 2 * ninner + 2.0 * m * ninner * k
    emit(probe="mlpvar_pieces", in_ms=round(t_in * 1e3, 3), act_ms=round(t_act * 1e3, 3),
         out_ms=round(t_out * 1e3, 3), chain_ms=round(t_chain * 1e3, 3),
         sum_pieces_ms=round((t_in + t_act + t_out) * 1e3, 3),
         chain_tflops=round(flops_chain / t_chain / 1e12, 1))

    # -- value/gate as two N=6144 GEMMs (avoids the strided split of the
    #    [m, 12288] intermediate)
    wv, wg = w_in[:, :ninner], w_in[:, ninner:]

    def glu_split(a, wv, wg, wo):
        return ((a @ wv) * jax.nn.silu(a @ wg)) @ wo

    t_split = timeit_loop(glu_split, x, wv, wg, w_out, n=n)
    emit(probe="mlpvar_split_vg", chain_ms=round(t_split * 1e3, 3),
         chain_tflops=round(flops_chain / t_split / 1e12, 1))

    # -- fp32 accumulate-output GEMM (does the bf16 output convert cost?)
    t_f32 = timeit_loop(
        lambda a, b: jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                                         preferred_element_type=jnp.float32), x, w_in, n=n)
    emit(probe="mlpvar_in_gemm_f32out", ms=round(t_f32 * 1e3, 3),
         tflops=round(2.0 * m * k * 2 * ninner / t_f32 / 1e12, 1))

    # -- batched [2, 1026, k] vs flattened [2052, k] (does XLA collapse it?)
    xb = x.reshape(2, 1026, k)
    t_b = timeit_loop(lambda a, b: a @ b, xb, w_in, n=n)
    emit(probe="mlpvar_in_gemm_batched", ms=round(t_b * 1e3, 3),
         tflops=round(2.0 * m * k * 2 * ninner / t_b / 1e12, 1))

    # -- the full per-layer GEMM chain with LN/residual/adds interleaved the
    #    way the block actually runs them (how much do the elementwise
    #    passes between GEMMs cost once XLA fuses what it can?)
    gamma1 = jnp.ones((k,), jnp.float32)

    def ln(z, gamma):
        z32 = z.astype(jnp.float32)
        mu = z32.mean(-1, keepdims=True)
        var = z32.var(-1, keepdims=True)
        return ((z32 - mu) * jax.lax.rsqrt(var + 1e-5) * gamma).astype(z.dtype)

    def chain_with_ln(a, wi, wo):
        h = a + glu_chain(ln(a, gamma1), wi, wo)
        return h

    t_cl = timeit_loop(chain_with_ln, x, w_in, w_out, n=n)
    emit(probe="mlpvar_chain_ln_resid", ms=round(t_cl * 1e3, 3),
         extra_vs_chain_ms=round((t_cl - t_chain) * 1e3, 3))

    # -- fused Pallas GLU-MLP (intermediate never leaves VMEM)
    from friendly_stable_audio_tools_tpu.ops.pallas.mlp import glu_mlp

    ref = np.asarray(glu_chain(x, w_in, w_out), np.float32)
    for bm in (256, 512, 768, 1024, 2112):
        for bj in (512, 1024, 2048):
            try:
                fn = lambda a, wv_, wg_, wo_, bm=bm, bj=bj: glu_mlp(
                    a, wv_, wg_, wo_, block_m=bm, block_j=bj)
                got = np.asarray(fn(x, wv, wg, w_out), np.float32)
                rel = float(np.linalg.norm(got - ref) / (np.linalg.norm(ref) + 1e-12))
                t_p = timeit_loop(fn, x, wv, wg, w_out, n=n)
                emit(probe="mlpvar_pallas_fused", block_m=bm, block_j=bj,
                     ms=round(t_p * 1e3, 3),
                     tflops=round(flops_chain / t_p / 1e12, 1),
                     rel_l2_vs_xla=round(rel, 6))
            except Exception as e:
                emit(probe="mlpvar_pallas_fused", block_m=bm, block_j=bj,
                     error=str(e)[:160])


# -------------------------------------------------------------- decode --

def probe_decode(n=5):
    """VAE decode breakdown: full decoder (loop-timed, tunnel-latency-free),
    then each stage's hot ops at its (T, C) shape — residual units (3 per
    stage, dilations 1/3/9) and the polyphase transposed-conv upsample —
    with per-op TFLOP/s so the farthest-from-roofline stage is obvious."""
    from bench import build_models

    vae, _ = build_models()
    rng = jax.random.PRNGKey(0)
    vae_params = vae.init(jax.random.PRNGKey(1), length=2048 * 4)
    vae_params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), vae_params)
    lat = jax.random.normal(rng, (1, 1024, 64), jnp.bfloat16)

    def dec(lat, params):
        return vae._decode_nwc(lat, params=params)

    t = timeit_loop(dec, lat, vae_params, n=n)
    emit(probe="decode_full", ms=round(t * 1e3, 2))

    from friendly_stable_audio_tools_tpu.ops.pallas.conv1d import (
        fused_residual_unit, snake_conv_transpose1d,
    )

    # SAO decoder stages: (T_in, C_in, C_out, stride); RUs run at (T_out, C_out)
    stages = [(1024, 2048, 1024, 8), (8192, 1024, 512, 8), (65536, 512, 256, 4),
              (262144, 256, 128, 4), (1048576, 128, 128, 2)]
    for (t_in, cin, cout, s) in stages:
        t_out = t_in * s
        x = jax.random.normal(rng, (1, t_in, cin), jnp.bfloat16) * 0.1
        wt = jax.random.normal(rng, (2 * s, cin, cout), jnp.bfloat16) * 0.02
        alpha = jnp.ones((cin,), jnp.float32)
        up_flops = 2.0 * t_out * cin * cout * 2  # 2 taps/output phase
        tu = timeit_loop(
            lambda x, w: snake_conv_transpose1d(x, w, None, alpha, alpha, stride=s),
            x, wt, n=n)
        emit(probe="decode_up", t_in=t_in, cin=cin, cout=cout, stride=s,
             ms=round(tu * 1e3, 3), tflops=round(up_flops / tu / 1e12, 1))

        y = jax.random.normal(rng, (1, t_out, cout), jnp.bfloat16) * 0.1
        w1 = jax.random.normal(rng, (7, cout, cout), jnp.bfloat16) * 0.02
        w2 = jax.random.normal(rng, (cout, cout), jnp.bfloat16) * 0.02
        b = jnp.zeros((cout,), jnp.float32)
        ao = jnp.ones((cout,), jnp.float32)
        ru_flops = 2.0 * t_out * cout * cout * 8  # k7 + k1
        for d in (1, 9):
            tr = timeit_loop(
                lambda y, w1, w2: fused_residual_unit(
                    y, w1, b, ao, ao, w2, b, ao, ao, dilation=d),
                y, w1, w2, n=n)
            emit(probe="decode_ru", t=t_out, c=cout, dilation=d,
                 ms=round(tr * 1e3, 3), tflops=round(ru_flops / tr / 1e12, 1))


# --------------------------------------------------------------- train --

def probe_train(n=5):
    """SAO-scale DiT training step (fwd+bwd+SGD apply) on pre-encoded
    latents. SGD keeps the probe within single-chip HBM (1.14B params:
    bf16 params 2.3 GB + bf16 grads 2.3 GB; Adam's fp32 moments belong on
    an fsdp mesh, not one chip) — the measured cost is the fwd+bwd compute,
    which optimizer choice does not change."""
    import optax

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_models

    _, dit = build_models()
    rng = jax.random.PRNGKey(0)
    for batch in (4, 8):
        x0 = jnp.zeros((batch, 1024, 64), jnp.bfloat16)
        t0 = jnp.zeros((batch,), jnp.float32)
        cond = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 130, 768), jnp.bfloat16) * 0.02
        g = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 1536), jnp.bfloat16) * 0.02
        params = dit.init(jax.random.PRNGKey(0), x0, t0, cross_attn_cond=cond, global_embed=g)["params"]
        params = jax.tree_util.tree_map(lambda p: (p * 0.5).astype(jnp.bfloat16), params)
        opt = optax.sgd(1e-4)
        opt_state = opt.init(params)
        latents = jax.random.normal(jax.random.fold_in(rng, 3), (batch, 1024, 64), jnp.bfloat16)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def train_step(params, opt_state, latents, key):
            k_t, k_n = jax.random.split(key)
            t = jax.random.uniform(k_t, (batch,))
            noise = jax.random.normal(k_n, latents.shape, jnp.float32)
            alphas = jnp.cos(t * jnp.pi / 2)[:, None, None]
            sigmas = jnp.sin(t * jnp.pi / 2)[:, None, None]
            noised = latents * alphas + noise * sigmas
            targets = noise * alphas - latents * sigmas  # v-objective

            def loss_fn(p):
                v = dit.apply({"params": p}, noised.astype(jnp.bfloat16), t,
                              cross_attn_cond=cond, global_embed=g)
                return jnp.mean((v.astype(jnp.float32) - targets) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = opt.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss

        state = {"p": params, "o": opt_state}

        def run(latents, key):
            state["p"], state["o"], loss = train_step(state["p"], state["o"], latents, key)
            return loss

        t = timeit(functools.partial(run, latents), jax.random.PRNGKey(1), n=n)
        emit(probe="train_step", batch=batch, ms=round(t * 1e3, 2),
             samples_per_s=round(batch / t, 2),
             latent_frames_per_s=round(batch * 1024 / t))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["gemm", "attn", "step", "layout", "train", "decode", "block",
                             "mlpvar", "all"])
    ap.add_argument("-n", type=int, default=10)
    args = ap.parse_args()
    emit(probe="env", platform=jax.devices()[0].platform,
         device=str(jax.devices()[0]))
    if args.section in ("gemm", "all"):
        probe_gemm(args.n)
    if args.section in ("attn", "all"):
        probe_attn(args.n)
    if args.section in ("layout", "all"):
        probe_layout(args.n)
    if args.section in ("block", "all"):
        probe_block(max(3, args.n // 2))
    if args.section in ("mlpvar", "all"):
        probe_mlpvar(max(3, args.n // 2))
    if args.section in ("decode", "all"):
        probe_decode(max(3, args.n // 2))
    if args.section in ("step", "all"):
        probe_step(max(3, args.n // 2))
    if args.section in ("train", "all"):
        probe_train(max(3, args.n // 2))


if __name__ == "__main__":
    main()
