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

        f_bf16 = jax.jit(lambda a, b: a @ b)
        t = timeit(f_bf16, x, w, n=n)
        emit(probe="gemm", tag=tag, dtype="bf16", m=m, k=k, n=nn_,
             ms=round(t * 1e3, 3), tflops=round(flops / t / 1e12, 1))

        # raw int8 dot: both operands pre-quantized outside the timed region
        xq = jnp.clip(jnp.round(x.astype(jnp.float32) * 20), -127, 127).astype(jnp.int8)
        wq, _ = quantize_weight_int8(w)
        f_i8 = jax.jit(lambda a, b: jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32))
        t = timeit(f_i8, xq, wq, n=n)
        emit(probe="gemm", tag=tag, dtype="int8_raw", m=m, k=k, n=nn_,
             ms=round(t * 1e3, 3), tops=round(flops / t / 1e12, 1))

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

        f_dyn = jax.jit(dyn)
        t = timeit(f_dyn, x, wq2, ws, n=n)
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
                f = jax.jit(functools.partial(scaled_dot_product_attention, implementation=impl))
                t = timeit(f, q, k, v, n=n)
                emit(probe="attn", impl=impl, batch=b, ms=round(t * 1e3, 3))
            except Exception as e:  # pallas unavailable off-TPU
                emit(probe="attn", impl=impl, batch=b, error=str(e)[:120])


# ---------------------------------------------------------------- step --

def probe_step(n=5):
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bench import build_models

    _, dit = build_models()
    rng = jax.random.PRNGKey(0)
    for batch in (1, 8):
        x0 = jnp.zeros((batch, 1024, 64), jnp.bfloat16)
        t0 = jnp.zeros((batch,), jnp.float32)
        cond = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 130, 768), jnp.bfloat16) * 0.02
        g = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 1536), jnp.bfloat16) * 0.02
        params = dit.init(jax.random.PRNGKey(0), x0, t0, cross_attn_cond=cond, global_embed=g)["params"]
        # de-zero the zero-init residual out-projections, or the transformer
        # body contributes nothing and the int8 fidelity number is vacuous
        leaves, treedef = jax.tree_util.tree_flatten(params)
        keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        leaves = [((l * 0.5) + 0.02 * jax.random.normal(k, l.shape)).astype(jnp.bfloat16)
                  for l, k in zip(leaves, keys)]
        params = jax.tree_util.tree_unflatten(treedef, leaves)
        x = jax.random.normal(jax.random.fold_in(rng, 3), (batch, 1024, 64), jnp.bfloat16)
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
            emit(probe="cfg_step", batch=batch, int8=int8 == "1",
                 ms=round(t * 1e3, 2),
                 s_audio_per_s_per_chip_100steps=round(47.55 * batch / (t * 100), 2))
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
                    choices=["gemm", "attn", "step", "layout", "train", "all"])
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
    if args.section in ("step", "all"):
        probe_step(max(3, args.n // 2))
    if args.section in ("train", "all"):
        probe_train(max(3, args.n // 2))


if __name__ == "__main__":
    main()
