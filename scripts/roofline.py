"""Checkable roofline for the SAO-1.0 bf16 generation recipe on one v5e.

Computes per-CFG-step FLOPs for the SAO DiT (embed 1536, depth 24, heads 24,
head_dim 64, GLU mult 4, 1025 tokens incl. the prepended global token, 130
cross-attn cond tokens) from the GEMM shapes alone — every term printed so a
reader can re-derive it — then combines with measured device ceilings to give
the implied maximum s-audio/s/chip for the reference recipe (100-step
dpmpp-3m-sde, CFG batch-doubling, 47.55 s stereo → bench.py).

Measured inputs (override via CLI):
  --gemm-ceiling   TFLOP/s sustained by large bf16 GEMM chains on this chip
                   (8192^3 chain measurement, scripts/tpu_probe.py: ~178;
                   nominal 197 is not reachable)
  --attn-overhead  measured ms/step the attention kernels spend beyond their
                   GEMM FLOPs (VPU softmax + memory orchestration)
  --decode-ms      measured VAE decode wall (ms)
  --step-ms        measured CFG denoise step wall (ms), for comparison

No TPU required: pure arithmetic.
"""

import argparse

GIGA = 1e9
TERA = 1e12


def gemm_flops(m, k, n, count=1):
    return 2.0 * m * k * n * count


def sao_step_flops(tokens=1025, cond_tokens=130, depth=24, dim=1536,
                   ff_inner=6144, cond_dim=768, io_channels=64,
                   cfg_batch=2, cross_skip=True, attn_tokens=1040):
    """FLOPs for ONE sampler step (model forward at CFG batch 2).

    cross_skip: the uncond half skips cross-attention q/attn (exact skip —
    models/dit.py); the kv projection runs once per generation (hoisted out
    of the scan by XLA LICM) and is excluded here like the T5 forward.
    attn_tokens: the pair kernel pads 1025 -> 1040 (16-aligned whole tiles).
    """
    t, c, d = tokens, cond_tokens, dim
    per_layer = {}
    # self-attention (both CFG halves)
    per_layer["self_qkv"] = gemm_flops(cfg_batch * t, d, 3 * d)
    per_layer["self_scores+values"] = 2 * gemm_flops(cfg_batch * attn_tokens, attn_tokens, d)
    per_layer["self_out"] = gemm_flops(cfg_batch * t, d, d)
    # cross-attention (cond half only when cross_skip)
    xb = 1 if cross_skip else cfg_batch
    per_layer["cross_q"] = gemm_flops(xb * t, d, d)
    per_layer["cross_scores+values"] = 2 * gemm_flops(xb * t, c, d)
    per_layer["cross_out"] = gemm_flops(xb * t, d, d)
    # GLU MLP
    per_layer["mlp_in(glu)"] = gemm_flops(cfg_batch * t, d, 2 * ff_inner)
    per_layer["mlp_out"] = gemm_flops(cfg_batch * t, ff_inner, d)

    total = depth * sum(per_layer.values())
    # io projections + final residual-conv head (once per forward, both halves)
    io = (gemm_flops(cfg_batch * t, io_channels + 1, d)      # preprocess conv (w/ prepend concat)
          + gemm_flops(cfg_batch * t, d, io_channels))        # postprocess
    total += io
    return total, per_layer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gemm-ceiling", type=float, default=178.0, help="TFLOP/s")
    ap.add_argument("--attn-overhead", type=float, default=6.0,
                    help="measured non-GEMM attention ms/step (VPU softmax etc.)")
    ap.add_argument("--decode-ms", type=float, default=72.0)
    ap.add_argument("--step-ms", type=float, default=28.6,
                    help="measured CFG step wall for comparison")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--audio-seconds", type=float, default=47.554)
    args = ap.parse_args()

    total, per_layer = sao_step_flops()
    print("Per-layer FLOPs at CFG batch 2 (x24 layers):")
    for k, v in per_layer.items():
        print(f"  {k:24s} {v / GIGA:8.2f} GFLOP")
    print(f"TOTAL per CFG step: {total / TERA:.3f} TFLOP")

    gemm_min_ms = total / (args.gemm_ceiling * TERA) * 1e3
    floor_ms = gemm_min_ms + args.attn_overhead
    print(f"\nGEMM-only floor @ {args.gemm_ceiling:.0f} TFLOP/s: {gemm_min_ms:.2f} ms/step")
    print(f"+ measured attention non-GEMM overhead {args.attn_overhead:.1f} ms "
          f"-> step floor {floor_ms:.2f} ms")
    print(f"measured step: {args.step_ms:.2f} ms "
          f"(= {total / (args.step_ms * 1e-3) / TERA:.0f} TFLOP/s effective)")

    for label, step in (("floor", floor_ms), ("measured", args.step_ms)):
        gen_s = args.steps * step / 1e3 + args.decode_ms / 1e3
        print(f"{label}: {args.steps} steps + decode {args.decode_ms:.0f} ms = "
              f"{gen_s:.3f} s/gen -> {args.audio_seconds / gen_s:.2f} s-audio/s/chip")


if __name__ == "__main__":
    main()
