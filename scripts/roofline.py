"""Checkable roofline for the SAO-1.0 bf16 generation recipe on one v5e.

Computes per-CFG-step FLOPs for the SAO DiT (embed 1536, depth 24, heads 24,
head_dim 64, GLU mult 4, 1025 tokens incl. the prepended global token, 130
cross-attn cond tokens) from the GEMM shapes alone — every term printed so a
reader can re-derive it — then combines with measured device ceilings to give
the implied maximum s-audio/s/chip for the reference recipe (100-step
dpmpp-3m-sde, CFG batch-doubling, 47.55 s stereo -> bench.py).

The floor model matches docs/performance.md "Roofline" (round-4 measured
decomposition, scripts/attn_probe.py):

  step_floor = linear_GEMM_FLOPs / gemm_ceiling        (~170-178 TFLOP/s chain)
             + measured attention-dots time             (4.5 ms: head_dim-64
               contractions cap at ~89 TFLOP/s, kernel sustains ~68)
             + attention softmax/VPU residue            (0.7 ms: kernel wall
               minus its dots-only variant)

Attention-dot FLOPs are EXCLUDED from the linear term (the round-3 version of
this script divided ALL FLOPs by the chain ceiling and then added a stale
6.0 ms overhead, printing a "floor" above the measured step — a
contradiction; this version exits nonzero if that ever happens again).

Measured inputs (override via CLI; defaults are the round-4 measurements):
  --gemm-ceiling   TFLOP/s sustained by large bf16 GEMM chains on this chip
                   (8192^3 chain, scripts/tpu_probe.py --section gemm: ~178;
                   nominal 197 is not reachable)
  --attn-dots-ms   measured per-step wall of the self-attention kernels with
                   softmax stripped (scripts/attn_probe.py: 0.189 ms/layer
                   x 24 = 4.5 ms)
  --attn-residue-ms softmax/VPU residue: full kernel wall minus dots-only
                   (0.2168 - 0.189 ms/layer x 24 = 0.7 ms)
  --decode-ms      measured VAE decode wall (scripts/tpu_probe.py --section
                   decode: 61.6 ms)
  --step-ms        measured CFG denoise step wall (28.6 ms), for comparison

No TPU required: pure arithmetic. Exits 1 if the measured step is below the
computed floor (i.e. the embedded constants have gone stale in the
optimistic direction).
"""

import argparse
import sys

GIGA = 1e9
TERA = 1e12

ATTN_KEYS = ("self_scores+values", "cross_scores+values")


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
    attn = depth * sum(per_layer[k] for k in ATTN_KEYS)
    return total, attn, per_layer


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gemm-ceiling", type=float, default=178.0, help="TFLOP/s")
    ap.add_argument("--attn-dots-ms", type=float, default=4.5,
                    help="measured attention-dots wall per step (softmax-stripped kernel)")
    ap.add_argument("--attn-residue-ms", type=float, default=0.7,
                    help="measured softmax/VPU residue per step (full kernel - dots-only)")
    ap.add_argument("--decode-ms", type=float, default=61.6)
    ap.add_argument("--decode-floor-ms", type=float, default=55.0,
                    help="VAE decode composite component roofline (docs/performance.md)")
    ap.add_argument("--step-ms", type=float, default=28.6,
                    help="measured CFG step wall for comparison")
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--audio-seconds", type=float, default=47.554)
    args = ap.parse_args()

    total, attn, per_layer = sao_step_flops()
    linear = total - attn
    print("Per-layer FLOPs at CFG batch 2 (x24 layers):")
    for k, v in per_layer.items():
        tag = "  [attention dots]" if k in ATTN_KEYS else ""
        print(f"  {k:24s} {v / GIGA:8.2f} GFLOP{tag}")
    print(f"TOTAL per CFG step: {total / TERA:.3f} TFLOP "
          f"({linear / TERA:.3f} linear + {attn / TERA:.3f} attention dots)")

    gemm_min_ms = linear / (args.gemm_ceiling * TERA) * 1e3
    floor_ms = gemm_min_ms + args.attn_dots_ms + args.attn_residue_ms
    print(f"\nlinear-GEMM floor @ {args.gemm_ceiling:.0f} TFLOP/s: {gemm_min_ms:.2f} ms/step")
    print(f"+ measured attention dots {args.attn_dots_ms:.1f} ms "
          f"(head_dim-64 MXU ceiling ~89 TFLOP/s, kernel ~68)")
    print(f"+ softmax/VPU residue {args.attn_residue_ms:.1f} ms")
    print(f"-> step floor {floor_ms:.2f} ms")
    print(f"measured step: {args.step_ms:.2f} ms "
          f"(= {total / (args.step_ms * 1e-3) / TERA:.0f} TFLOP/s effective, "
          f"{floor_ms / args.step_ms * 100:.0f}% of floor-implied wall)")

    if args.step_ms < floor_ms:
        print("ERROR: measured step is BELOW the computed floor — the embedded "
              "constants are stale (re-measure attn/gemm ceilings with "
              "scripts/attn_probe.py / tpu_probe.py).", file=sys.stderr)
        sys.exit(1)

    for label, step, dec in (("floor (measured decode)", floor_ms, args.decode_ms),
                             ("floor (decode roofline)", floor_ms, args.decode_floor_ms),
                             ("measured", args.step_ms, args.decode_ms)):
        gen_s = args.steps * step / 1e3 + dec / 1e3
        print(f"{label}: {args.steps} steps + decode {dec:.0f} ms = "
              f"{gen_s:.3f} s/gen -> {args.audio_seconds / gen_s:.2f} s-audio/s/chip")


if __name__ == "__main__":
    main()
