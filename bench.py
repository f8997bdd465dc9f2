"""Benchmark: Stable Audio Open 1.0 text-to-audio throughput on TPU.

Measures the BASELINE.md headline: secs-of-audio generated per second per
chip for a 47.55 s stereo clip (sample_size 2,097,152 @ 44.1 kHz), 100-step
dpmpp-3m-sde with CFG batch-doubling (the reference's default recipe,
generate.py:28-31,135-137), through the full pipeline: DiT denoise scan
(1024 latent frames, 64 channels) + Oobleck VAE decode.

WHAT IS INSIDE THE TIMED LOOP: the 100-step CFG denoise scan and the VAE
decode. The T5 conditioner forward is NOT timed — the bench feeds pre-made
cond embeddings where the reference recipe runs T5 once per prompt
(reference generation.py:143-146). That forward is once-per-generation and
measured at ~10-20 ms against the ~3 s generation (<1% — see
docs/performance.md); the reported number would round identically.

Weights are random-initialized (no pretrained checkpoints are downloadable
here); throughput is architecture-determined, not weight-determined.

Prints ONE JSON line:
  {"metric": "secs_of_audio_per_sec_per_chip", "value": N,
   "unit": "s_audio/s/chip", "vs_baseline": N,
   "int8_value": N, "int8_bf16_tail_steps": N,
   "int8_rel_l2_vs_bf16": N, "int8_mrstft_vs_bf16": N}
vs_baseline is value / 20 (driver target: >20x real-time per chip) for the
bf16 HEADLINE, which matches the reference recipe's numerics. int8_value is
the same pipeline with FSAT_INT8_MATMUL=1 (dynamic per-token activation +
per-channel weight int8 on the DiT projections) and the last
BENCH_INT8_TAIL sampler steps in bf16 (the measured error/speed operating
point, docs/performance.md) — it changes outputs, so it is reported beside
its measured divergence (same pinned sampler key, so the delta is numerics
only): waveform rel-L2 and MRSTFT distance. Never as the headline.
BENCH_SKIP_INT8=1 skips that second compile (e.g. for quick A/B runs).
"""

import json
import os
import signal
import subprocess
import sys
import threading
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")

import jax
import jax.numpy as jnp
import numpy as np


def _backend_watchdog(timeout_s: int = 180):
    """Device-tunnel backends can hang indefinitely in backend init when the
    remote side is unhealthy; bound that to a clear failure."""
    ok = threading.Event()

    def watch():
        if not ok.wait(timeout_s):
            print(f"FATAL: JAX backend init did not complete within {timeout_s}s "
                  "(device tunnel unhealthy?)", file=sys.stderr, flush=True)
            os._exit(3)

    threading.Thread(target=watch, daemon=True).start()
    n = jax.device_count()  # forces backend init
    ok.set()
    return n


def build_models(dtype=jnp.bfloat16):
    from friendly_stable_audio_tools_tpu.models.autoencoders import (
        AudioAutoencoder, AudioAutoencoderModule, OobleckDecoder, OobleckEncoder,
    )
    from friendly_stable_audio_tools_tpu.models.bottleneck import VAEBottleneck
    from friendly_stable_audio_tools_tpu.models.dit import DiffusionTransformer

    # SAO-1.0 VAE (reference stable_audio_open_1_0.json:7-40)
    enc = OobleckEncoder(in_channels=2, channels=128, latent_dim=128,
                         c_mults=(1, 2, 4, 8, 16), strides=(2, 4, 4, 8, 8), use_snake=True)
    dec = OobleckDecoder(out_channels=2, channels=128, latent_dim=64,
                         c_mults=(1, 2, 4, 8, 16), strides=(2, 4, 4, 8, 8),
                         use_snake=True, final_tanh=False)
    vae_module = AudioAutoencoderModule(encoder=enc, decoder=dec, bottleneck=VAEBottleneck())
    vae = AudioAutoencoder(module=vae_module, latent_dim=64, downsampling_ratio=2048,
                           sample_rate=44100, io_channels=2)

    # SAO-1.0 DiT (reference stable_audio_open_1_0.json:71-86)
    dit = DiffusionTransformer(
        io_channels=64, embed_dim=1536, depth=24, num_heads=24,
        cond_token_dim=768, global_cond_dim=1536,
        transformer_type="continuous_transformer", global_cond_type="prepend",
    )
    return vae, dit


def mrstft_distance(a: np.ndarray, b: np.ndarray) -> float:
    """Multi-resolution STFT distance (the repo's auraloss port, sc + log-mag)
    between two [B, T, C] waveforms. Reported beside waveform rel-L2 because
    over a 100-step SDE trajectory rel-L2 conflates benign decorrelation with
    spectral damage; MRSTFT is the perceptually meaningful axis (it is the
    reference's own reconstruction loss)."""
    from friendly_stable_audio_tools_tpu.training.losses.auraloss import (
        MultiResolutionSTFTLoss,
    )

    loss = MultiResolutionSTFTLoss()
    av = jnp.asarray(np.transpose(a, (0, 2, 1)), jnp.float32)
    bv = jnp.asarray(np.transpose(b, (0, 2, 1)), jnp.float32)
    out = jax.jit(lambda x, y: loss(x, y))(av, bv)
    return float(out)


def main():
    sample_rate = 44100
    sample_size = 2_097_152
    latent_len = sample_size // 2048  # 1024
    steps = int(os.environ.get("BENCH_STEPS", 100))
    batch = int(os.environ.get("BENCH_BATCH", 1))
    cfg_scale = 7.0
    audio_seconds = sample_size / sample_rate  # 47.55

    # transparency: list any non-default perf toggles leaking in from the
    # environment (they change the compiled program and possibly outputs)
    from friendly_stable_audio_tools_tpu.utils.trace_flags import TRACE_TIME_ENV_FLAGS

    # any non-empty value counts: value-carrying flags (FSAT_INT8_SCOPE=mlp,
    # FSAT_INT8_BF16_TAIL=10, ...) change the compiled program too
    active = {k: os.environ[k] for k in TRACE_TIME_ENV_FLAGS
              if os.environ.get(k) not in (None, "", "0")}
    if active:
        print(f"active FSAT flags: {active}", file=sys.stderr)

    n_chips = _backend_watchdog()
    vae, dit = build_models()

    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((batch, latent_len, 64), jnp.bfloat16)
    t0 = jnp.zeros((batch,), jnp.float32)
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (batch, 130, 768), jnp.bfloat16) * 0.02
    g = jax.random.normal(jax.random.fold_in(rng, 2), (batch, 1536), jnp.bfloat16) * 0.02

    print("initializing params...", file=sys.stderr)
    # init under quant_override(False): the produced params are identical
    # either way, but tracing init with int8 enabled compiles a different
    # (never-again-used) HLO — the int8 child subprocess then misses the
    # parent's cached init programs and pays ~10 min of cold compile on the
    # 1-core host.
    from friendly_stable_audio_tools_tpu.ops.quant import quant_override

    with quant_override(False):
        dit_params = dit.init(jax.random.PRNGKey(0), x0, t0, cross_attn_cond=cond, global_embed=g)["params"]
    # De-zero every parameter (CLAUDE.md): the zero-init residual output
    # projections otherwise make the transformer body output-invisible —
    # timing is unaffected either way, but the int8-vs-bf16 fidelity
    # comparison is vacuously zero on a fresh init (every quantized GEMM
    # feeds a zero out-projection). Shared helper so every harness applies
    # the same invariant.
    from friendly_stable_audio_tools_tpu.utils.common import dezero_params

    dit_params = dezero_params(dit_params, dtype=jnp.bfloat16)
    vae_params = vae.init(jax.random.PRNGKey(1), length=2048 * 4)
    vae_params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), vae_params)

    from friendly_stable_audio_tools_tpu.inference.sampling import sample_k

    @jax.jit
    def generate(dit_params, vae_params, cond, g, noise, key):
        def model_fn(x, t, **kw):
            return dit.apply({"params": dit_params}, x.astype(jnp.bfloat16), t,
                             cross_attn_cond=cond, global_embed=g, cfg_scale=cfg_scale)

        latents = sample_k(
            model_fn, noise, steps=steps, sampler_type="dpmpp-3m-sde",
            sigma_min=0.3, sigma_max=500.0, rho=1.0, rng=key,
        )
        audio = vae._decode_nwc(latents.astype(jnp.bfloat16), params=vae_params)
        return audio

    noise = jax.random.normal(jax.random.fold_in(rng, 3), (batch, latent_len, 64), jnp.float32)

    print("compiling + warmup...", file=sys.stderr)
    t_start = time.time()
    out = generate(dit_params, vae_params, cond, g, noise, jax.random.PRNGKey(1))
    _ = float(out[0, 0, 0])  # host transfer: the only reliable sync on this backend
    print(f"first call (compile+run): {time.time()-t_start:.1f}s", file=sys.stderr)

    # timed runs; BENCH_PROFILE=<dir> wraps them in a jax.profiler trace
    # (note: the tunneled axon backend may not support trace capture — the
    # flag is the standard escape hatch for real TPU VMs)
    n_runs = int(os.environ.get("BENCH_RUNS", 3))
    profile_dir = os.environ.get("BENCH_PROFILE")
    if profile_dir:
        jax.profiler.start_trace(profile_dir)
    times = []
    for i in range(n_runs):
        t0_ = time.time()
        out = generate(dit_params, vae_params, cond, g, noise, jax.random.PRNGKey(2 + i))
        _ = float(out[0, 0, 0])  # force completion + host transfer
        times.append(time.time() - t0_)
    if profile_dir:
        jax.profiler.stop_trace()
        print(f"profiler trace written to {profile_dir}", file=sys.stderr)
    wall = min(times)
    assert np.isfinite(np.asarray(out[:, :16, :], np.float32)).all(), "non-finite audio"

    # Fidelity-comparison audio: regenerated with one pinned sampler key,
    # independent of BENCH_RUNS, so parent/child outputs differ only by
    # numerics (int8 vs bf16), never by SDE noise draws. (Regression: the
    # round-3 int8 rel-L2 of 0.178 compared runs with different sampler keys
    # — mostly Brownian-noise decorrelation, not quantization error.)
    # Skipped when nothing consumes it (int8 secondary disabled and no
    # BENCH_SAVE_AUDIO) — it costs a full sampler+decode run.
    need_cmp = bool(os.environ.get("BENCH_SAVE_AUDIO")) or not (
        os.environ.get("BENCH_SKIP_INT8") == "1"
        or os.environ.get("FSAT_INT8_MATMUL") == "1")
    cmp_audio = None
    if need_cmp:
        cmp_out = generate(dit_params, vae_params, cond, g, noise, jax.random.PRNGKey(777))
        cmp_audio = np.asarray(cmp_out, np.float32)

    total_audio_seconds = audio_seconds * batch
    value = total_audio_seconds / wall / n_chips
    result = {
        "metric": "secs_of_audio_per_sec_per_chip",
        "value": round(value, 3),
        "unit": "s_audio/s/chip",
        "vs_baseline": round(value / 20.0, 3),
    }
    print(f"wall per gen: {wall:.2f}s for {total_audio_seconds:.1f}s audio "
          f"({steps} steps, batch {batch}, {n_chips} chip)", file=sys.stderr)

    save_path = os.environ.get("BENCH_SAVE_AUDIO")
    if save_path:
        np.save(save_path, cmp_audio)

    if os.environ.get("BENCH_SKIP_INT8") == "1" or os.environ.get("FSAT_INT8_MATMUL") == "1":
        print(json.dumps(result))
        return

    # int8 secondary: same pipeline under FSAT_INT8_MATMUL=1, run in a
    # bounded subprocess (fresh process = the trace-time flag is correct by
    # construction; a wedged second compile cannot eat the headline). If an
    # external timeout SIGTERMs us mid-int8, print the bf16 result on exit.
    def _on_term(signum, frame):
        print(json.dumps(result), flush=True)
        os._exit(0)

    signal.signal(signal.SIGTERM, _on_term)
    try:
        bf16_audio = cmp_audio
        int8_path = "/tmp/bench_int8_audio.npy"
        # BENCH_INT8_TAIL: bf16 steps at the end of the int8 trajectory.
        # Default 5 = the TRUSTED point of the measured error/speed frontier
        # (docs/performance.md): rel-L2 0.042 / MRSTFT 0.121 vs bf16 —
        # roughly "+0.4 dB gain" perceptual distance — at 20.0x real time
        # (the round-5 segmented-scan hybrid removed the per-step
        # re-quantization that previously kept hybrid points under 20x).
        int8_tail = os.environ.get("BENCH_INT8_TAIL", "5")
        env = dict(os.environ, FSAT_INT8_MATMUL="1", BENCH_SKIP_INT8="1",
                   BENCH_SAVE_AUDIO=int8_path, BENCH_RUNS="2",
                   FSAT_INT8_BF16_TAIL=int8_tail)
        print(f"int8 secondary: recompiling under FSAT_INT8_MATMUL=1 "
              f"FSAT_INT8_BF16_TAIL={int8_tail}...", file=sys.stderr)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)], env=env,
            capture_output=True, text=True,
            # the segmented tail compiles three scan programs; cold-cache
            # child compile measured ~8 min plus runtime
            timeout=int(os.environ.get("BENCH_INT8_TIMEOUT", 1800)),
        )
        sys.stderr.write(proc.stderr)
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        int8_value = json.loads(line)["value"]
        int8_audio = np.load(int8_path)
        rel_l2 = float(np.linalg.norm(int8_audio - bf16_audio) /
                       max(np.linalg.norm(bf16_audio), 1e-12))
        if rel_l2 == 0.0:
            print("WARNING: int8 audio bit-identical to bf16 — the fidelity "
                  "comparison is vacuous (zero-init params?)", file=sys.stderr)
        result["int8_value"] = round(float(int8_value), 3)
        result["int8_bf16_tail_steps"] = int(int8_tail)
        result["int8_rel_l2_vs_bf16"] = round(rel_l2, 5)
        result["int8_mrstft_vs_bf16"] = round(mrstft_distance(int8_audio, bf16_audio), 5)
    except Exception as e:  # noqa: BLE001 — int8 is best-effort, never the headline
        print(f"int8 secondary failed ({type(e).__name__}: {e}); "
              "reporting bf16 only", file=sys.stderr)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
