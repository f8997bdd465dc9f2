"""Long-form (SA-2.0 shape) end-to-end generation bench with an int8 point.

The SAO headline bench covers 1024 latent frames; the long-form path
(12,582,912 samples = 285 s, 6144 latent frames — reference
stable_audio_2_0.json:3, BASELINE config 5) previously had step-probe
numbers but no END-TO-END speed/error row (round-4 VERDICT item 8). This
runs the full pipeline — 100-step dpmpp-3m-sde CFG scan at 6144 frames +
chunked VAE decode (48 x 128-frame chunks, Bartlett crossfade) — for bf16,
plain int8, and int8+bf16-tail-5, each in a fresh subprocess (trace-time
flags), with ONE pinned sampler key so deltas are numerics only, and
reports wall, real-time factor, waveform rel-L2 and MRSTFT vs bf16.

    python scripts/longform_bench.py            # orchestrates children
    python scripts/longform_bench.py --child    # one measured config
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

FRAMES = 6144
SAMPLE_SIZE = FRAMES * 2048          # 12,582,912
AUDIO_SECONDS = SAMPLE_SIZE / 44100  # 285.3
STEPS = 100

CONFIGS = {
    "bf16": {},
    "int8": {"FSAT_INT8_MATMUL": "1"},
    "int8_tail5": {"FSAT_INT8_MATMUL": "1", "FSAT_INT8_BF16_TAIL": "5"},
}


def child(n_runs: int):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build_models
    from friendly_stable_audio_tools_tpu.inference.sampling import sample_k
    from friendly_stable_audio_tools_tpu.ops.quant import quant_override
    from friendly_stable_audio_tools_tpu.utils.common import dezero_params

    vae, dit = build_models()
    rng = jax.random.PRNGKey(0)
    x0 = jnp.zeros((1, FRAMES, 64), jnp.bfloat16)
    t0 = jnp.zeros((1,), jnp.float32)
    cond = jax.random.normal(jax.random.fold_in(rng, 1), (1, 130, 768), jnp.bfloat16) * 0.02
    g = jax.random.normal(jax.random.fold_in(rng, 2), (1, 1536), jnp.bfloat16) * 0.02
    with quant_override(False):
        dit_params = dit.init(jax.random.PRNGKey(0), x0, t0, cross_attn_cond=cond,
                              global_embed=g)["params"]
    dit_params = dezero_params(dit_params, dtype=jnp.bfloat16)
    vae.init(jax.random.PRNGKey(1), length=2048 * 4)
    vae.params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), vae.params)
    noise = jax.random.normal(jax.random.fold_in(rng, 3), (1, FRAMES, 64), jnp.float32)

    @jax.jit
    def denoise(dit_params, cond, g, noise, key):
        def model_fn(x, t, **kw):
            return dit.apply({"params": dit_params}, x.astype(jnp.bfloat16), t,
                             cross_attn_cond=cond, global_embed=g, cfg_scale=7.0)

        return sample_k(model_fn, noise, steps=STEPS, sampler_type="dpmpp-3m-sde",
                        sigma_min=0.3, sigma_max=500.0, rho=1.0, rng=key)

    def generate(key):
        latents = denoise(dit_params, cond, g, noise, key)
        # chunked streaming decode (reference autoencoders.py:499-571) —
        # the long-form path; [B, L, C] latents -> [B, C, T] via the
        # public [B, latent_dim, L] API
        audio = vae.decode_audio(latents.astype(jnp.bfloat16).transpose(0, 2, 1),
                                 chunked=True, chunk_size=128, overlap=4)
        return audio

    t0_ = time.time()
    out = generate(jax.random.PRNGKey(2))
    _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
    print(f"first call (compile+run): {time.time() - t0_:.1f}s", file=sys.stderr)

    times = []
    for i in range(n_runs):
        t1 = time.time()
        out = generate(jax.random.PRNGKey(3 + i))
        _ = float(jnp.asarray(out).ravel()[0].astype(jnp.float32))
        times.append(time.time() - t1)
    wall = min(times)

    cmp_out = np.asarray(generate(jax.random.PRNGKey(777)), np.float32)
    save = os.environ["LFB_SAVE"]
    np.save(save, cmp_out)
    print(json.dumps({"wall_s": round(wall, 2),
                      "realtime_factor": round(AUDIO_SECONDS / wall, 2)}))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=2700)
    args = ap.parse_args()
    if args.child:
        child(args.runs)
        return

    results = {}
    for name, extra in CONFIGS.items():
        path = f"/tmp/lfb_{name}.npy"
        env = dict(os.environ, LFB_SAVE=path, **extra)
        print(f"--- {name}", file=sys.stderr, flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child",
             "--runs", str(args.runs)],
            env=env, capture_output=True, text=True, timeout=args.timeout, cwd=REPO)
        sys.stderr.write(proc.stderr)
        lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if not lines:
            print(json.dumps({"config": name, "error": f"rc={proc.returncode}"}))
            continue
        results[name] = {**json.loads(lines[-1]), "audio": path}
        print(json.dumps({"config": name, **{k: v for k, v in results[name].items() if k != "audio"}}), flush=True)

    if "bf16" not in results:
        sys.exit(1)
    import numpy as np

    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench import mrstft_distance

    ref = np.load(results["bf16"]["audio"])
    for name, r in results.items():
        if name == "bf16":
            continue
        a = np.load(r["audio"])
        rel = float(np.linalg.norm(a - ref) / max(np.linalg.norm(ref), 1e-12))
        print(json.dumps({"config": name, "rel_l2_vs_bf16": round(rel, 5),
                          "mrstft_vs_bf16": round(mrstft_distance(a, ref), 5)}),
              flush=True)


if __name__ == "__main__":
    main()
