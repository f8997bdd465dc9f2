"""Measure the int8 error/speed frontier for the SAO generation recipe.

Sweeps int8 configurations (plain, bf16-tail hybrid FSAT_INT8_BF16_TAIL=N,
MLP-only scope FSAT_INT8_SCOPE=mlp) against the bf16 pipeline, all through
`bench.py` child processes on the real chip with the SAME pinned sampler key
(bench.py PRNGKey(777) comparison audio), so per-config deltas are numerics
only — never SDE noise draws.

Per config, reports: s-audio/s/chip, end-to-end waveform rel-L2 vs bf16, and
MRSTFT distance vs bf16 (the repo's auraloss port — the reference's own
reconstruction loss family). Prints one JSON line per config plus a final
markdown table for docs/performance.md.

Runtime: each config is a fresh bench.py compile (~5-15 min each on the
single-core host, cache-dependent). Run serialized, nothing else compiling.

Usage: python scripts/int8_frontier.py [--configs name1,name2,...]
"""

import argparse
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CONFIGS = {
    # name -> extra env (bf16 runs first and is the comparison target).
    # Ordered by value: chip access comes in ~30-min healthy windows between
    # tunnel wedges, so the core frontier points go first (int8_tail10 also
    # pre-warms the compile cache for bench.py's int8 secondary).
    "bf16": {},
    "int8": {"FSAT_INT8_MATMUL": "1"},
    "int8_tail5": {"FSAT_INT8_MATMUL": "1", "FSAT_INT8_BF16_TAIL": "5"},
    "int8_tail3": {"FSAT_INT8_MATMUL": "1", "FSAT_INT8_BF16_TAIL": "3"},
    "int8_tail10": {"FSAT_INT8_MATMUL": "1", "FSAT_INT8_BF16_TAIL": "10"},
    "int8_mlp": {"FSAT_INT8_MATMUL": "1", "FSAT_INT8_SCOPE": "mlp"},
    "int8_tail25": {"FSAT_INT8_MATMUL": "1", "FSAT_INT8_BF16_TAIL": "25"},
    "int8_mlp_tail10": {"FSAT_INT8_MATMUL": "1", "FSAT_INT8_SCOPE": "mlp",
                        "FSAT_INT8_BF16_TAIL": "10"},
}


def wait_healthy(max_wait_s: int = 6 * 3600) -> bool:
    """Gate on the tunnel being able to complete a dispatch (it can wedge —
    scripts/tpu_health.py); retry with backoff up to max_wait_s."""
    import time

    t0 = time.time()
    while True:
        rc = subprocess.run(
            [sys.executable, os.path.join(REPO, "scripts/tpu_health.py"),
             "--timeout", "90"], cwd=REPO).returncode
        if rc == 0:
            return True
        waited = int(time.time() - t0)  # wall clock, not a guessed increment
        if waited >= max_wait_s:
            return False
        # NOTE: rc != 0 can also be a non-wedge failure (import error etc.) —
        # tpu_health.py prints its own diagnostics to this stderr either way;
        # read them before assuming the tunnel is the problem.
        print(f"tpu_health rc={rc}; retrying in 120s (waited {waited}s)",
              file=sys.stderr, flush=True)
        time.sleep(120)


def _code_rev() -> str:
    """Short git rev of the repo; cached results must not survive code
    changes (mixing audio from different revisions measures the code delta,
    not quantization error — the round-3 0.178 bug class)."""
    try:
        return subprocess.run(["git", "rev-parse", "--short", "HEAD"],
                              cwd=REPO, capture_output=True,
                              text=True).stdout.strip() or "norev"
    except OSError:
        return "norev"


def run_one(name: str, extra_env: dict, timeout: int) -> dict:
    rev = _code_rev()
    audio_path = f"/tmp/frontier_{rev}_{name}.npy"
    log_path = f"/tmp/frontier_{rev}_{name}.log"
    value_path = f"/tmp/frontier_{rev}_{name}.value"
    if os.path.exists(audio_path) and os.path.exists(value_path):
        # resumable across restarts: compiles here cost 20+ min per config
        with open(value_path) as f:
            value = float(f.read())
        print(f"--- {name}: cached ({value})", file=sys.stderr, flush=True)
        return {"name": name, "value": value, "audio": audio_path}
    env = dict(os.environ, BENCH_SKIP_INT8="1", BENCH_RUNS="2",
               BENCH_SAVE_AUDIO=audio_path, **extra_env)
    print(f"--- {name}: {extra_env or '(pure bf16)'} (log: {log_path})",
          file=sys.stderr, flush=True)
    if not wait_healthy():
        return {"name": name, "error": "tunnel wedged", "audio": audio_path}
    with open(log_path, "w") as log:
        try:
            proc = subprocess.run(
                [sys.executable, os.path.join(REPO, "bench.py")], env=env,
                stdout=subprocess.PIPE, stderr=log, text=True,
                timeout=timeout, cwd=REPO,
            )
        except subprocess.TimeoutExpired:
            return {"name": name, "error": f"timeout {timeout}s", "audio": audio_path}
    lines = [l for l in proc.stdout.splitlines() if l.startswith("{")]
    if not lines:
        return {"name": name, "error": f"no JSON (rc={proc.returncode})",
                "audio": audio_path}
    value = json.loads(lines[-1])["value"]
    with open(value_path, "w") as f:
        f.write(str(value))
    return {"name": name, "value": value, "audio": audio_path}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--configs", default=",".join(CONFIGS),
                    help="comma-separated subset of: " + ",".join(CONFIGS))
    ap.add_argument("--timeout", type=int, default=1800, help="per-config bench timeout (s)")
    args = ap.parse_args()
    names = [n for n in args.configs.split(",") if n]
    if "bf16" not in names:
        names = ["bf16"] + names

    results = []
    for name in names:
        r = run_one(name, CONFIGS[name], args.timeout)
        results.append(r)
        print(json.dumps(r), flush=True)

    ok = [r for r in results if "error" not in r]
    if not ok or ok[0]["name"] != "bf16":
        print("bf16 baseline failed — no comparisons possible", file=sys.stderr)
        sys.exit(1)
    ref = np.load(ok[0]["audio"])  # bf16 comparison audio (key 777)
    sys.path.insert(0, REPO)
    # analysis runs on host CPU (measured ~16 s per MRSTFT pair): this
    # process never touches the TPU, so a wedged tunnel can't hang the
    # final analysis after all the measurements are already on disk
    import jax

    jax.config.update("jax_platforms", "cpu")
    from bench import mrstft_distance

    rows = []
    for r in ok:
        a = np.load(r["audio"])
        rel_l2 = float(np.linalg.norm(a - ref) / max(np.linalg.norm(ref), 1e-12))
        mrstft = mrstft_distance(a, ref) if r["name"] != "bf16" else 0.0
        row = {"config": r["name"], "s_audio_per_s_per_chip": round(r["value"], 3),
               "rel_l2_vs_bf16": round(rel_l2, 5), "mrstft_vs_bf16": round(mrstft, 5)}
        rows.append(row)
        print(json.dumps(row), flush=True)

    print("\n| config | s-audio/s/chip | rel-L2 vs bf16 | MRSTFT vs bf16 |")
    print("|---|---|---|---|")
    for row in rows:
        print(f"| {row['config']} | {row['s_audio_per_s_per_chip']} "
              f"| {row['rel_l2_vs_bf16']} | {row['mrstft_vs_bf16']} |")


if __name__ == "__main__":
    main()
