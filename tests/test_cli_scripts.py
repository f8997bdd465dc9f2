"""End-to-end CLI smoke tests: run the root scripts as real subprocesses.

These exercise the actual user surface (argparse, config loading, file IO,
platform pinning via JAX_PLATFORMS — which enable_compilation_cache applies
in-process so it works even where site hooks force-register an accelerator
plugin), not just the library functions behind them.
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(argv, timeout=600):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["FSAT_ALLOW_FALLBACK_TOKENIZER"] = "1"
    env.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
    return subprocess.run([sys.executable] + argv, cwd=REPO, env=env,
                          capture_output=True, text=True, timeout=timeout)


@pytest.fixture(scope="module")
def tiny_cond_config(tmp_path_factory):
    from test_generation import TINY_COND_CONFIG

    p = tmp_path_factory.mktemp("cfg") / "model_config.json"
    p.write_text(json.dumps(TINY_COND_CONFIG))
    return str(p)


@pytest.fixture(scope="module")
def tiny_vae_config(tmp_path_factory):
    from test_generation import TINY_VAE

    cfg = {
        "model_type": "autoencoder",
        "sample_size": 1024,
        "sample_rate": 16000,
        "audio_channels": 2,
        "model": TINY_VAE,
    }
    p = tmp_path_factory.mktemp("cfg") / "vae_config.json"
    p.write_text(json.dumps(cfg))
    return str(p)


import pytest as _pytest


@_pytest.mark.parametrize("int8", [False, _pytest.param(True, marks=_pytest.mark.slow)])
def test_generate_cli(tmp_path, tiny_cond_config, int8):
    yaml_path = tmp_path / "conds.yaml"
    yaml_path.write_text(
        "smoke:\n"
        "  first:\n"
        "    prompt: a short test tone\n"
        "    seconds_total: 4\n"
    )
    out_dir = tmp_path / "out"
    r = _run([
        "generate.py", "--output-dir", str(out_dir),
        "--cond-yaml-path", str(yaml_path),
        "--model-config", tiny_cond_config,
        "--sample-steps", "2", "--batch-size", "2", "--seed", "3",
        "--sampler-type", "k-euler",  # cheapest compile; dpmpp-3m-sde
        # integration is covered in-process by test_generation
    ] + (["--int8", "--int8-bf16-tail", "1"] if int8 else []))
    assert r.returncode == 0, r.stderr[-2000:]
    wavs = sorted(out_dir.rglob("*.wav"))
    assert wavs, f"no wavs written; stdout={r.stdout[-800:]}"
    from friendly_stable_audio_tools_tpu.data.dataset import load_audio_file

    audio, sr = load_audio_file(str(wavs[0]))
    assert sr == 16000
    assert np.isfinite(np.asarray(audio)).all()


def test_reconstruct_cli(tmp_path, tiny_vae_config):
    from friendly_stable_audio_tools_tpu.utils.audio_utils import write_wav

    audio_dir = tmp_path / "audio"
    audio_dir.mkdir()
    t = np.linspace(0, 1, 16000, dtype=np.float32)
    sine = 0.4 * np.sin(2 * np.pi * 440 * t)
    write_wav(str(audio_dir / "tone.wav"), 16000, np.stack([sine, sine]))

    out_dir = tmp_path / "recon"
    r = _run([
        "reconstruct_audios.py", "--model-config", tiny_vae_config,
        "--audio-dir", str(audio_dir), "--output-dir", str(out_dir),
        "--frame-duration", "0.25", "--batch-size", "2",
    ])
    assert r.returncode == 0, r.stderr[-2000:]
    wavs = sorted(out_dir.rglob("*.wav"))
    assert wavs, f"no reconstructions written; stdout={r.stdout[-800:]}"


@pytest.mark.slow
def test_train_then_unwrap_cli(tmp_path, tiny_cond_config):
    """Full workflow: train.py 2 steps on the example wav dataset, checkpoint
    every step, then unwrap_model.py exports EMA weights as safetensors."""
    from test_generation import TINY_COND_CONFIG

    cfg = json.loads(json.dumps(TINY_COND_CONFIG))
    cfg["training"] = {
        "learning_rate": 1e-4,
        "checkpoint": {"every_n_train_steps": 2},
        "demo": {"demo_every": 100000},
    }
    cfg_path = tmp_path / "model_config.json"
    cfg_path.write_text(json.dumps(cfg))

    save_dir = tmp_path / "runs"
    # the suite env exposes 8 virtual CPU devices; train.py data-parallels
    # over all of them by default, so batch must be divisible by 8 — this
    # exercises the real dp mesh path through the CLI
    r = _run([
        "train.py", "--model-config", str(cfg_path),
        "--dataset-config", "example/local_training_example.json",
        "--save-dir", str(save_dir), "--name", "cli-smoke",
        "--batch-size", "8", "--max-steps", "2", "--num-workers", "0",
        "--seed", "5",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    ckpts = sorted(save_dir.rglob("step_2"))
    assert ckpts, f"no checkpoint written; tree={[str(p) for p in save_dir.rglob('*')][:20]}"

    r2 = _run([
        "unwrap_model.py", "--model-config", str(cfg_path),
        "--ckpt-path", str(ckpts[0]), "--name", str(tmp_path / "exported"),
    ])
    assert r2.returncode == 0, r2.stderr[-3000:]
    out = tmp_path / "exported.safetensors"
    assert out.is_file() and out.stat().st_size > 0

    # the exported checkpoint must load CLEANLY back into generate.py
    # (regression: exports were saved under a "model/" root that the load
    # path never stripped — zero params matched and generation silently ran
    # on random init)
    yaml_path = tmp_path / "conds.yaml"
    yaml_path.write_text("smoke:\n  a:\n    prompt: tone\n    seconds_total: 4\n")
    gen_dir = tmp_path / "gen"
    r3 = _run([
        "generate.py", "--output-dir", str(gen_dir),
        "--cond-yaml-path", str(yaml_path),
        "--model-config", str(cfg_path), "--ckpt-path", str(out),
        "--sample-steps", "2", "--batch-size", "2", "--seed", "3",
    ])
    assert r3.returncode == 0, r3.stderr[-3000:]
    combined = r3.stdout + r3.stderr
    assert "not found in checkpoint" not in combined, \
        f"exported ckpt did not load cleanly:\n{combined[-1500:]}"
    assert sorted(gen_dir.rglob("*.wav"))


@pytest.mark.slow
def test_train_autoencoder_cli(tmp_path):
    """AE GAN training (alternating gen/disc steps) through the train.py CLI
    on the example wav dataset."""
    from test_generation import TINY_VAE

    cfg = {
        "model_type": "autoencoder",
        "sample_size": 1024,
        "sample_rate": 16000,
        "audio_channels": 2,
        "model": json.loads(json.dumps(TINY_VAE)),
        "training": {
            "learning_rate": 1e-4,
            "warmup_steps": 1,
            "use_ema": True,
            "checkpoint": {"every_n_train_steps": 2},
            "demo": {"demo_every": 100000},
            "loss_configs": {
                "discriminator": {
                    "type": "encodec",
                    "config": {"filters": 8, "n_ffts": [128, 64], "hop_lengths": [32, 16],
                               "win_lengths": [128, 64]},
                    "weights": {"adversarial": 0.1, "feature_matching": 5.0},
                },
                "spectral": {
                    "type": "mrstft",
                    "config": {"fft_sizes": [128, 64], "hop_sizes": [32, 16],
                               "win_lengths": [128, 64]},
                    "weights": {"mrstft": 1.0},
                },
                "time": {"type": "l1", "weights": {"l1": 0.1}},
                "bottleneck": {"type": "kl", "weights": {"kl": 1e-4}},
            },
        },
    }
    cfg_path = tmp_path / "vae_train_config.json"
    cfg_path.write_text(json.dumps(cfg))

    save_dir = tmp_path / "runs"
    r = _run([
        "train.py", "--model-config", str(cfg_path),
        "--dataset-config", "example/local_training_example.json",
        "--save-dir", str(save_dir), "--name", "vae-smoke",
        "--batch-size", "8", "--max-steps", "2", "--num-workers", "0",
        "--seed", "5",
    ])
    assert r.returncode == 0, r.stderr[-3000:]
    assert sorted(save_dir.rglob("step_2")), "no checkpoint written"
