"""CI-tier test for scripts/parity_check.py on a synthetic checkpoint
(VERDICT #9: the harness must be runnable the moment real weights are
mounted; here we validate the machinery end-to-end on a tiny torch-format
autoencoder checkpoint)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import torch

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "tests"))

from test_torch_import import build_torch_oobleck_encoder  # noqa: E402


def _make_ckpt_dir(tmp_path):
    from safetensors.numpy import save_file

    torch.manual_seed(3)
    tenc = build_torch_oobleck_encoder(in_ch=2, channels=4, c_mults=(1, 2), strides=(2, 4), latent=8)
    sd = {f"encoder.{k}": v.detach().numpy() for k, v in tenc.state_dict().items()}
    save_file(sd, str(tmp_path / "model.safetensors"))
    model_config = {
        "model_type": "autoencoder",
        "sample_size": 64,
        "sample_rate": 16000,
        "audio_channels": 2,
        "model": {
            "encoder": {"type": "oobleck", "config": {
                "in_channels": 2, "channels": 4, "c_mults": [1, 2], "strides": [2, 4],
                "latent_dim": 8, "use_snake": True}},
            "decoder": {"type": "oobleck", "config": {
                "out_channels": 2, "channels": 4, "c_mults": [1, 2], "strides": [2, 4],
                "latent_dim": 4, "use_snake": True}},
            "bottleneck": {"type": "vae"},
            "latent_dim": 4, "downsampling_ratio": 8, "io_channels": 2,
        },
        "training": {},
    }
    with open(tmp_path / "model_config.json", "w") as f:
        json.dump(model_config, f)
    return str(tmp_path)


@pytest.mark.slow
def test_parity_probes_and_selfcompare(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    import parity_check

    ckpt_dir = _make_ckpt_dir(tmp_path)
    outputs = parity_check.run_probes(ckpt_dir)
    assert "vae_recon" in outputs and "vae_latents" in outputs
    for v in outputs.values():
        if isinstance(v, np.ndarray):
            assert np.isfinite(v).all()

    ref_npz = tmp_path / "ref.npz"
    np.savez(ref_npz, **{k: v for k, v in outputs.items() if not k.startswith("_")})
    assert parity_check.compare(outputs, str(ref_npz)) == 0

    # a perturbed reference must be flagged
    bad = dict(outputs)
    bad["vae_recon"] = outputs["vae_recon"] + 1.0
    assert parity_check.compare(bad, str(ref_npz)) == 1


def test_parity_cli_report(tmp_path):
    ckpt_dir = _make_ckpt_dir(tmp_path)
    report_path = str(tmp_path / "report.json")
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "parity_check.py"),
         ckpt_dir, "--report", report_path, "--cpu"],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(report_path) as f:
        report = json.load(f)
    assert any(r["name"] == "vae_recon" and r["finite"] for r in report)
