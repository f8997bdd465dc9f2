"""Pretrained-checkpoint parity harness.

Given a checkpoint directory (`model_config.json` + weights — reference
PyTorch `model.safetensors`/`model.ckpt`, converted on the fly, or this
framework's own exports), runs DETERMINISTIC fixed-input probes through the
model and writes the raw outputs + summary stats. Two runs (e.g. this
framework vs the reference PyTorch stack, or two framework versions) can
then be diffed stage by stage.

Probes (all inputs derived from `numpy.random.default_rng(seed)` so any
stack can regenerate them bit-identically):
  * `vae_recon`    — autoencoder round-trip of a fixed sine mixture
  * `denoiser_out` — one denoiser forward at fixed noise/t/conditioning
  * `gen_latents`  — fixed-noise N-step dpmpp-3m-sde generation (latents)

Usage:
  python scripts/parity_check.py CKPT_DIR --save-outputs jax_out.npz
  python scripts/parity_check.py CKPT_DIR --compare torch_out.npz

Producing the torch-side npz on a machine with the reference installed
(`pip install stable-audio-tools`), mirror the probes:

    import numpy as np, torch, json
    from stable_audio_tools import create_model_from_config
    cfg = json.load(open(f"{d}/model_config.json"))
    model = create_model_from_config(cfg); ...load weights...
    rng = np.random.default_rng(0)
    x = parity_sine_batch(cfg)                       # same helper below
    recon = model.decode(model.encode(torch.tensor(x)))
    np.savez("torch_out.npz", vae_recon=recon.numpy(), ...)

The probe inputs here are what matters: keep seeds/shapes identical.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parity_sine_batch(model_config: dict, seconds: float = 2.0) -> np.ndarray:
    """Deterministic multi-sine test signal [1, C, T] in [-0.9, 0.9]."""
    sr = model_config["sample_rate"]
    ch = model_config.get("audio_channels", 2)
    t = np.arange(int(sr * seconds)) / sr
    rng = np.random.default_rng(0)
    sig = np.zeros((ch, len(t)), np.float32)
    for c in range(ch):
        for f in (220.0, 440.0, 587.33, 1250.0):
            sig[c] += rng.uniform(0.1, 0.25) * np.sin(2 * np.pi * f * t + rng.uniform(0, np.pi))
    return (0.9 * sig / np.abs(sig).max())[None]


def _stats(name: str, arr: np.ndarray) -> dict:
    arr = np.asarray(arr, np.float32)
    return {
        "name": name, "shape": list(arr.shape),
        "mean": float(arr.mean()), "std": float(arr.std()),
        "min": float(arr.min()), "max": float(arr.max()),
        "finite": bool(np.isfinite(arr).all()),
    }


def run_probes(model_dir: str, gen_steps: int = 8) -> dict:
    import jax
    import jax.numpy as jnp

    from friendly_stable_audio_tools_tpu.models.pretrained import get_pretrained_model

    model, cfg = get_pretrained_model(model_dir)
    model_type = cfg["model_type"]
    outputs: dict = {}
    rng = np.random.default_rng(0)

    if model_type == "autoencoder":
        x = parity_sine_batch(cfg)
        # pad to the downsampling grid
        ratio = model.downsampling_ratio
        pad = (-x.shape[-1]) % ratio
        x = np.pad(x, ((0, 0), (0, 0), (0, pad)))
        latents = model.encode(jnp.asarray(x))
        recon = model.decode(latents)
        outputs["vae_latents"] = np.asarray(latents)
        outputs["vae_recon"] = np.asarray(recon)
    elif model_type in ("diffusion_cond", "diffusion_cond_inpaint", "diffusion_prior",
                        "diffusion_uncond"):
        sample_size = min(cfg["sample_size"], 2**17)
        latent_len = sample_size
        io_ch = model.io_channels
        if model.pretransform is not None:
            latent_len = sample_size // model.pretransform.downsampling_ratio
        noise = rng.standard_normal((1, latent_len, io_ch)).astype(np.float32)
        t = np.asarray([0.5], np.float32)

        if model_type == "diffusion_uncond":
            out = model.forward(model.params, jnp.asarray(noise), jnp.asarray(t))
            outputs["denoiser_out"] = np.asarray(out)
            from friendly_stable_audio_tools_tpu.inference.generation import generate_diffusion_uncond

            lat = generate_diffusion_uncond(
                model, steps=gen_steps, batch_size=1, sample_size=sample_size,
                seed=0, sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500.0,
                return_latents=model.pretransform is not None)
            outputs["gen_latents"] = np.asarray(lat)
        else:
            conditioning = [{"prompt": "a parity test tone", "seconds_start": 0,
                             "seconds_total": int(sample_size / cfg["sample_rate"]) or 1}]
            try:
                cond_tensors = model.conditioner(conditioning)
            except Exception as e:  # e.g. hash-fallback hard-fail without spiece.model
                outputs["_conditioning_error"] = str(e)
                cond_tensors = None
            if cond_tensors is not None:
                inputs = model.get_conditioning_inputs(cond_tensors)
                out = model.model_fn(model.params, jnp.asarray(noise), jnp.asarray(t),
                                     cfg_scale=1.0, **inputs)
                outputs["denoiser_out"] = np.asarray(out)
                from friendly_stable_audio_tools_tpu.inference.generation import generate_diffusion_cond

                lat = generate_diffusion_cond(
                    model, steps=gen_steps, cfg_scale=6.0,
                    conditioning=conditioning, sample_size=sample_size, seed=0,
                    sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500.0,
                    return_latents=model.pretransform is not None)
                outputs["gen_latents"] = np.asarray(lat)
        # VAE round trip through the embedded pretransform
        if model.pretransform is not None and hasattr(model.pretransform, "model"):
            x = parity_sine_batch(cfg)
            ratio = model.pretransform.downsampling_ratio
            pad = (-x.shape[-1]) % ratio
            x = np.pad(x, ((0, 0), (0, 0), (0, pad)))
            x_nwc = jnp.asarray(x).transpose(0, 2, 1)
            z = model.pretransform.encode_nwc(x_nwc)
            rec = model.pretransform.decode_nwc(z)
            outputs["vae_latents"] = np.asarray(z)
            outputs["vae_recon"] = np.asarray(rec).transpose(0, 2, 1)
    else:
        raise SystemExit(f"parity probes not implemented for model_type={model_type}")

    return outputs


def compare(outputs: dict, ref_path: str) -> int:
    ref = np.load(ref_path)
    print(f"{'stage':<16} {'max abs err':>12} {'max rel err':>12} {'ref std':>10}")
    worst = 0.0
    for k in sorted(set(outputs) & set(ref.files)):
        a = np.asarray(outputs[k], np.float32)
        b = np.asarray(ref[k], np.float32)
        if a.shape != b.shape:
            print(f"{k:<16} SHAPE MISMATCH {a.shape} vs {b.shape}")
            worst = np.inf
            continue
        abs_err = float(np.abs(a - b).max())
        rel = abs_err / max(float(np.abs(b).max()), 1e-9)
        worst = max(worst, rel)
        print(f"{k:<16} {abs_err:12.4e} {rel:12.4e} {float(b.std()):10.4f}")
    missing = set(ref.files) - set(outputs)
    if missing:
        print(f"missing stages vs reference: {sorted(missing)}")
    return 0 if worst < 1e-2 and not missing else 1


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("model_dir", help="dir with model_config.json + weights")
    ap.add_argument("--gen-steps", type=int, default=8)
    ap.add_argument("--save-outputs", help="write raw probe outputs to this .npz")
    ap.add_argument("--compare", help="diff against a previously saved .npz")
    ap.add_argument("--report", default=None, help="write summary-stat json here")
    ap.add_argument("--cpu", action="store_true",
                    help="force the host CPU platform (overrides any "
                         "site-level TPU plugin registration)")
    args = ap.parse_args()

    if args.cpu:
        os.environ["JAX_PLATFORMS"] = "cpu"
        import jax

        jax.config.update("jax_platforms", "cpu")

    outputs = run_probes(args.model_dir, gen_steps=args.gen_steps)

    report = [_stats(k, v) for k, v in outputs.items() if not k.startswith("_")]
    for row in report:
        print(row)
    if "_conditioning_error" in outputs:
        print("conditioning skipped:", outputs["_conditioning_error"])
    if args.report:
        with open(args.report, "w") as f:
            json.dump(report, f, indent=2)
    if args.save_outputs:
        np.savez(args.save_outputs, **{k: v for k, v in outputs.items() if not k.startswith("_")})
        print(f"outputs saved to {args.save_outputs}")
    if args.compare:
        raise SystemExit(compare(outputs, args.compare))


if __name__ == "__main__":
    main()
