"""End-to-end probes for BASELINE configs 1 and 4 (VERDICT round-4 item 7).

  recon    chunked VAE reconstruct (encode+decode, Bartlett crossfade) of a
           10 s 44.1 kHz stereo clip — reconstruct_audios.py path
           (reference autoencoders.py:410-645, BASELINE config 1) — plus
           unchunked encode/decode of the same clip for the component view.
  inpaint  full SAO-1.0 inpainting generation (Hann mask + per-step
           re-noising inside the sampler scan, reference
           sampling.py:175-204 / generation.py:170-216, BASELINE config 4)
           vs plain generation at equal steps. Done-bar: inpaint within ~5%
           of plain.

    python scripts/e2e_probe.py --section all

Random-init weights (zero egress) — throughput is architecture-determined.
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_probe import emit, sync, timeit  # noqa: E402


def probe_recon(n=3):
    from bench import build_models

    vae, _ = build_models()
    rng = jax.random.PRNGKey(0)
    vae.init(rng, length=2048 * 4)
    vae.params = jax.tree_util.tree_map(lambda p: p.astype(jnp.bfloat16), vae.params)

    sr = 44100
    seconds = 10
    t = (seconds * sr // 2048) * 2048  # ratio-aligned like reconstruct_audios.py
    audio = jax.random.normal(jax.random.fold_in(rng, 1), (1, 2, t), jnp.float32) * 0.1

    # chunked reconstruct (the reference's chunk_size=128 default)
    def recon(a):
        return vae.reconstruct_audio(a, chunked=True, chunk_size=128, overlap=4)

    tr = timeit(recon, audio, n=n)
    emit(probe="vae_reconstruct_chunked_10s", ms=round(tr * 1e3, 1),
         audio_s_per_s=round(seconds / tr, 1))

    # components, unchunked (single jitted call each)
    enc = jax.jit(lambda a: vae.encode(a))
    lat = enc(audio)
    te = timeit(enc, audio, n=n)
    dec = jax.jit(lambda z: vae.decode(z))
    td = timeit(dec, lat, n=n)
    emit(probe="vae_encode_10s", ms=round(te * 1e3, 1),
         audio_s_per_s=round(seconds / te, 1))
    emit(probe="vae_decode_10s", ms=round(td * 1e3, 1),
         audio_s_per_s=round(seconds / td, 1))


def probe_inpaint(n=2, steps=100):
    from friendly_stable_audio_tools_tpu.inference.generation import generate_diffusion_cond
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    import json

    cfg_path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "friendly_stable_audio_tools_tpu", "configs",
                            "model_configs", "txt2audio", "stable_audio_open_1_0.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    model = create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))

    sample_size = cfg["sample_size"]
    cond = [{"prompt": "probe", "seconds_start": 0, "seconds_total": 47}]
    init_audio = (44100, np.random.default_rng(0).standard_normal(
        (2, sample_size)).astype(np.float32) * 0.1)
    # percentages of the clip (gradio UI semantics): inpaint the 20-60% span
    mask_args = {"cropfrom": 0.0, "pastefrom": 0.0, "pasteto": 100.0,
                 "maskstart": 20.0, "maskend": 60.0, "softnessL": 2.0,
                 "softnessR": 2.0, "marination": 0.0}

    common = dict(steps=steps, cfg_scale=7.0, conditioning=cond,
                  sample_size=sample_size, seed=42,
                  sampler_type="dpmpp-3m-sde", sigma_min=0.3, sigma_max=500,
                  rho=1.0)

    results = {}
    for tag, kw in (("plain", {}),
                    ("inpaint", {"init_audio": init_audio, "mask_args": mask_args})):
        def gen():
            return generate_diffusion_cond(model, **common, **kw)

        t0 = time.time()
        sync(gen())
        compile_s = time.time() - t0
        times = []
        for _ in range(n):
            t0 = time.time()
            sync(gen())
            times.append(time.time() - t0)
        results[tag] = min(times)
        emit(probe=f"generate_{tag}_{steps}steps", wall_s=round(results[tag], 3),
             compile_s=round(compile_s, 1),
             s_audio_per_s=round(sample_size / 44100 / results[tag], 2))
    emit(probe="inpaint_vs_plain_ratio",
         ratio=round(results["inpaint"] / results["plain"], 4))

    # decompose the gap: the init-audio VAE encode is real extra work the
    # reference pays too (its generate_diffusion_cond encodes init_audio every
    # call, reference generation.py:186-193); what must NOT cost anything is
    # the in-scan mask merge. Time the encode component (jitted, incl. the
    # 16 MB host->device transfer) and report the encode-adjusted ratio.
    from friendly_stable_audio_tools_tpu.inference.utils import prepare_audio
    import jax.numpy as jnp

    prepared = prepare_audio(init_audio[1], in_sr=44100, target_sr=44100,
                             target_length=sample_size, target_channels=2)
    pt = model.pretransform

    def enc():
        x = jnp.asarray(np.asarray(prepared)).transpose(0, 2, 1)
        return pt.encode_nwc(x, params=pt.model.params)

    sync(enc())
    tenc = []
    for _ in range(3):
        t0 = time.time()
        sync(enc())
        tenc.append(time.time() - t0)
    t_enc = min(tenc)
    adj = (results["inpaint"] - t_enc) / results["plain"]
    emit(probe="init_audio_encode_component", wall_s=round(t_enc, 3))
    emit(probe="inpaint_vs_plain_ratio_encode_adjusted", ratio=round(adj, 4))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all", choices=["recon", "inpaint", "all"])
    ap.add_argument("-n", type=int, default=3)
    args = ap.parse_args()
    emit(probe="env", device=str(jax.devices()[0]))
    if args.section in ("recon", "all"):
        probe_recon(args.n)
    if args.section in ("inpaint", "all"):
        probe_inpaint(max(2, args.n - 1))


if __name__ == "__main__":
    main()
