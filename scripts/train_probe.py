"""Training-path probe: the steps the REFERENCE actually runs, measured.

Round-4's training table (`tpu_probe.py --section train`) measured a bare
DiT fwd+bwd on pre-encoded latents. The reference's diffusion training step
ALSO runs the frozen-VAE encode and the conditioner forward every step
(reference training/diffusion.py:304-429, SURVEY §3.1 marks
pretransform.encode HOT), and the reference's other primary training
workloads had no number at all. Sections:

  full     diffusion_cond step as trained: SAO-1.0 config (T5-base + VAE
           pretransform + 1.14B DiT), raw-audio batch -> conditioner fwd +
           frozen VAE encode + DiT fwd/bwd + update, through the REAL
           DiffusionCondTrainingWrapper. Components (encode-only, T5-only)
           measured beside the composed step.
  aegan    AE-GAN alternating gen/disc steps (stable_audio_2_0_vae.json:
           Oobleck VAE + Encodec MS-STFT discriminator + full MRSTFT loss
           stack), reference training/autoencoders.py:165-261.
  lm       MusicGen-small-shaped LM training step (per-codebook masked CE,
           reference training/lm.py:119-162).
  lmdecode AR generate loop with static KV caches (reference lm.py:351-462):
           tokens/s and real-time factor.

    python scripts/train_probe.py --section all

Optimizer note: probes use SGD (momentum 0) instead of AdamW so the 1.14B
DiT fits single-chip HBM (Adam's fp32 moments belong on an fsdp mesh); the
measured fwd+bwd+apply cost is optimizer-independent to <1%. EMA is ON for
`full` (the reference updates EMA every step).
"""

from __future__ import annotations

import argparse
import functools
import json
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

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CFG_DIR = os.path.join(REPO, "friendly_stable_audio_tools_tpu", "configs", "model_configs")

SGD = {"optimizer": {"type": "SGD", "config": {"lr": 1e-4}}}


def _load(rel):
    with open(os.path.join(CFG_DIR, rel)) as f:
        return json.load(f)


def probe_full(n=3, batches=None):
    if batches is None:
        batches = tuple(int(b) for b in
                        os.environ.get("TRAIN_PROBE_BATCHES", "2,4,8").split(","))
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.training.diffusion import DiffusionCondTrainingWrapper

    cfg = _load("txt2audio/stable_audio_open_1_0.json")
    sample_size = cfg["sample_size"]  # 2,097,152 = 47.55 s
    model = create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))

    # bf16 params/activations (the repo's training policy; fp32 trees put
    # 12.6 GB of arguments on a 15.75 GB chip and OOM)
    def cast16(tree):
        return jax.tree_util.tree_map(
            lambda a: a.astype(jnp.bfloat16)
            if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) else a,
            tree)

    model.params = cast16(model.params)
    for c in model.conditioner.conditioners.values():
        if c.params:
            c.params = cast16(c.params)
    if model.pretransform is not None and getattr(model.pretransform, "model", None) is not None:
        model.pretransform.model.params = cast16(model.pretransform.model.params)
    wrapper = DiffusionCondTrainingWrapper(
        model, use_ema=True, cfg_dropout_prob=0.1,
        optimizer_configs={"diffusion": SGD})
    frozen = wrapper.frozen_arrays()

    rng = np.random.default_rng(0)
    for batch in batches:
        reals = (rng.standard_normal((batch, 2, sample_size)) * 0.1).astype(np.float32)
        meta = [{"prompt": "probe prompt", "seconds_start": 0,
                 "seconds_total": 47} for _ in range(batch)]
        b = wrapper.prepare_batch(reals, meta)
        b["reals"] = b["reals"].astype(jnp.bfloat16)
        # the in-step VAE encode's activation peak limits a single 15.75 GB
        # chip to ~2 raw-audio samples per microbatch (batch 4 measured
        # program 15.2 GB); larger batches run as microbatch-2 gradient
        # accumulation (accumulate_grad_batches parity, one optimizer step)
        accum = max(1, batch // 2)
        state = wrapper.init_state()

        # frozen params ride as jit ARGUMENTS (stale-weight/giant-constant
        # hazard — repo convention)
        step = jax.jit(lambda s, b_, k, fz: wrapper.train_step(s, b_, k, accum=accum, frozen=fz),
                       donate_argnums=(0,))
        holder = {"s": state}

        def run(b, key):
            holder["s"], metrics = step(holder["s"], b, key, frozen)
            return metrics["loss"]

        t = timeit(functools.partial(run, b), jax.random.PRNGKey(1), n=n)
        emit(probe="train_full_sao", batch=batch, accum=accum, ms=round(t * 1e3, 1),
             samples_per_s=round(batch / t, 2),
             audio_s_per_s=round(batch * sample_size / 44100 / t, 1))

        # components: frozen-VAE encode alone; T5 conditioner alone
        pt = model.pretransform

        @jax.jit
        def enc(x, p):
            return pt.encode_nwc(x, params=p)

        x_nwc = jnp.asarray(reals.transpose(0, 2, 1))
        te = timeit(lambda: enc(x_nwc, frozen["pretransform"]), n=n)
        emit(probe="train_full_sao_encode_only", batch=batch, ms=round(te * 1e3, 1))

        t5 = model.conditioner.conditioners["prompt"]

        @jax.jit
        def t5fwd(p, ids, am):
            return t5.module.apply({"params": p}, ids, am)[0]

        cond_b = b["cond"]["prompt"]
        p5 = frozen["cond"].get("prompt") or wrapper.trainable_params()["conditioner"]["prompt"]
        tt = timeit(lambda: t5fwd(p5, cond_b["input_ids"], cond_b["attention_mask"]), n=n)
        emit(probe="train_full_sao_t5_only", batch=batch, ms=round(tt * 1e3, 2))
        del state, holder, step, b
        # drop the previous batch's executables + donated buffers before the
        # next, larger, compile: batch 4 straight after batch 2 in one
        # process died with an opaque TPU InvalidArgument (HBM pressure);
        # alone it passes with ~1.5 GB to spare
        import gc

        jax.clear_caches()
        gc.collect()


def probe_aegan(n=3, batch=8):
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.training.factory import create_training_wrapper_from_config

    cfg = _load("autoencoders/stable_audio_2_0_vae.json")
    sample_size = cfg["sample_size"]  # 65536
    model = create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))
    wrapper = create_training_wrapper_from_config(cfg, model)
    state = wrapper.init_state(example_length=sample_size)

    rng = np.random.default_rng(0)
    reals = jnp.asarray((rng.standard_normal((batch, sample_size, 2)) * 0.1), jnp.float32)

    for which in ("gen", "disc"):
        fn = wrapper._get_step_fn(which, warmed_up=True, freeze_encoder=False)
        step = jax.jit(fn, donate_argnums=())
        holder = {"s": state}

        def run(reals, key):
            s2, metrics = step(holder["s"], reals, key)
            return metrics["loss"]

        t = timeit(functools.partial(run, reals), jax.random.PRNGKey(1), n=n)
        emit(probe=f"aegan_{which}_step", batch=batch, sample_size=sample_size,
             ms=round(t * 1e3, 1),
             audio_s_per_s=round(batch * sample_size / cfg["sample_rate"] / t, 1))


MUSICGEN_SMALL_LM = {
    "model_type": "lm",
    "sample_size": 320000,
    "sample_rate": 32000,
    "audio_channels": 1,
    "model": {
        "pretransform": None,  # filled from encodec_musicgen_rvq below
        "conditioning": {
            "configs": [
                {"id": "prompt", "type": "lut",
                 "config": {"tokenizer_name": "t5-base", "max_length": 128}},
            ],
            "cond_dim": 1024,
        },
        "lm": {
            "type": "continuous_transformer",
            "codebook_pattern": "delay",
            "cross_attention_cond_ids": ["prompt"],
            "config": {
                "embed_dim": 1024, "depth": 24, "num_heads": 16,
                "cross_attn_cond_dim": 1024,
            },
        },
    },
}


def _build_lm():
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config

    rvq = _load("autoencoders/encodec_musicgen_rvq.json")
    cfg = json.loads(json.dumps(MUSICGEN_SMALL_LM))
    cfg["model"]["pretransform"] = {"type": "autoencoder", "config": rvq["model"]}
    return cfg, create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))


def probe_lm(n=3, batch=8, seconds=10):
    from friendly_stable_audio_tools_tpu.training.lm import AudioLanguageModelTrainingWrapper

    cfg, model = _build_lm()
    wrapper = AudioLanguageModelTrainingWrapper(model, optimizer_configs={"lm": SGD})
    state = wrapper.init_state()
    frozen = wrapper.frozen_arrays()

    sr = cfg["sample_rate"]
    t_samples = seconds * sr
    rng = np.random.default_rng(0)
    reals = (rng.standard_normal((batch, 1, t_samples)) * 0.1).astype(np.float32)
    meta = [{"prompt": "probe prompt"} for _ in range(batch)]
    b = wrapper.prepare_batch(reals, meta)

    step = jax.jit(lambda s, b_, k, fz: wrapper.train_step(s, b_, k, frozen=fz),
                   donate_argnums=(0,))
    holder = {"s": state}

    def run(b, key):
        holder["s"], metrics = step(holder["s"], b, key, frozen)
        return metrics["loss"]

    t = timeit(functools.partial(run, b), jax.random.PRNGKey(1), n=n)
    frames = t_samples // model.pretransform.downsampling_ratio
    emit(probe="lm_train_step", batch=batch, seconds=seconds,
         frames=int(frames), ms=round(t * 1e3, 1),
         samples_per_s=round(batch / t, 2),
         audio_s_per_s=round(batch * seconds / t, 1))


def probe_lmdecode(n=3, batch=1, seconds=10):
    cfg, model = _build_lm()
    sr = cfg["sample_rate"]
    ratio = model.pretransform.downsampling_ratio  # 640 -> 50 fps
    frames = seconds * sr // ratio
    cond = model.conditioner([{"prompt": "probe prompt"}] * batch)

    def gen(key):
        return model.generate(max_gen_len=int(frames), conditioning_tensors=cond,
                              cfg_scale=3.0, top_k=250, temp=1.0, rng=key)

    t0 = time.time()
    sync(gen(jax.random.PRNGKey(0)).astype(jnp.float32))
    compile_s = time.time() - t0
    times = []
    for i in range(n):
        t0 = time.time()
        sync(gen(jax.random.PRNGKey(1 + i)).astype(jnp.float32))
        times.append(time.time() - t0)
    t = min(times)
    n_q = model.pretransform.num_quantizers
    emit(probe="lm_decode", batch=batch, frames=int(frames), n_q=int(n_q),
         compile_s=round(compile_s, 1), wall_s=round(t, 2),
         frames_per_s=round(frames / t, 1),
         tokens_per_s=round(frames * n_q * batch / t, 1),
         realtime_factor=round(batch * seconds / t, 2))

    # decode_tokens (codec synthesis) separately
    codes = gen(jax.random.PRNGKey(0))

    @jax.jit
    def dec(codes):
        return model.pretransform.decode_tokens(codes)

    td = timeit(lambda: dec(codes), n=n)
    emit(probe="lm_decode_tokens_codec", ms=round(td * 1e3, 1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--section", default="all",
                    choices=["full", "aegan", "lm", "lmdecode", "all"])
    ap.add_argument("-n", type=int, default=3)
    args = ap.parse_args()
    emit(probe="env", device=str(jax.devices()[0]))
    if args.section in ("aegan", "all"):
        probe_aegan(args.n)
    if args.section in ("lm", "all"):
        probe_lm(args.n)
    if args.section in ("lmdecode", "all"):
        probe_lmdecode(args.n)
    if args.section in ("full", "all"):
        probe_full(args.n)


if __name__ == "__main__":
    main()
