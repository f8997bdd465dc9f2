"""AE-GAN generator-step decomposition (SA-2.0 VAE, batch 8 x 1.49 s).

The round-5 reference-primary table measured the full alternating steps
(gen 913.1 ms / disc 248.3 ms, scripts/train_probe.py --section aegan) but
not where the generator step's time goes. This probe times each component
fwd+bwd in isolation at the same shapes:

  ae_l1        encode+decode with grads, L1 loss only (the AE itself)
  mrstft       SumAndDifference MRSTFT loss stack, grads w.r.t. decoded
  disc_gen     MS-STFT discriminator adversarial+feature-matching terms,
               grads w.r.t. decoded (as in the gen step)
  gen/disc     the full jitted steps for cross-checking the sum

    python scripts/aegan_decomp.py

Reference workload: training/autoencoders.py:165-261 (gen/disc steps),
losses/auraloss.py (MRSTFT), models/discriminators.py (Encodec MS-STFT).
Random-init weights (zero egress) — throughput is architecture-determined.
"""

from __future__ import annotations

import functools
import json
import os
import sys

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from tpu_probe import emit, timeit  # noqa: E402


def main(n=3, batch=8):
    from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config
    from friendly_stable_audio_tools_tpu.training.factory import (
        create_training_wrapper_from_config,
    )

    cfg_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "friendly_stable_audio_tools_tpu", "configs", "model_configs",
        "autoencoders", "stable_audio_2_0_vae.json")
    with open(cfg_path) as f:
        cfg = json.load(f)
    sample_size = cfg["sample_size"]
    model = create_model_from_config(cfg, init_rng=jax.random.PRNGKey(0))
    wrapper = create_training_wrapper_from_config(cfg, model)
    state = wrapper.init_state(example_length=sample_size)

    rng = np.random.default_rng(0)
    reals = jnp.asarray(rng.standard_normal((batch, sample_size, 2)) * 0.1, jnp.float32)
    audio_s = batch * sample_size / cfg["sample_rate"]
    gp = state.gen_params
    dp = state.disc_params
    mod = wrapper.autoencoder.module

    # -- AE alone: encode+decode fwd+bwd under an L1 loss
    @jax.jit
    def ae_l1(gen_params, reals, key):
        def loss(p):
            lat, _ = mod.apply({"params": p}, reals, return_info=True,
                               method="encode", rngs={"sample": key})
            dec = mod.apply({"params": p}, lat, method="decode")
            return jnp.abs(dec - reals).mean()

        l, g = jax.value_and_grad(loss)(gen_params)
        return l + sum(jnp.sum(x) * 0 for x in jax.tree_util.tree_leaves(g))

    t = timeit(ae_l1, gp, reals, jax.random.PRNGKey(1), n=n)
    emit(probe="aegan_ae_l1_fwd_bwd", ms=round(t * 1e3, 1),
         audio_s_per_s=round(audio_s / t, 1))

    # one fixed decoded tensor for the loss-only probes
    lat0, _ = mod.apply({"params": gp}, reals, return_info=True,
                        method="encode", rngs={"sample": jax.random.PRNGKey(1)})
    decoded0 = mod.apply({"params": gp}, lat0, method="decode")

    # -- MRSTFT stack alone, grads w.r.t. decoded
    @jax.jit
    def mrstft(decoded, reals):
        def loss(d):
            return wrapper.sdstft(reals.transpose(0, 2, 1), d.transpose(0, 2, 1))

        l, g = jax.value_and_grad(loss)(decoded)
        return l + jnp.sum(g) * 0

    t = timeit(mrstft, decoded0, reals, n=n)
    emit(probe="aegan_mrstft_fwd_bwd", ms=round(t * 1e3, 1))

    # -- discriminator (gen side): adv + feature matching, grads w.r.t. decoded
    @jax.jit
    def disc_gen(decoded, reals, disc_params):
        def loss(d):
            _, loss_adv, fm = wrapper._disc_loss_call(disc_params, reals, d)
            return loss_adv + fm

        l, g = jax.value_and_grad(loss)(decoded)
        return l + jnp.sum(g) * 0

    t = timeit(disc_gen, decoded0, reals, dp, n=n)
    emit(probe="aegan_disc_gen_fwd_bwd", ms=round(t * 1e3, 1))

    # -- full steps (cross-check against train_probe rows)
    for which in ("gen", "disc"):
        fn = wrapper._get_step_fn(which, warmed_up=True, freeze_encoder=False)
        step = jax.jit(fn, donate_argnums=())
        holder = {"s": state}

        def run(reals, key):
            s2, metrics = step(holder["s"], reals, key)
            return metrics["loss"]

        t = timeit(functools.partial(run, reals), jax.random.PRNGKey(1), n=n)
        emit(probe=f"aegan_{which}_step", ms=round(t * 1e3, 1),
             audio_s_per_s=round(audio_s / t, 1))


if __name__ == "__main__":
    emit(probe="env", device=str(jax.devices()[0]))
    main()
