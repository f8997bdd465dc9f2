"""Diffusion autoencoder training.

Parity target: reference `training/diffusion.py:946-1107`
(DiffusionAutoencoderTrainingWrapper): encode audio with the trainable
encoder, decode via the diffusion model conditioned on (upsampled) latents
through input-concat, v-objective MSE in the (pretransform-)audio domain,
EMA, optional reconstruction loss.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import optax

from ..inference.sampling import get_alphas_sigmas
from .diffusion import TrainState, draw_timesteps
from .ema import ema_update
from .scheduler import build_optimizer


class DiffusionAutoencoderTrainingWrapper:
    def __init__(self, model, lr: float = 1e-4, use_reconstruction_loss: bool = False,
                 use_ema: bool = True, timestep_sampler: str = "uniform"):
        self.diffae = model
        self.use_ema = use_ema
        self.use_reconstruction_loss = use_reconstruction_loss
        self.timestep_sampler = timestep_sampler
        self.tx = build_optimizer({"optimizer": {"type": "Adam", "config": {"lr": lr}}})

    def init_state(self) -> TrainState:
        params = {"ae": self.diffae.params, "diffusion": self.diffae.diffusion.params}
        return TrainState(
            params=params,
            opt_state=self.tx.init(params),
            ema_params=jax.tree_util.tree_map(jnp.copy, params) if self.use_ema else None,
            step=jnp.zeros((), jnp.int32),
            qmc_counter=jnp.zeros((), jnp.uint32),
        )

    def push_params(self, state: TrainState) -> None:
        self.diffae.params = state.params["ae"]
        self.diffae.diffusion.params = state.params["diffusion"]

    def prepare_batch(self, reals_bct, metadata=None) -> dict:
        import numpy as np

        return {"reals": jnp.asarray(np.asarray(reals_bct).transpose(0, 2, 1))}

    def frozen_arrays(self) -> dict:
        pt = self.diffae.pretransform
        if pt is not None and getattr(pt, "model", None) is not None:
            return {"pretransform": pt.model.params}
        return {}

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array,
                   frozen: tp.Optional[dict] = None):
        reals = batch["reals"]  # [B, T, C]
        k_t, k_noise, k_sample = jax.random.split(rng, 3)
        pt_kwargs = ({"params": frozen["pretransform"]}
                     if frozen and frozen.get("pretransform") is not None else {})

        def loss_fn(params):
            diffusion_input = reals
            if self.diffae.pretransform is not None:
                diffusion_input = self.diffae.pretransform.encode_nwc(reals, **pt_kwargs)

            latents, _ = self.diffae.module.apply(
                {"params": params["ae"]}, reals, return_info=True, method="encode",
                rngs={"sample": k_sample},
            )
            # nearest-upsample latents to the diffusion length (reference :1040-1050)
            up_len = diffusion_input.shape[1]
            if latents.shape[1] != up_len:
                idx = (jnp.arange(up_len) * latents.shape[1]) // up_len
                latents_up = latents[:, idx, :]
            else:
                latents_up = latents

            t = draw_timesteps(self.timestep_sampler, reals.shape[0], state.qmc_counter, k_t)
            alphas, sigmas = get_alphas_sigmas(t)
            alphas, sigmas = alphas[:, None, None], sigmas[:, None, None]
            noise = jax.random.normal(k_noise, diffusion_input.shape, jnp.float32)
            x32 = diffusion_input.astype(jnp.float32)
            noised = x32 * alphas + noise * sigmas
            targets = noise * alphas - x32 * sigmas

            output = self.diffae.diffusion.forward(
                params["diffusion"], noised, t, input_concat_cond=latents_up)
            loss = jnp.mean(jnp.square(output - targets))
            return loss, {"mse_loss": loss, "latent_std": latents.astype(jnp.float32).std()}

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if self.use_ema:
            new_ema = ema_update(state.ema_params, new_params, state.step)
        new_state = TrainState(new_params, new_opt, new_ema, state.step + 1,
                               state.qmc_counter + jnp.uint32(reals.shape[0]))
        return new_state, {"loss": loss, **aux}

    def export_model(self, path: str, state: tp.Optional[TrainState] = None, use_safetensors: bool = True):
        from ..models.utils import save_ckpt_state_dict

        params = state.params if state is not None else {"ae": self.diffae.params,
                                                         "diffusion": self.diffae.diffusion.params}
        if state is not None and self.use_ema and state.ema_params is not None:
            params = state.ema_params
        save_ckpt_state_dict(params, path)
