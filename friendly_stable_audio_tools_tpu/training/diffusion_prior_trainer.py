"""Mono->stereo diffusion prior training.

Parity target: reference `training/diffusion.py:1215-1423`
(DiffusionPriorTrainingWrapper): build the dual-mono source from the stereo
target batch (:1316-1327), condition on its (pretransform-encoded) latents
via the `source` id, v-objective MSE, EMA, and optional stereo sum/diff +
L/R MRSTFT reconstruction losses on decoded outputs (:1257-1297).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..inference.sampling import get_alphas_sigmas
from .diffusion import DiffusionCondTrainingWrapper, TrainState, draw_timesteps
from .ema import ema_update


class DiffusionPriorTrainingWrapper(DiffusionCondTrainingWrapper):
    def __init__(self, model, lr: float = 1e-4, prior_type: str = "mono_stereo",
                 log_loss_info: bool = False, use_reconstruction_loss: bool = False,
                 optimizer_configs: tp.Optional[dict] = None, use_ema: bool = True, **kw):
        super().__init__(model, lr=lr, use_ema=use_ema, log_loss_info=log_loss_info,
                         optimizer_configs=optimizer_configs, cfg_dropout_prob=0.0, **kw)
        assert prior_type == "mono_stereo", f"Unknown prior type {prior_type}"
        self.prior_type = prior_type
        self.use_reconstruction_loss = use_reconstruction_loss
        if use_reconstruction_loss:
            from .losses.auraloss import MultiResolutionSTFTLoss, SumAndDifferenceSTFTLoss

            fft_sizes = [2048, 1024, 512, 256, 128, 64, 32]
            hops = [512, 256, 128, 64, 32, 16, 8]
            self.sdstft = SumAndDifferenceSTFTLoss(fft_sizes, hops, fft_sizes,
                                                   sample_rate=model.sample_rate,
                                                   perceptual_weighting=True)

    def train_step(self, state: TrainState, batch: dict, rng: jax.Array,
                   frozen: tp.Optional[dict] = None):
        reals = batch["reals"]  # [B, T, 2] stereo target
        k_t, k_noise, k_sample = jax.random.split(rng, 3)
        pt_kwargs = ({"params": frozen["pretransform"]}
                     if frozen and frozen.get("pretransform") is not None else {})

        def loss_fn(params):
            # dual-mono source (reference :1316-1327)
            source = jnp.repeat(reals.mean(axis=-1, keepdims=True), reals.shape[-1], axis=-1)
            diffusion_input = reals
            source_input = source
            if self.diffusion.pretransform is not None and not self.pre_encoded:
                diffusion_input = self.diffusion.pretransform.encode_nwc(reals, **pt_kwargs)
                source_input = self.diffusion.pretransform.encode_nwc(source, **pt_kwargs)

            cond_tensors = {"source": (source_input, jnp.ones(source_input.shape[:2], bool))}
            cond_inputs = self.diffusion.get_conditioning_inputs(cond_tensors)

            t = draw_timesteps(self.timestep_sampler, reals.shape[0], state.qmc_counter, k_t)
            alphas, sigmas = get_alphas_sigmas(t)
            alphas, sigmas = alphas[:, None, None], sigmas[:, None, None]
            noise = jax.random.normal(k_noise, diffusion_input.shape, jnp.float32)
            x32 = diffusion_input.astype(jnp.float32)
            noised = x32 * alphas + noise * sigmas
            targets = noise * alphas - x32 * sigmas

            output = self.diffusion.model_fn(params["model"], noised, t, train=True,
                                             rngs={"sample": k_sample}, **cond_inputs)
            loss = jnp.mean(jnp.square(output - targets))
            aux = {"mse_loss": loss}

            if self.use_reconstruction_loss:
                pred_x0 = noised * alphas - output * sigmas
                if self.diffusion.pretransform is not None:
                    pred_audio = self.diffusion.pretransform.decode_nwc(pred_x0, **pt_kwargs)
                else:
                    pred_audio = pred_x0
                recon = self.sdstft(pred_audio.transpose(0, 2, 1), reals.transpose(0, 2, 1))
                aux["recon_loss"] = recon
                loss = loss + 0.1 * recon
            return loss, aux

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.params)
        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_ema = state.ema_params
        if self.use_ema:
            new_ema = ema_update(state.ema_params, new_params["model"], state.step)
        new_state = TrainState(new_params, new_opt_state, new_ema, state.step + 1,
                               state.qmc_counter + jnp.uint32(reals.shape[0]))
        return new_state, {"loss": loss, **aux}
