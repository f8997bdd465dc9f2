"""Autoencoder (VAE-GAN) training.

Parity target: reference `training/autoencoders.py:24-403` — alternating
generator/discriminator optimization keyed on step parity after
`warmup_steps`, MultiLoss assembly (hinge adversarial + feature matching +
mid/side & left/right MRSTFT + optional L1 + bottleneck losses), latent
masking, force_input_mono, EMA, separate AdamW+InverseLR optimizers, and
EMA-preferring export.

JAX structure: two jitted pure steps (`_gen_step`, `_disc_step`), dispatched
by host-side step parity exactly like the reference's manual optimization
(training/autoencoders.py:231). `warmed_up` is a trace-time flag — the step
function retraces once when warmup ends, keeping the pre-warmup program free
of the discriminator forward entirely.
"""

from __future__ import annotations

import typing as tp

import flax
import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..models.autoencoders import AudioAutoencoder
from ..models.bottleneck import (
    DACRVQBottleneck,
    DACRVQVAEBottleneck,
    RVQBottleneck,
    RVQVAEBottleneck,
    VAEBottleneck,
    WassersteinBottleneck,
)
from .ema import ema_update
from .losses.auraloss import MultiResolutionSTFTLoss, SumAndDifferenceSTFTLoss
from .losses.losses import AuralossLoss, L1Loss, MultiLoss, ValueLoss
from .scheduler import build_optimizer


def create_loss_modules_from_bottleneck(bottleneck, loss_config):
    """reference training/autoencoders.py:378-403."""
    losses = []
    if isinstance(bottleneck, (VAEBottleneck, DACRVQVAEBottleneck, RVQVAEBottleneck)):
        kl_weight = loss_config.get("bottleneck", {}).get("weights", {}).get("kl", 1e-6)
        losses.append(ValueLoss(key="kl", weight=kl_weight, name="kl_loss"))
    if isinstance(bottleneck, (RVQBottleneck, RVQVAEBottleneck)):
        losses.append(ValueLoss(key="quantizer_loss", weight=1.0, name="quantizer_loss"))
    if isinstance(bottleneck, (DACRVQBottleneck, DACRVQVAEBottleneck)):
        losses.append(ValueLoss(key="vq/codebook_loss", weight=1.0, name="codebook_loss"))
        losses.append(ValueLoss(key="vq/commitment_loss", weight=0.25, name="commitment_loss"))
    if isinstance(bottleneck, WassersteinBottleneck):
        mmd_weight = loss_config.get("bottleneck", {}).get("weights", {}).get("mmd", 100)
        losses.append(ValueLoss(key="mmd", weight=mmd_weight, name="mmd_loss"))
    return losses


@flax.struct.dataclass
class GANTrainState:
    gen_params: tp.Any
    disc_params: tp.Any
    gen_opt_state: tp.Any
    disc_opt_state: tp.Any
    ema_params: tp.Any
    step: jnp.ndarray


class AutoencoderTrainingWrapper:
    def __init__(
        self,
        autoencoder: AudioAutoencoder,
        loss_config: dict,
        optimizer_configs: tp.Optional[dict] = None,
        lr: float = 1e-4,
        warmup_steps: int = 0,
        encoder_freeze_on_warmup: bool = False,
        sample_rate: int = 48000,
        use_ema: bool = True,
        force_input_mono: bool = False,
        latent_mask_ratio: float = 0.0,
        teacher_model: tp.Optional[AudioAutoencoder] = None,
        logging_config: tp.Optional[dict] = None,
    ):
        self.autoencoder = autoencoder
        self.teacher_model = teacher_model
        self.warmup_steps = warmup_steps
        self.encoder_freeze_on_warmup = encoder_freeze_on_warmup
        self.force_input_mono = force_input_mono
        self.latent_mask_ratio = latent_mask_ratio
        self.use_ema = use_ema
        self.loss_config = loss_config
        if optimizer_configs is None:
            # reference seeds AdamW defaults from lr when no optimizer config
            # is given (training/autoencoders.py:62-81)
            optimizer_configs = {
                side: {"optimizer": {"type": "AdamW", "config": {"lr": lr, "betas": [0.8, 0.99]}}}
                for side in ("autoencoder", "discriminator")
            }
        self.optimizer_configs = optimizer_configs
        self.log_every = (logging_config or {}).get("log_every", 1)
        self.sample_rate = sample_rate

        stft_loss_args = loss_config["spectral"]["config"]
        out_ch = autoencoder.out_channels
        if out_ch == 2:
            self.sdstft = SumAndDifferenceSTFTLoss(sample_rate=sample_rate, **stft_loss_args)
            self.lrstft = MultiResolutionSTFTLoss(sample_rate=sample_rate, **stft_loss_args)
        else:
            self.sdstft = MultiResolutionSTFTLoss(sample_rate=sample_rate, **stft_loss_args)

        # discriminator module
        from ..models.discriminators import DACGANLoss, EncodecDiscriminator, OobleckDiscriminator

        disc_cfg = loss_config["discriminator"]
        if disc_cfg["type"] == "oobleck":
            self.discriminator = OobleckDiscriminator(**disc_cfg.get("config", {}))
        elif disc_cfg["type"] == "encodec":
            self.discriminator = EncodecDiscriminator(in_channels=out_ch, **disc_cfg.get("config", {}))
        elif disc_cfg["type"] == "dac":
            self.discriminator = DACGANLoss(channels=out_ch, sample_rate=sample_rate, **disc_cfg.get("config", {}))
        else:
            raise ValueError(f"Unknown discriminator type {disc_cfg['type']}")
        self.disc_type = disc_cfg["type"]

        # generator losses (reference :84-133)
        gen_losses = [
            ValueLoss(key="loss_adv", weight=disc_cfg["weights"]["adversarial"], name="loss_adv"),
            ValueLoss(key="feature_matching_distance", weight=disc_cfg["weights"]["feature_matching"], name="feature_matching"),
        ]
        mrstft_weight = loss_config["spectral"]["weights"]["mrstft"]
        if teacher_model is not None:
            w = mrstft_weight * 0.25
            gen_losses += [
                AuralossLoss(self.sdstft, "reals", "decoded", name="mrstft_loss", weight=w),
                AuralossLoss(self.sdstft, "decoded", "teacher_decoded", name="mrstft_loss_distill", weight=w),
                AuralossLoss(self.sdstft, "reals", "own_latents_teacher_decoded", name="mrstft_loss_own_latents_teacher", weight=w),
                AuralossLoss(self.sdstft, "reals", "teacher_latents_own_decoded", name="mrstft_loss_teacher_latents_own", weight=w),
            ]
        else:
            gen_losses.append(AuralossLoss(self.sdstft, "reals", "decoded", name="mrstft_loss", weight=mrstft_weight))
            if out_ch == 2:
                gen_losses += [
                    AuralossLoss(self.lrstft, "reals_left", "decoded_left", name="stft_loss_left", weight=mrstft_weight / 2),
                    AuralossLoss(self.lrstft, "reals_right", "decoded_right", name="stft_loss_right", weight=mrstft_weight / 2),
                ]
            # the reference adds the mid/side term twice (autoencoders.py:108,122)
            gen_losses.append(AuralossLoss(self.sdstft, "reals", "decoded", name="mrstft_loss", weight=mrstft_weight))

        if loss_config.get("time", {}).get("weights", {}).get("l1", 0.0) > 0.0:
            gen_losses.append(L1Loss(key_a="reals", key_b="decoded", weight=loss_config["time"]["weights"]["l1"], name="l1_time_loss"))

        if autoencoder.module.bottleneck is not None:
            gen_losses += create_loss_modules_from_bottleneck(autoencoder.module.bottleneck, loss_config)

        self.losses_gen = MultiLoss(gen_losses)
        self.losses_disc = MultiLoss([ValueLoss(key="loss_dis", weight=1.0, name="discriminator_loss")])

        self.gen_tx = build_optimizer(optimizer_configs["autoencoder"])
        self.disc_tx = build_optimizer(optimizer_configs["discriminator"])

        self._jit_cache = {}

    # ---- state ----------------------------------------------------------

    def init_state(self, rng: tp.Optional[jax.Array] = None, example_length: int = 8192) -> GANTrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        assert self.autoencoder.params is not None, "init the autoencoder first"
        # copy: the returned state is donated by the jitted steps; the
        # wrapper's own params must stay valid
        gen_params = jax.tree_util.tree_map(jnp.copy, self.autoencoder.params)
        example = jnp.zeros((1, example_length, self.autoencoder.out_channels), jnp.float32)
        disc_params = self.discriminator.init(rng, example, example, method="loss")["params"]
        return GANTrainState(
            gen_params=gen_params,
            disc_params=disc_params,
            gen_opt_state=self.gen_tx.init(gen_params),
            disc_opt_state=self.disc_tx.init(disc_params),
            ema_params=jax.tree_util.tree_map(jnp.copy, gen_params) if self.use_ema else None,
            step=jnp.zeros((), jnp.int32),
        )

    def push_params(self, state: GANTrainState) -> None:
        self.autoencoder.params = state.gen_params

    def _ema_updates(self, step):
        """ema-pytorch counts its own update() calls — generator steps only.
        During warmup every step is a gen step; after warmup gen/disc
        alternate, so gen updates = warmup + ceil((step - warmup) / 2)."""
        w = self.warmup_steps
        return jnp.where(step <= w, step, w + (step - w + 1) // 2)

    # ---- losses ---------------------------------------------------------

    def _disc_loss_call(self, disc_params, reals, decoded):
        """Returns (loss_dis, loss_adv, feature_matching_distance)."""
        if self.disc_type == "dac":
            # DACGANLoss.loss(fake, real)
            return self.discriminator.apply({"params": disc_params}, decoded, reals, method="loss")
        return self.discriminator.apply({"params": disc_params}, reals, decoded, method="loss")

    def _forward_info(self, gen_params, reals, rng, warmed_up: bool, freeze_encoder: bool):
        """Shared AE forward producing the loss_info dict (channels-last)."""
        k_sample, k_mask = jax.random.split(rng)
        encoder_input = reals.mean(axis=-1, keepdims=True) if self.force_input_mono else reals

        latents, info = self.autoencoder.module.apply(
            {"params": gen_params}, encoder_input, return_info=True,
            method="encode", rngs={"sample": k_sample},
        )
        if freeze_encoder:
            latents = jax.lax.stop_gradient(latents)
            info = jax.tree_util.tree_map(jax.lax.stop_gradient, info)

        loss_info = {"reals_nwc": reals, "encoder_input": encoder_input}
        loss_info.update(info)

        if self.latent_mask_ratio > 0.0:
            mask = jax.random.uniform(k_mask, latents.shape) < self.latent_mask_ratio
            latents = jnp.where(mask, 0.0, latents)
        # reference logs latents.std() AFTER masking (:265)
        loss_info["latents"] = latents

        decoded = self.autoencoder.module.apply({"params": gen_params}, latents, method="decode")
        loss_info["decoded_nwc"] = decoded

        # spectral losses operate on [B, C, T]
        reals_bct = reals.transpose(0, 2, 1)
        decoded_bct = decoded.transpose(0, 2, 1)
        loss_info["reals"] = reals_bct
        loss_info["decoded"] = decoded_bct
        if self.autoencoder.out_channels == 2:
            loss_info["decoded_left"] = decoded_bct[:, 0:1, :]
            loss_info["decoded_right"] = decoded_bct[:, 1:2, :]
            loss_info["reals_left"] = reals_bct[:, 0:1, :]
            loss_info["reals_right"] = reals_bct[:, 1:2, :]

        if self.teacher_model is not None:
            # the reference computes ALL distillation decodes under
            # torch.no_grad() (training/autoencoders.py:207-212): the
            # cross-decode loss terms are metrics-only and must not leak
            # gradients through either decoder
            t_latents = self.teacher_model.module.apply(
                {"params": self.teacher_model.params}, encoder_input, method="encode")
            t_latents = jax.lax.stop_gradient(t_latents)
            t_decoded = self.teacher_model.module.apply(
                {"params": self.teacher_model.params}, t_latents, method="decode")
            own_teacher = self.teacher_model.module.apply(
                {"params": self.teacher_model.params}, jax.lax.stop_gradient(latents), method="decode")
            teacher_own = self.autoencoder.module.apply(
                {"params": jax.lax.stop_gradient(gen_params)}, t_latents, method="decode")
            loss_info["teacher_latents"] = t_latents
            loss_info["teacher_decoded"] = jax.lax.stop_gradient(t_decoded).transpose(0, 2, 1)
            loss_info["own_latents_teacher_decoded"] = jax.lax.stop_gradient(own_teacher).transpose(0, 2, 1)
            loss_info["teacher_latents_own_decoded"] = jax.lax.stop_gradient(teacher_own).transpose(0, 2, 1)

        return loss_info, decoded

    # ---- jitted steps ---------------------------------------------------

    def _get_step_fn(self, which: str, warmed_up: bool, freeze_encoder: bool):
        key = (which, warmed_up, freeze_encoder)
        if key in self._jit_cache:
            return self._jit_cache[key]

        if which == "gen":

            def step(state: GANTrainState, reals, rng):
                def loss_fn(gen_params):
                    loss_info, decoded = self._forward_info(gen_params, reals, rng, warmed_up, freeze_encoder)
                    if warmed_up:
                        loss_dis, loss_adv, fm = self._disc_loss_call(
                            jax.lax.stop_gradient(state.disc_params), loss_info["reals_nwc"], decoded)
                    else:
                        loss_dis = loss_adv = fm = jnp.asarray(0.0, jnp.float32)
                    loss_info["loss_dis"] = loss_dis
                    loss_info["loss_adv"] = loss_adv
                    loss_info["feature_matching_distance"] = fm
                    loss, losses = self.losses_gen(loss_info)
                    aux = dict(losses)
                    aux["latent_std"] = loss_info["latents"].astype(jnp.float32).std()
                    aux["data_std"] = loss_info["encoder_input"].astype(jnp.float32).std()
                    return loss, aux

                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.gen_params)
                updates, new_opt = self.gen_tx.update(grads, state.gen_opt_state, state.gen_params)
                if freeze_encoder:
                    # stop_gradient zeroes the GRADS, but AdamW's decoupled
                    # weight decay still shrinks "frozen" weights through the
                    # update; torch skips .grad=None params entirely — zero
                    # the encoder's updates to match
                    updates = {k: (jax.tree_util.tree_map(jnp.zeros_like, v) if k == "encoder" else v)
                               for k, v in updates.items()}
                new_gen = optax.apply_updates(state.gen_params, updates)
                new_ema = state.ema_params
                if self.use_ema:
                    new_ema = ema_update(state.ema_params, new_gen, self._ema_updates(state.step))
                new_state = state.replace(
                    gen_params=new_gen, gen_opt_state=new_opt, ema_params=new_ema, step=state.step + 1)
                return new_state, {"loss": loss, **aux}

        else:

            def step(state: GANTrainState, reals, rng):
                def loss_fn(disc_params):
                    loss_info, decoded = self._forward_info(
                        jax.lax.stop_gradient(state.gen_params), reals, rng, warmed_up, freeze_encoder)
                    decoded = jax.lax.stop_gradient(decoded)
                    loss_dis, _, _ = self._disc_loss_call(disc_params, reals, decoded)
                    loss, losses = self.losses_disc({"loss_dis": loss_dis})
                    return loss, losses

                (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(state.disc_params)
                updates, new_opt = self.disc_tx.update(grads, state.disc_opt_state, state.disc_params)
                new_disc = optax.apply_updates(state.disc_params, updates)
                new_state = state.replace(disc_params=new_disc, disc_opt_state=new_opt, step=state.step + 1)
                return new_state, {"loss": loss, **aux}

        fn = jax.jit(step, donate_argnums=(0,))
        self._jit_cache[key] = fn
        return fn

    def train_step(self, state: GANTrainState, batch: dict, rng: jax.Array, step: tp.Optional[int] = None):
        """Host-dispatched alternating step (reference :231): odd steps train
        the discriminator once warmed up."""
        step_i = int(step if step is not None else jax.device_get(state.step))
        warmed_up = step_i >= self.warmup_steps
        training_disc = bool(step_i % 2) and warmed_up
        freeze_encoder = warmed_up and self.encoder_freeze_on_warmup
        fn = self._get_step_fn("disc" if training_disc else "gen", warmed_up, freeze_encoder)
        return fn(state, batch["reals"], rng)

    def prepare_batch(self, reals_bct, metadata=None) -> dict:
        return {"reals": jnp.asarray(np.asarray(reals_bct).transpose(0, 2, 1))}

    def export_model(self, path: str, state: tp.Optional[GANTrainState] = None, use_safetensors: bool = True):
        """EMA-preferring export of the autoencoder only (reference :280-286).
        use_safetensors=False writes a torch-loadable pickle like the
        reference (torch.save({'state_dict': flat}))."""
        from ..models.utils import save_ckpt_state_dict

        if state is not None:
            params = state.ema_params if (self.use_ema and state.ema_params is not None) else state.gen_params
        else:
            params = self.autoencoder.params
        if not use_safetensors:
            import torch

            from ..utils.common import _flatten_dict

            flat = {k: torch.from_numpy(np.ascontiguousarray(np.asarray(v)))
                    for k, v in _flatten_dict(params).items()}
            torch.save({"state_dict": flat}, path)
            return
        save_ckpt_state_dict(params, path)
