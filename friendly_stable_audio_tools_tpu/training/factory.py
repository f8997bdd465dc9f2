"""Training-wrapper and demo-callback factories.

Parity target: reference `training/factory.py:6-248`. In JAX there is no
"EMA copy model" construction — EMA lives as a parameter pytree inside the
TrainState — so `use_ema` flags map directly onto the wrappers.
"""

from __future__ import annotations

import typing as tp


def create_training_wrapper_from_config(model_config: dict, model):
    model_type = model_config["model_type"]
    training_config = model_config["training"]

    if model_type == "autoencoder":
        from .autoencoders import AutoencoderTrainingWrapper

        teacher_model = training_config.get("teacher_model", None)
        if teacher_model:
            from ..models.factory import create_model_from_config

            teacher = create_model_from_config(teacher_model)
            teacher_ckpt = training_config.get("teacher_model_ckpt", None)
            if teacher_ckpt is None:
                raise ValueError("teacher_model_ckpt must be specified if teacher_model is specified")
            import jax as _jax

            from ..models.utils import load_ckpt_state_dict
            from ..utils.common import copy_state_dict

            teacher.init(_jax.random.PRNGKey(0))
            teacher.params = copy_state_dict(teacher.params, load_ckpt_state_dict(teacher_ckpt))
            teacher_model = teacher

        lr = training_config["learning_rate"]
        # older shipped configs omit optimizer_configs (lr-only); default to
        # the reference's AdamW recipe per side
        optimizer_configs = training_config.get("optimizer_configs") or {
            "autoencoder": {"optimizer": {"type": "AdamW", "config": {"lr": lr, "betas": [0.8, 0.99]}}},
            "discriminator": {"optimizer": {"type": "AdamW", "config": {"lr": lr, "betas": [0.8, 0.99]}}},
        }
        return AutoencoderTrainingWrapper(
            model,
            lr=lr,
            warmup_steps=training_config.get("warmup_steps", 0),
            encoder_freeze_on_warmup=training_config.get("encoder_freeze_on_warmup", False),
            sample_rate=model_config["sample_rate"],
            loss_config=training_config["loss_configs"],
            optimizer_configs=optimizer_configs,
            use_ema=training_config.get("use_ema", False),
            force_input_mono=training_config.get("force_input_mono", False),
            latent_mask_ratio=training_config.get("latent_mask_ratio", 0.0),
            teacher_model=teacher_model,
            logging_config=training_config.get("logging", {}),
        )
    if model_type == "diffusion_uncond":
        from .diffusion import DiffusionUncondTrainingWrapper

        return DiffusionUncondTrainingWrapper(
            model,
            lr=training_config["learning_rate"],
            pre_encoded=training_config.get("pre_encoded", False),
            logging_config=training_config.get("logging", {}),
        )
    if model_type == "diffusion_cond":
        from .diffusion import DiffusionCondTrainingWrapper

        return DiffusionCondTrainingWrapper(
            model,
            lr=training_config.get("learning_rate", None),
            mask_padding=training_config.get("mask_padding", False),
            mask_padding_dropout=training_config.get("mask_padding_dropout", 0.0),
            use_ema=training_config.get("use_ema", True),
            log_loss_info=training_config.get("log_loss_info", False),
            optimizer_configs=training_config.get("optimizer_configs", None),
            pre_encoded=training_config.get("pre_encoded", False),
            cfg_dropout_prob=training_config.get("cfg_dropout_prob", 0.1),
            timestep_sampler=training_config.get("timestep_sampler", "uniform"),
            logging_config=training_config.get("logging", {}),
        )
    if model_type == "diffusion_cond_inpaint":
        from .diffusion import DiffusionCondInpaintTrainingWrapper

        return DiffusionCondInpaintTrainingWrapper(
            model,
            lr=training_config.get("learning_rate", None),
            max_mask_segments=training_config.get("max_mask_segments", 10),
            log_loss_info=training_config.get("log_loss_info", False),
            optimizer_configs=training_config.get("optimizer_configs", None),
            use_ema=training_config.get("use_ema", True),
            pre_encoded=training_config.get("pre_encoded", False),
            cfg_dropout_prob=training_config.get("cfg_dropout_prob", 0.1),
            timestep_sampler=training_config.get("timestep_sampler", "uniform"),
        )
    if model_type == "diffusion_prior":
        from .diffusion_prior_trainer import DiffusionPriorTrainingWrapper

        return DiffusionPriorTrainingWrapper(
            model,
            lr=training_config["learning_rate"],
            prior_type=training_config.get("prior_type", "mono_stereo"),
            log_loss_info=training_config.get("log_loss_info", False),
            use_reconstruction_loss=training_config.get("use_reconstruction_loss", False),
        )
    if model_type == "diffusion_autoencoder":
        from .diffusion_autoencoder_trainer import DiffusionAutoencoderTrainingWrapper

        return DiffusionAutoencoderTrainingWrapper(
            model,
            lr=training_config["learning_rate"],
            use_reconstruction_loss=training_config.get("use_reconstruction_loss", False),
        )
    if model_type == "lm":
        from .lm import AudioLanguageModelTrainingWrapper

        return AudioLanguageModelTrainingWrapper(
            model,
            lr=training_config.get("learning_rate", None),
            use_ema=training_config.get("use_ema", False),
            optimizer_configs=training_config.get("optimizer_configs", None),
            pre_encoded=training_config.get("pre_encoded", False),
        )
    raise NotImplementedError(f"Unknown model type: {model_type}")


def create_demo_callback_from_config(model_config: dict, **kwargs):
    """reference training/factory.py:160-240."""
    model_type = model_config["model_type"]
    training_config = model_config.get("training", {})
    demo_config = training_config.get("demo", {})

    if model_type == "autoencoder":
        from .demos import AutoencoderDemoCallback

        return AutoencoderDemoCallback(
            demo_every=demo_config.get("demo_every", 2000),
            max_num_sample=demo_config.get("max_num_sample", 4),
            sample_size=model_config["sample_size"],
            sample_rate=model_config["sample_rate"],
            **kwargs,
        )
    if model_type == "diffusion_uncond":
        from .demos import DiffusionDemoCallback

        return DiffusionDemoCallback(
            demo_every=demo_config.get("demo_every", 2000),
            demo_steps=demo_config.get("demo_steps", 250),
            sample_rate=model_config["sample_rate"],
            sample_size=model_config["sample_size"],
            **kwargs,
        )
    if model_type in ("diffusion_cond", "diffusion_cond_inpaint", "diffusion_prior"):
        from .demos import DiffusionCondDemoCallback

        return DiffusionCondDemoCallback(
            demo_every=demo_config.get("demo_every", 2000),
            sample_size=model_config["sample_size"],
            sample_rate=model_config["sample_rate"],
            demo_steps=demo_config.get("demo_steps", 250),
            num_demos=demo_config.get("num_demos", 8),
            demo_cfg_scales=demo_config.get("demo_cfg_scales", [3, 5, 7]),
            demo_conditioning=demo_config.get("demo_cond", [{}]),
            display_audio_cond=demo_config.get("display_audio_cond", False),
            **kwargs,
        )
    if model_type == "diffusion_autoencoder":
        from .demos import DiffusionAutoencoderDemoCallback

        return DiffusionAutoencoderDemoCallback(
            demo_every=demo_config.get("demo_every", 2000),
            max_num_sample=demo_config.get("max_num_sample", 4),
            demo_steps=demo_config.get("demo_steps", 100),
            sample_size=model_config["sample_size"],
            sample_rate=model_config["sample_rate"],
            **kwargs,
        )
    if model_type == "lm":
        from .demos import AudioLanguageModelDemoCallback

        return AudioLanguageModelDemoCallback(
            demo_every=demo_config.get("demo_every", 2000),
            sample_size=model_config["sample_size"],
            sample_rate=model_config["sample_rate"],
            demo_conditioning=demo_config.get("demo_cond", None),
            num_demos=demo_config.get("num_demos", 8),
            **kwargs,
        )
    raise NotImplementedError(f"Unknown model type: {model_type}")


def create_tqdm_callback_from_config(model_config: dict, **kwargs):
    """reference training/factory.py:243-248 — progress-refresh config."""
    tqdm_config = model_config.get("training", {}).get("tqdm", {})
    return {"refresh_rate": tqdm_config.get("refresh_rate", 50)}
