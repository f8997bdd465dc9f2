"""Config-driven model factories.

Parity target: reference `models/factory.py:4-142`. The JSON model-config
schema is kept verbatim (it is the public API; HF checkpoints embed it):
top-level `model_type / sample_size / sample_rate / audio_channels / model /
training` with per-component nested configs.
"""

from __future__ import annotations

import json
import typing as tp

import jax


def create_model_from_config(model_config: tp.Dict[str, tp.Any], init_rng: tp.Optional[jax.Array] = None):
    """Dispatch on model_type (reference factory.py:4-23).

    If `init_rng` is given, the returned wrapper has freshly initialized
    params; otherwise call `.init(rng)` or load a checkpoint before use.
    """
    model_type = model_config.get("model_type", None)
    assert model_type is not None, "model_type must be specified in model config"

    if model_type == "autoencoder":
        from .autoencoders import create_autoencoder_from_config

        model = create_autoencoder_from_config(model_config)
    elif model_type == "diffusion_uncond":
        from .diffusion import create_diffusion_uncond_from_config

        model = create_diffusion_uncond_from_config(model_config)
    elif model_type in ("diffusion_cond", "diffusion_cond_inpaint", "diffusion_prior"):
        from .diffusion import create_diffusion_cond_from_config

        model = create_diffusion_cond_from_config(model_config)
    elif model_type == "diffusion_autoencoder":
        from .autoencoders import create_diffAE_from_config

        model = create_diffAE_from_config(model_config)
    elif model_type == "lm":
        from .lm import create_audio_lm_from_config

        model = create_audio_lm_from_config(model_config)
    else:
        raise NotImplementedError(f"Unknown model type: {model_type}")

    if init_rng is not None:
        model.init(init_rng)
        if getattr(model, "conditioner", None) is not None:
            model.conditioner.init(jax.random.fold_in(init_rng, 7))
        pretransform = getattr(model, "pretransform", None)
        if (pretransform is not None and hasattr(pretransform, "model")
                and getattr(pretransform.model, "params", "no-attr") is None):
            # don't clobber params already loaded from a local checkpoint
            # (e.g. PretrainedDACPretransform local_path)
            pretransform.model.init(jax.random.fold_in(init_rng, 11))
    return model


def create_model_from_config_path(model_config_path: str, init_rng: tp.Optional[jax.Array] = None):
    with open(model_config_path) as f:
        model_config = json.load(f)
    return create_model_from_config(model_config, init_rng=init_rng)


def create_pretransform_from_config(pretransform_config: tp.Dict[str, tp.Any], sample_rate: int):
    """reference factory.py:33-81."""
    from .pretransforms import (
        AudiocraftCompressionPretransform,
        AutoencoderPretransform,
        PQMFPretransform,
        PretrainedDACPretransform,
        WaveletPretransform,
    )

    pretransform_type = pretransform_config.get("type", None)
    assert pretransform_type is not None, "type must be specified in pretransform config"

    if pretransform_type == "autoencoder":
        from .autoencoders import create_autoencoder_from_config

        # fake top-level config passes the sample rate through (reference factory.py:40-42)
        autoencoder_config = {"sample_rate": sample_rate, "model": pretransform_config["config"]}
        autoencoder = create_autoencoder_from_config(autoencoder_config)
        scale = pretransform_config.get("scale", 1.0)
        model_half = pretransform_config.get("model_half", False)
        iterate_batch = pretransform_config.get("iterate_batch", False)
        chunked = pretransform_config.get("chunked", False)
        enable_grad = pretransform_config.get("enable_grad", False)
        pretransform = AutoencoderPretransform(
            autoencoder, scale=scale, model_half=model_half,
            iterate_batch=iterate_batch, chunked=chunked, enable_grad=enable_grad,
        )
    elif pretransform_type == "wavelet":
        pretransform = WaveletPretransform(**pretransform_config["config"])
    elif pretransform_type == "pqmf":
        pretransform = PQMFPretransform(**pretransform_config["config"])
    elif pretransform_type == "dac_pretrained":
        pretransform = PretrainedDACPretransform(**pretransform_config["config"])
    elif pretransform_type == "audiocraft_pretrained":
        pretransform = AudiocraftCompressionPretransform(**pretransform_config["config"])
    else:
        raise NotImplementedError(f"Unknown pretransform type: {pretransform_type}")

    pretransform.enable_grad = pretransform_config.get("enable_grad", False)
    return pretransform


def create_bottleneck_from_config(bottleneck_config: tp.Dict[str, tp.Any]):
    """reference factory.py:84-142 — 9 bottleneck types."""
    from . import bottleneck as bn

    bottleneck_type = bottleneck_config.get("type", None)
    assert bottleneck_type is not None, "type must be specified in bottleneck config"
    cfg = bottleneck_config.get("config", {})

    if bottleneck_type == "tanh":
        return bn.TanhBottleneck(**cfg)
    if bottleneck_type == "vae":
        return bn.VAEBottleneck(**cfg)
    if bottleneck_type == "rvq":
        return bn.RVQBottleneck(**cfg)
    if bottleneck_type == "dac_rvq":
        return bn.DACRVQBottleneck(**cfg)
    if bottleneck_type == "rvq_vae":
        return bn.RVQVAEBottleneck(**cfg)
    if bottleneck_type == "dac_rvq_vae":
        return bn.DACRVQVAEBottleneck(**cfg)
    if bottleneck_type == "l2_norm":
        return bn.L2Bottleneck(**cfg)
    if bottleneck_type == "wasserstein":
        return bn.WassersteinBottleneck(**cfg)
    if bottleneck_type == "fsq":
        return bn.FSQBottleneck(**cfg)
    raise NotImplementedError(f"Unknown bottleneck type: {bottleneck_type}")
