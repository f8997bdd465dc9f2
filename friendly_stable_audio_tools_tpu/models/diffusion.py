"""Diffusion model wrappers.

Parity target: reference `models/diffusion.py` — `DiffusionModelWrapper`
(28-52), `ConditionedDiffusionModelWrapper` with conditioning-id mapping
(90-209), backbone adapters (DiT / ADP U-Nets / Dance U-Net, 212-549),
factories (552-655).

Wrappers here are plain Python objects that own a flax module + params and
expose pure apply functions; the conditioning-id mapping concatenates
conditioner outputs per type exactly like the reference (cross-attn over
sequence, global over channels, input-concat over channels, prepend over
sequence). Layout is channels-last [B, T, C] internally.
"""

from __future__ import annotations

import functools

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from .conditioners import MultiConditioner, create_multi_conditioner_from_conditioning_config
from .dit import DiffusionTransformer
from .pretransforms import Pretransform


def scale_params(params, factor: float):
    """The reference down-scales freshly initialized DiT/UNet weights by 0.5
    (models/diffusion.py:486-487 etc.)."""
    return jax.tree_util.tree_map(lambda p: p * factor, params)


@dataclasses.dataclass
class DiffusionModelWrapper:
    """Unconditional diffusion model (reference diffusion.py:28-52)."""

    module: nn.Module
    io_channels: int
    sample_size: int
    sample_rate: int
    min_input_length: int
    params: tp.Optional[dict] = None
    pretransform: tp.Optional[Pretransform] = None
    diffusion_objective: str = "v"

    def init(self, rng: jax.Array, length: int = 128) -> dict:
        x = jnp.zeros((1, length, self.io_channels), jnp.float32)
        t = jnp.zeros((1,), jnp.float32)
        kwargs = {}
        ic = getattr(self.module, "input_concat_dim", 0) or getattr(self.module, "cond_dim", 0)
        if ic:
            kwargs["input_concat_cond" if hasattr(self.module, "input_concat_dim") else "cond"] = (
                jnp.zeros((1, length, ic), jnp.float32)
            )
        self.params = jax.jit(functools.partial(self.module.init, **kwargs))(rng, x, t)["params"]
        self.params = scale_params(self.params, 0.5)
        return self.params

    def forward(self, params, x, t, **kwargs):
        """Pure apply; x [B, T, C]."""
        return self.module.apply({"params": params}, x, t, **kwargs)

    def __call__(self, x, t, **kwargs):
        return self.forward(self.params, x, t, **kwargs)

    def generate(self, *args, **kwargs):
        from ..inference.generation import generate_diffusion_uncond

        return generate_diffusion_uncond(self, *args, **kwargs)


@dataclasses.dataclass
class ConditionedDiffusionModelWrapper:
    """reference diffusion.py:90-209."""

    module: nn.Module
    conditioner: tp.Optional[MultiConditioner]
    io_channels: int
    sample_rate: int
    min_input_length: int
    params: tp.Optional[dict] = None
    diffusion_objective: str = "v"
    pretransform: tp.Optional[Pretransform] = None
    cross_attn_cond_ids: tp.Sequence[str] = ()
    global_cond_ids: tp.Sequence[str] = ()
    input_concat_ids: tp.Sequence[str] = ()
    prepend_cond_ids: tp.Sequence[str] = ()
    # populated by factories for shape math
    cond_token_dim: int = 0
    patch_size: int = 1
    module_kind: str = "dit"  # "dit" | "adp_cfg_1d" | "adp_1d" | "DAU1d"

    def init(self, rng: jax.Array, length: int = 64) -> dict:
        kwargs = self._example_cond_kwargs()
        x = jnp.zeros((1, length, self.io_channels), jnp.float32)
        t = jnp.zeros((1,), jnp.float32)
        self.params = jax.jit(functools.partial(self.module.init, **kwargs))(rng, x, t)["params"]
        self.params = scale_params(self.params, 0.5)
        return self.params

    def _example_cond_kwargs(self):
        """Build zero conditioning of the right shapes for init."""
        kwargs = {}
        if self.module_kind == "adp_cfg_1d":
            kwargs["embedding"] = jnp.zeros((1, 2, self.module.context_embedding_features))
            if self.input_concat_ids and self.module.context_channels:
                kwargs["channels_list"] = [jnp.zeros((1, 4, c)) for c in self.module.context_channels if c > 0]
            if self.global_cond_ids and self.module.context_features:
                kwargs["features"] = jnp.zeros((1, self.module.context_features))
            return kwargs
        if self.module_kind == "adp_1d":
            if self.input_concat_ids and self.module.context_channels:
                kwargs["channels_list"] = [jnp.zeros((1, 4, c)) for c in self.module.context_channels if c > 0]
            if self.global_cond_ids and self.module.context_features:
                kwargs["features"] = jnp.zeros((1, self.module.context_features))
            return kwargs
        if self.module_kind == "DAU1d":
            if self.input_concat_ids and self.module.cond_dim:
                kwargs["cond"] = jnp.zeros((1, 4, self.module.cond_dim))
            return kwargs
        if self.cross_attn_cond_ids and getattr(self.module, "cond_token_dim", 0):
            kwargs["cross_attn_cond"] = jnp.zeros((1, 2, self.module.cond_token_dim))
        if self.global_cond_ids and getattr(self.module, "global_cond_dim", 0):
            kwargs["global_embed"] = jnp.zeros((1, self.module.global_cond_dim))
        if self.input_concat_ids and getattr(self.module, "input_concat_dim", 0):
            kwargs["input_concat_cond"] = jnp.zeros((1, 4, self.module.input_concat_dim))
        if self.prepend_cond_ids and getattr(self.module, "prepend_cond_dim", 0):
            kwargs["prepend_cond"] = jnp.zeros((1, 2, self.module.prepend_cond_dim))
        return kwargs

    def get_conditioning_inputs(self, conditioning_tensors: tp.Dict[str, tp.Any], negative: bool = False):
        """reference diffusion.py:119-203; all inputs channels-last."""
        cross_attention_input = None
        cross_attention_masks = None
        global_cond = None
        input_concat_cond = None
        prepend_cond = None
        prepend_cond_mask = None

        if len(self.cross_attn_cond_ids) > 0:
            ins, masks = [], []
            for key in self.cross_attn_cond_ids:
                cross_attn_in, cross_attn_mask = conditioning_tensors[key]
                if cross_attn_in.ndim == 2:
                    cross_attn_in = cross_attn_in[:, None, :]
                    cross_attn_mask = cross_attn_mask[:, None]
                ins.append(cross_attn_in)
                masks.append(cross_attn_mask)
            cross_attention_input = jnp.concatenate(ins, axis=1)
            cross_attention_masks = jnp.concatenate(masks, axis=1)

        if len(self.global_cond_ids) > 0:
            gs = [conditioning_tensors[key][0] for key in self.global_cond_ids]
            global_cond = jnp.concatenate(gs, axis=-1)
            if global_cond.ndim == 3:
                global_cond = global_cond.squeeze(1)

        if len(self.input_concat_ids) > 0:
            input_concat_cond = jnp.concatenate(
                [conditioning_tensors[key][0] for key in self.input_concat_ids], axis=-1
            )

        if len(self.prepend_cond_ids) > 0:
            ps, pms = [], []
            for key in self.prepend_cond_ids:
                p, pm = conditioning_tensors[key]
                ps.append(p)
                pms.append(pm)
            prepend_cond = jnp.concatenate(ps, axis=1)
            prepend_cond_mask = jnp.concatenate(pms, axis=1)

        if negative:
            return {
                "negative_cross_attn_cond": cross_attention_input,
                "negative_cross_attn_mask": cross_attention_masks,
            }
        return {
            "cross_attn_cond": cross_attention_input,
            "cross_attn_mask": cross_attention_masks,
            "global_cond": global_cond,
            "input_concat_cond": input_concat_cond,
            "prepend_cond": prepend_cond,
            "prepend_cond_mask": prepend_cond_mask,
        }

    def forward(self, params, x, t, cond: tp.Dict[str, tp.Any], **kwargs):
        """x [B, T, C]; cond is a conditioner output dict."""
        return self.model_fn(params, x, t, **self.get_conditioning_inputs(cond), **kwargs)

    def model_fn(self, params, x, t, cross_attn_cond=None, cross_attn_mask=None,
                 global_cond=None, input_concat_cond=None, prepend_cond=None,
                 prepend_cond_mask=None, negative_cross_attn_cond=None,
                 negative_cross_attn_mask=None, batch_cfg: bool = True,
                 rescale_cfg: bool = False, scale_phi: float = 0.0,
                 cfg_scale: float = 1.0, cfg_dropout_prob: float = 0.0,
                 rngs=None, train: bool = False, **kwargs):
        """Backbone adapter (reference wrapper classes, diffusion.py:212-549):
        maps the wrapper kwarg names onto each backbone's kwargs."""
        if self.module_kind == "adp_cfg_1d":
            # reference UNetCFG1DWrapper (diffusion.py:212-266)
            channels_list = [input_concat_cond] if input_concat_cond is not None else None
            return self.module.apply(
                {"params": params}, x, t,
                embedding=cross_attn_cond,
                embedding_mask=cross_attn_mask,
                features=global_cond,
                channels_list=channels_list,
                embedding_scale=cfg_scale,
                embedding_mask_proba=cfg_dropout_prob,
                batch_cfg=batch_cfg,
                rescale_cfg=rescale_cfg,
                negative_embedding=negative_cross_attn_cond,
                negative_embedding_mask=negative_cross_attn_mask,
                train=train,
                rngs=rngs,
                **kwargs,
            )
        if self.module_kind == "adp_1d":
            # reference UNet1DCondWrapper (diffusion.py:268-318)
            channels_list = None
            if input_concat_cond is not None:
                if input_concat_cond.shape[1] != x.shape[1]:
                    idx = (jnp.arange(x.shape[1]) * input_concat_cond.shape[1]) // x.shape[1]
                    input_concat_cond = input_concat_cond[:, idx, :]
                channels_list = [input_concat_cond]
            return self.module.apply(
                {"params": params}, x, t, features=global_cond,
                channels_list=channels_list, rngs=rngs, **kwargs,
            )
        if self.module_kind == "DAU1d":
            # reference DAU1DCondWrapper (diffusion.py:340-374)
            return self.module.apply({"params": params}, x, t, cond=input_concat_cond, rngs=rngs, **kwargs)
        # DiT (reference DiTWrapper, diffusion.py:480-528); batch_cfg=False
        # selects the two-pass low-memory CFG path (it used to be swallowed
        # here, making that path unreachable through the wrapper)
        return self.module.apply(
            {"params": params},
            x,
            t,
            cross_attn_cond=cross_attn_cond,
            cross_attn_cond_mask=cross_attn_mask,
            negative_cross_attn_cond=negative_cross_attn_cond,
            negative_cross_attn_mask=negative_cross_attn_mask,
            input_concat_cond=input_concat_cond,
            global_embed=global_cond,
            prepend_cond=prepend_cond,
            prepend_cond_mask=prepend_cond_mask,
            cfg_scale=cfg_scale,
            cfg_dropout_prob=cfg_dropout_prob,
            scale_phi=scale_phi,
            batch_cfg=batch_cfg,
            train=train,
            rngs=rngs,
            **kwargs,
        )

    def __call__(self, x, t, cond, **kwargs):
        return self.forward(self.params, x, t, cond, **kwargs)

    def generate(self, *args, **kwargs):
        from ..inference.generation import generate_diffusion_cond

        return generate_diffusion_cond(self, *args, **kwargs)


def create_diffusion_uncond_from_config(config: tp.Dict[str, tp.Any]):
    """reference diffusion.py:552-583."""
    from .factory import create_pretransform_from_config

    diffusion_uncond_config = config["model"]
    model_type = diffusion_uncond_config["type"]
    diffusion_config = diffusion_uncond_config.get("config", {})
    pretransform = diffusion_uncond_config.get("pretransform", None)

    sample_size = config["sample_size"]
    sample_rate = config["sample_rate"]
    min_input_length = 1

    if pretransform:
        pretransform = create_pretransform_from_config(pretransform, sample_rate)
        min_input_length = pretransform.downsampling_ratio

    if model_type == "DAU1d":
        from .dance_diffusion import DiffusionAttnUnet1D

        module = DiffusionAttnUnet1D(**diffusion_config)
        io_channels = diffusion_config.get("io_channels", 2)
    elif model_type == "adp_uncond_1d":
        from .adp import UNet1d

        module = UNet1d(**diffusion_config)
        io_channels = diffusion_config.get("in_channels", 2)
    elif model_type == "dit":
        cfg = dict(diffusion_config)
        io_channels = cfg.pop("in_channels")
        module = DiffusionTransformer(io_channels=io_channels, **cfg)
    else:
        raise NotImplementedError(f"Unknown model type: {model_type}")

    return DiffusionModelWrapper(
        module,
        io_channels=io_channels,
        sample_size=sample_size,
        sample_rate=sample_rate,
        pretransform=pretransform,
        min_input_length=min_input_length,
    )


def create_diffusion_cond_from_config(config: tp.Dict[str, tp.Any]):
    """reference diffusion.py:585-655."""
    from .factory import create_pretransform_from_config

    model_config = config["model"]
    model_type = config["model_type"]
    diffusion_config = model_config["diffusion"]
    diffusion_model_type = diffusion_config["type"]
    diffusion_model_config = dict(diffusion_config["config"])

    io_channels = model_config["io_channels"]
    sample_rate = config["sample_rate"]
    diffusion_objective = diffusion_config.get("diffusion_objective", "v")
    conditioning_config = model_config.get("conditioning", None)

    conditioner = None
    if conditioning_config:
        conditioner = create_multi_conditioner_from_conditioning_config(conditioning_config)

    cross_attn_cond_ids = diffusion_config.get("cross_attention_cond_ids", [])
    global_cond_ids = diffusion_config.get("global_cond_ids", [])
    input_concat_ids = diffusion_config.get("input_concat_ids", [])
    prepend_cond_ids = diffusion_config.get("prepend_cond_ids", [])

    pretransform = model_config.get("pretransform", None)
    if pretransform:
        pretransform = create_pretransform_from_config(pretransform, sample_rate)
        min_input_length = pretransform.downsampling_ratio
    else:
        min_input_length = 1

    module_kind = diffusion_model_type
    if diffusion_model_type == "dit":
        module = DiffusionTransformer(**diffusion_model_config)
        min_input_length *= module.patch_size
        patch_size = module.patch_size
    elif diffusion_model_type in ("adp_cfg_1d", "adp_1d"):
        from .adp import UNetCFG1d, UNet1d

        cls = UNetCFG1d if diffusion_model_type == "adp_cfg_1d" else UNet1d
        module = cls(**diffusion_model_config)
        min_input_length *= int(np.prod(diffusion_model_config["factors"]))
        patch_size = 1
    elif diffusion_model_type == "DAU1d":
        from .dance_diffusion import DiffusionAttnUnet1D

        module = DiffusionAttnUnet1D(**diffusion_model_config)
        min_input_length *= int(np.prod(diffusion_model_config.get("strides", [2] * 13)))
        patch_size = 1
    else:
        raise NotImplementedError(f"Unknown model type: {diffusion_model_type}")

    extra_kwargs = {}
    if model_type in ("diffusion_cond", "diffusion_cond_inpaint"):
        wrapper_cls = ConditionedDiffusionModelWrapper
        extra_kwargs["diffusion_objective"] = diffusion_objective
    elif model_type == "diffusion_prior":
        from .diffusion_prior import MonoToStereoDiffusionPrior

        prior_type = model_config["prior_type"]
        assert prior_type == "mono_stereo", f"Unknown prior type: {prior_type}"
        wrapper_cls = MonoToStereoDiffusionPrior
    else:
        raise NotImplementedError(f"Unknown model type: {model_type}")

    return wrapper_cls(
        module,
        conditioner,
        min_input_length=min_input_length,
        sample_rate=sample_rate,
        cross_attn_cond_ids=cross_attn_cond_ids,
        global_cond_ids=global_cond_ids,
        input_concat_ids=input_concat_ids,
        prepend_cond_ids=prepend_cond_ids,
        pretransform=pretransform,
        io_channels=io_channels,
        patch_size=patch_size,
        module_kind=module_kind,
        cond_token_dim=int(diffusion_model_config.get("cond_token_dim", 0) or 0),
        **extra_kwargs,
    )
