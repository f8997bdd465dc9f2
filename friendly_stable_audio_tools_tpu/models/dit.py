"""Diffusion Transformer (DiT) denoiser.

Parity target: reference `models/dit.py:14-365` — Fourier timestep features ->
MLP embed, cond/global/prepend projection MLPs, ContinuousTransformer
backbone, `global_cond_type in {prepend, adaLN}`, zero-init pre/post 1x1 conv
residuals, patching, CFG dropout (training) and CFG batch-doubling +
rescale (inference), negative conditioning.

Layout: x is channels-last [B, T, io_channels] (reference uses [B, C, T]).
CFG batch-doubling stays inside this module so the whole denoise step jits
into the sampler's `lax.scan` as a single fused program.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convs import Conv1d
from ..ops.embeddings import FourierFeatures
from .transformer import ContinuousTransformer


class _MLPEmbed(nn.Module):
    dim_in: int
    dim_out: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out, use_bias=self.use_bias, param_dtype=jnp.float32, name="0")(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.dim_out, use_bias=self.use_bias, param_dtype=jnp.float32, name="2")(x)
        return x


class DiffusionTransformer(nn.Module):
    io_channels: int = 32
    patch_size: int = 1
    embed_dim: int = 768
    cond_token_dim: int = 0
    project_cond_tokens: bool = True
    global_cond_dim: int = 0
    project_global_cond: bool = True
    input_concat_dim: int = 0
    prepend_cond_dim: int = 0
    depth: int = 12
    num_heads: int = 8
    transformer_type: str = "continuous_transformer"  # "x-transformers" maps here too
    global_cond_type: str = "prepend"
    grad_checkpointing: bool = False
    # extra ContinuousTransformer kwargs commonly present in configs
    qk_norm: bool = False
    conformer: bool = False
    use_sinusoidal_emb: bool = False
    use_abs_pos_emb: bool = False
    abs_pos_emb_max_length: int = 10000
    ff_mult: int = 4
    seq_shard_axis: tp.Optional[str] = None  # sequence-parallel axis (parallel/sp.py)

    def setup(self):
        dim_in = self.io_channels + self.input_concat_dim
        self.timestep_features = FourierFeatures(1, 256, name="timestep_features")
        self.to_timestep_embed = _MLPEmbed(256, self.embed_dim, use_bias=True)

        self.cond_embed_dim = (
            (self.cond_token_dim if not self.project_cond_tokens else self.embed_dim)
            if self.cond_token_dim > 0
            else 0
        )
        if self.cond_token_dim > 0:
            self.to_cond_embed = _MLPEmbed(self.cond_token_dim, self.cond_embed_dim)
        if self.global_cond_dim > 0:
            global_embed_dim = self.global_cond_dim if not self.project_global_cond else self.embed_dim
            self.to_global_embed = _MLPEmbed(self.global_cond_dim, global_embed_dim)
        if self.prepend_cond_dim > 0:
            self.to_prepend_embed = _MLPEmbed(self.prepend_cond_dim, self.embed_dim)

        if self.transformer_type not in ("continuous_transformer", "x-transformers"):
            raise ValueError(f"Unknown transformer type: {self.transformer_type}")
        # The x-transformers Encoder path is functionally the same architecture
        # (rotary + SwiGLU + zero-init branches); both map to the native
        # ContinuousTransformer on TPU.
        self.transformer = ContinuousTransformer(
            dim=self.embed_dim,
            depth=self.depth,
            dim_heads=self.embed_dim // self.num_heads,
            dim_in=dim_in * self.patch_size,
            dim_out=self.io_channels * self.patch_size,
            cross_attend=self.cond_token_dim > 0,
            cond_token_dim=self.cond_embed_dim,
            global_cond_dim=self.embed_dim if self.global_cond_type == "adaLN" else None,
            qk_norm=self.qk_norm,
            conformer=self.conformer,
            use_sinusoidal_emb=self.use_sinusoidal_emb,
            use_abs_pos_emb=self.use_abs_pos_emb,
            abs_pos_emb_max_length=self.abs_pos_emb_max_length,
            ff_mult=self.ff_mult,
            grad_checkpointing=self.grad_checkpointing,
            seq_shard_axis=self.seq_shard_axis,
        )

        # zero-init: the residual 1x1 convs start as exact identity
        # (reference dit.py:130-133 nn.init.zeros_)
        zeros = lambda key, shape, dtype: jnp.zeros(shape, dtype)
        self.preprocess_conv = Conv1d(dim_in, dim_in, 1, use_bias=False,
                                      kernel_init=zeros, name="preprocess_conv")
        self.postprocess_conv = Conv1d(self.io_channels, self.io_channels, 1, use_bias=False,
                                       kernel_init=zeros, name="postprocess_conv")

    def _forward(
        self,
        x,
        t,
        mask=None,
        cross_attn_cond=None,
        cross_attn_cond_mask=None,
        input_concat_cond=None,
        global_embed=None,
        prepend_cond=None,
        prepend_cond_mask=None,
        return_info: bool = False,
        cross_half_batch: bool = False,
        train: bool = False,
    ):
        # x: [B, T, C]; t: [B]
        if cross_attn_cond is not None:
            cross_attn_cond = self.to_cond_embed(cross_attn_cond)
        if global_embed is not None:
            global_embed = self.to_global_embed(global_embed)

        prepend_inputs = None
        prepend_mask = None
        prepend_length = 0
        if prepend_cond is not None:
            prepend_inputs = self.to_prepend_embed(prepend_cond)
            prepend_mask = prepend_cond_mask

        if input_concat_cond is not None:
            if input_concat_cond.shape[1] != x.shape[1]:
                # nearest-neighbor time interpolation (reference dit.py:168-173)
                idx = (jnp.arange(x.shape[1]) * input_concat_cond.shape[1]) // x.shape[1]
                input_concat_cond = input_concat_cond[:, idx, :]
            x = jnp.concatenate([x, input_concat_cond.astype(x.dtype)], axis=-1)

        timestep_embed = self.to_timestep_embed(self.timestep_features(t[:, None]))  # [B, embed]
        global_embed = timestep_embed if global_embed is None else global_embed + timestep_embed

        if self.global_cond_type == "prepend":
            b = x.shape[0]
            if prepend_inputs is None:
                prepend_inputs = global_embed[:, None, :]
                # no mask fabricated: an all-True mask would force the masked
                # (O(T^2)-materializing) attention path for nothing
            else:
                prepend_inputs = jnp.concatenate([prepend_inputs, global_embed[:, None, :]], axis=1)
                if prepend_mask is not None:
                    prepend_mask = jnp.concatenate([prepend_mask, jnp.ones((b, 1), bool)], axis=1)
        # trim length computed from whatever is actually prepended — with
        # global_cond_type='adaLN' and prepend_cond set, the reference leaves
        # prepended tokens IN the output (shape mismatch downstream); fixed
        prepend_length = prepend_inputs.shape[1] if prepend_inputs is not None else 0

        x = self.preprocess_conv(x) + x

        extra = {}
        if self.global_cond_type == "adaLN":
            extra["global_cond"] = global_embed

        if self.patch_size > 1:
            b, tp_, c = x.shape
            p = self.patch_size
            x = x.reshape(b, tp_ // p, p, c).transpose(0, 1, 3, 2).reshape(b, tp_ // p, c * p)
            if mask is not None:
                # a patch token is valid if ANY of its samples is valid (the
                # reference passes the sample-rate mask through and crashes)
                mask = mask.reshape(b, tp_ // p, p).any(axis=-1)

        output = self.transformer(
            x,
            prepend_embeds=prepend_inputs,
            prepend_mask=prepend_mask,
            context=cross_attn_cond,
            context_mask=cross_attn_cond_mask,
            mask=mask,
            return_info=return_info,
            cross_half_batch=cross_half_batch,
            train=train,
            **extra,
        )
        info = None
        if return_info:
            output, info = output

        output = output[:, prepend_length:, :]

        if self.patch_size > 1:
            b, tt, cp = output.shape
            p = self.patch_size
            output = output.reshape(b, tt, cp // p, p).transpose(0, 1, 3, 2).reshape(b, tt * p, cp // p)

        output = self.postprocess_conv(output) + output
        return (output, info) if return_info else output

    def __call__(
        self,
        x,
        t,
        cross_attn_cond=None,
        cross_attn_cond_mask=None,
        negative_cross_attn_cond=None,
        negative_cross_attn_mask=None,
        input_concat_cond=None,
        global_embed=None,
        prepend_cond=None,
        prepend_cond_mask=None,
        cfg_scale: float = 1.0,
        cfg_dropout_prob: float = 0.0,
        causal: bool = False,
        scale_phi: float = 0.0,
        mask=None,
        return_info: bool = False,
        train: bool = False,
        batch_cfg: bool = True,
    ):
        """`cfg_scale`, `cfg_dropout_prob`, `scale_phi` are static (trace-time)
        floats: batch-doubling changes shapes, so CFG participation must be
        known at compile time (reference dit.py:258-339)."""
        assert not causal, "Causal mode is not supported for DiffusionTransformer"

        if cross_attn_cond_mask is not None:
            # parity: reference disables cross-attn masks (dit.py:250-252)
            cross_attn_cond_mask = None

        if train and cfg_dropout_prob > 0.0:
            # null-embedding swap per batch element (reference dit.py:258-268)
            if cross_attn_cond is not None:
                key = self.make_rng("cfg")
                drop = jax.random.bernoulli(key, cfg_dropout_prob, (cross_attn_cond.shape[0], 1, 1))
                cross_attn_cond = jnp.where(drop, jnp.zeros_like(cross_attn_cond), cross_attn_cond)
            if prepend_cond is not None:
                key = self.make_rng("cfg")
                drop = jax.random.bernoulli(key, cfg_dropout_prob, (prepend_cond.shape[0], 1, 1))
                prepend_cond = jnp.where(drop, jnp.zeros_like(prepend_cond), prepend_cond)

        use_cfg = cfg_scale != 1.0 and (cross_attn_cond is not None or prepend_cond is not None)
        if not use_cfg:
            return self._forward(
                x, t, mask=mask,
                cross_attn_cond=cross_attn_cond, cross_attn_cond_mask=cross_attn_cond_mask,
                input_concat_cond=input_concat_cond, global_embed=global_embed,
                prepend_cond=prepend_cond, prepend_cond_mask=prepend_cond_mask,
                return_info=return_info, train=train,
            )

        if not batch_cfg:
            # two-pass CFG (halves the activation peak; used for long-form
            # sequences where batch-doubling exceeds HBM)
            cond_res = self._forward(
                x, t, mask=mask, cross_attn_cond=cross_attn_cond,
                cross_attn_cond_mask=cross_attn_cond_mask,
                input_concat_cond=input_concat_cond, global_embed=global_embed,
                prepend_cond=prepend_cond, prepend_cond_mask=prepend_cond_mask,
                return_info=return_info, train=train,
            )
            info = None
            cond_output = cond_res
            if return_info:
                cond_output, info = cond_res
            null_cross = None
            if cross_attn_cond is not None:
                null_cross = jnp.zeros_like(cross_attn_cond)
                if negative_cross_attn_cond is not None:
                    if negative_cross_attn_mask is not None:
                        # masked-out negative tokens become the null embed,
                        # exactly like the batch path below
                        m = negative_cross_attn_mask.astype(bool)[:, :, None]
                        negative_cross_attn_cond = jnp.where(m, negative_cross_attn_cond, null_cross)
                    null_cross = negative_cross_attn_cond
            null_prepend = jnp.zeros_like(prepend_cond) if prepend_cond is not None else None
            uncond_output = self._forward(
                x, t, mask=mask, cross_attn_cond=null_cross,
                cross_attn_cond_mask=cross_attn_cond_mask,
                input_concat_cond=input_concat_cond, global_embed=global_embed,
                prepend_cond=null_prepend, prepend_cond_mask=prepend_cond_mask,
                train=train,
            )
            cfg_output = uncond_output + (cond_output - uncond_output) * cfg_scale
            if scale_phi != 0.0:
                cond_out_std = cond_output.astype(jnp.float32).std(axis=-1, keepdims=True)
                out_cfg_std = cfg_output.astype(jnp.float32).std(axis=-1, keepdims=True)
                rescaled = cfg_output * (cond_out_std / out_cfg_std)
                cfg_output = (scale_phi * rescaled + (1.0 - scale_phi) * cfg_output).astype(cfg_output.dtype)
            return (cfg_output, info) if return_info else cfg_output

        # CFG batch-doubling (reference dit.py:270-339)
        def dup(a):
            return None if a is None else jnp.concatenate([a, a], axis=0)

        batch_cond = None
        if cross_attn_cond is not None:
            null_embed = jnp.zeros_like(cross_attn_cond)
            if negative_cross_attn_cond is not None:
                if negative_cross_attn_mask is not None:
                    m = negative_cross_attn_mask.astype(bool)[:, :, None]
                    negative_cross_attn_cond = jnp.where(m, negative_cross_attn_cond, null_embed)
                batch_cond = jnp.concatenate([cross_attn_cond, negative_cross_attn_cond], axis=0)
            else:
                batch_cond = jnp.concatenate([cross_attn_cond, null_embed], axis=0)

        batch_prepend_cond = None
        if prepend_cond is not None:
            batch_prepend_cond = jnp.concatenate([prepend_cond, jnp.zeros_like(prepend_cond)], axis=0)

        # The uncond half's cross-attention context is the all-zero null
        # embedding; with biasless cond/kv projections its cross-attn output
        # is identically zero, so the blocks compute cross-attention on the
        # cond half only (exact; see TransformerBlock.run_cross). Negative
        # conditioning replaces the null embed, so it disables the skip.
        import os as _os

        cross_half = (
            batch_cond is not None
            and negative_cross_attn_cond is None
            and _os.environ.get("FSAT_DISABLE_CFG_CROSS_SKIP") != "1"
        )

        out = self._forward(
            dup(x),
            dup(t),
            mask=dup(mask),
            cross_attn_cond=batch_cond,
            cross_attn_cond_mask=dup(cross_attn_cond_mask),
            input_concat_cond=dup(input_concat_cond),
            global_embed=dup(global_embed),
            prepend_cond=batch_prepend_cond,
            prepend_cond_mask=dup(prepend_cond_mask),
            return_info=return_info,
            train=train,
            cross_half_batch=cross_half,
        )
        info = None
        if return_info:
            out, info = out

        cond_output, uncond_output = jnp.split(out, 2, axis=0)
        cfg_output = uncond_output + (cond_output - uncond_output) * cfg_scale

        if scale_phi != 0.0:
            # std over the token axis per channel (reference std(dim=1) on
            # [B, C, T] = std over C... note: reference dims are [B,C,T] so
            # dim=1 is the CHANNEL axis; here [B,T,C] -> axis=-1)
            cond_out_std = cond_output.astype(jnp.float32).std(axis=-1, keepdims=True)
            out_cfg_std = cfg_output.astype(jnp.float32).std(axis=-1, keepdims=True)
            rescaled = cfg_output * (cond_out_std / out_cfg_std)
            output = (scale_phi * rescaled + (1.0 - scale_phi) * cfg_output).astype(cfg_output.dtype)
        else:
            output = cfg_output

        return (output, info) if return_info else output
