"""Windowed-attention transformer autoencoder blocks.

Parity target: reference `models/local_attention.py:16-282` —
ContinuousLocalTransformer (neighborhood attention + AdaRMSNorm cond),
TransformerDownsample/UpsampleBlock1D (trade sequence length for channels),
and TransformerEncoder1D/Decoder1D as alternative AE encoder/decoder types
(`local_attn` in create_encoder/decoder_from_config, autoencoders.py:710-713).

The natten CUDA dependency is replaced by the windowed attention in
ops/attention (banded masking / Pallas for long sequences).

Layout: channels-last [B, T, C] (the factory wrappers already feed NWC).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from .transformer import Attention, FeedForward, LayerNorm
from ..ops.embeddings import rotary_freqs


class AdaRMSNorm(nn.Module):
    """RMSNorm with conditioned scale (reference blocks.py:222-232)."""

    dim: int
    cond_dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x, cond):
        scale = nn.Dense(self.dim, use_bias=False, kernel_init=nn.initializers.zeros,
                         param_dtype=jnp.float32, name="to_scale")(cond)
        x32 = x.astype(jnp.float32)
        normed = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + self.eps)
        if scale.ndim == 2:
            scale = scale[:, None, :]
        return (normed * (1 + scale.astype(jnp.float32))).astype(x.dtype)


class ContinuousLocalTransformer(nn.Module):
    """reference local_attention.py:16-103."""

    dim: int
    depth: int
    dim_in: tp.Optional[int] = None
    dim_out: tp.Optional[int] = None
    causal: bool = False
    local_attn_window_size: int = 64
    heads: int = 8
    ff_mult: int = 2
    cond_dim: int = 0
    cross_attn_cond_dim: int = 0

    @nn.compact
    def __call__(self, x, mask=None, cond=None, cross_attn_cond=None,
                 cross_attn_cond_mask=None, prepend_cond=None):
        dim_head = self.dim // self.heads
        if self.dim_in is not None:
            x = nn.Dense(self.dim, param_dtype=jnp.float32, name="project_in")(x)
        if prepend_cond is not None:
            x = jnp.concatenate([prepend_cond.astype(x.dtype), x], axis=1)

        rot_dim = min(max(dim_head // 2, 32), dim_head)
        rot = rotary_freqs(x.shape[1], rot_dim)

        for i in range(self.depth):
            residual = x
            if self.cond_dim > 0 and cond is not None:
                h = AdaRMSNorm(self.dim, self.cond_dim, name=f"attn_norm{i}")(x, cond)
            else:
                h = LayerNorm(self.dim, name=f"attn_norm{i}")(x)
            h = Attention(self.dim, dim_head, causal=self.causal, zero_init_output=True,
                          natten_kernel_size=self.local_attn_window_size, name=f"attn{i}")(
                h, mask=mask, rotary_pos_emb=rot)
            x = h + residual

            if self.cross_attn_cond_dim > 0 and cross_attn_cond is not None:
                x = Attention(self.dim, dim_head, dim_context=self.cross_attn_cond_dim,
                              zero_init_output=True, name=f"xattn{i}")(
                    x, context=cross_attn_cond, context_mask=cross_attn_cond_mask) + x

            residual = x
            if self.cond_dim > 0 and cond is not None:
                h = AdaRMSNorm(self.dim, self.cond_dim, name=f"ff_norm{i}")(x, cond)
            else:
                h = LayerNorm(self.dim, name=f"ff_norm{i}")(x)
            x = FeedForward(self.dim, mult=self.ff_mult, no_bias=True, name=f"ff{i}")(h) + residual

        if self.dim_out is not None:
            x = nn.Dense(self.dim_out, param_dtype=jnp.float32, name="project_out")(x)
        return x


class TransformerDownsampleBlock1D(nn.Module):
    """reference local_attention.py:106-151."""

    in_channels: int
    embed_dim: int = 768
    depth: int = 3
    heads: int = 12
    downsample_ratio: int = 2
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        if self.in_channels != self.embed_dim:
            x = nn.Dense(self.embed_dim, use_bias=False, param_dtype=jnp.float32, name="project_in")(x)
        x = ContinuousLocalTransformer(
            dim=self.embed_dim, depth=self.depth, heads=self.heads,
            local_attn_window_size=self.local_attn_window_size, name="transformer")(x)
        b, t, c = x.shape
        r = self.downsample_ratio
        x = x.reshape(b, t // r, r * c)  # "b (n r) c -> b n (c r)" time-major
        x = nn.Dense(self.embed_dim, use_bias=False, param_dtype=jnp.float32, name="project_down")(x)
        return x


class TransformerUpsampleBlock1D(nn.Module):
    """reference local_attention.py:154-195."""

    in_channels: int
    embed_dim: int
    depth: int = 3
    heads: int = 12
    upsample_ratio: int = 2
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        if self.in_channels != self.embed_dim:
            x = nn.Dense(self.embed_dim, use_bias=False, param_dtype=jnp.float32, name="project_in")(x)
        x = nn.Dense(self.embed_dim * self.upsample_ratio, use_bias=False,
                     param_dtype=jnp.float32, name="project_up")(x)
        b, t, cr = x.shape
        r = self.upsample_ratio
        x = x.reshape(b, t * r, cr // r)  # "b n (c r) -> b (n r) c"
        x = ContinuousLocalTransformer(
            dim=self.embed_dim, depth=self.depth, heads=self.heads,
            local_attn_window_size=self.local_attn_window_size, name="transformer")(x)
        return x


class TransformerEncoder1D(nn.Module):
    """reference local_attention.py:198-242; channels-last in/out."""

    in_channels: int
    out_channels: int
    embed_dims: tp.Sequence[int] = (96, 192, 384, 768)
    heads: tp.Sequence[int] = (12, 12, 12, 12)
    depths: tp.Sequence[int] = (3, 3, 3, 3)
    ratios: tp.Sequence[int] = (2, 2, 2, 2)
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dims[0], use_bias=False, param_dtype=jnp.float32, name="project_in")(x)
        for layer in range(len(self.depths)):
            prev_dim = self.embed_dims[layer - 1] if layer > 0 else self.embed_dims[0]
            x = TransformerDownsampleBlock1D(
                in_channels=prev_dim, embed_dim=self.embed_dims[layer],
                heads=self.heads[layer], depth=self.depths[layer],
                downsample_ratio=self.ratios[layer],
                local_attn_window_size=self.local_attn_window_size,
                name=f"layer{layer}")(x)
        x = nn.Dense(self.out_channels, use_bias=False, param_dtype=jnp.float32, name="project_out")(x)
        return x


class TransformerDecoder1D(nn.Module):
    """reference local_attention.py:245-282."""

    in_channels: int
    out_channels: int
    embed_dims: tp.Sequence[int] = (768, 384, 192, 96)
    heads: tp.Sequence[int] = (12, 12, 12, 12)
    depths: tp.Sequence[int] = (3, 3, 3, 3)
    ratios: tp.Sequence[int] = (2, 2, 2, 2)
    local_attn_window_size: int = 64

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.embed_dims[0], use_bias=False, param_dtype=jnp.float32, name="project_in")(x)
        for layer in range(len(self.depths)):
            prev_dim = self.embed_dims[layer - 1] if layer > 0 else self.embed_dims[0]
            x = TransformerUpsampleBlock1D(
                in_channels=prev_dim, embed_dim=self.embed_dims[layer],
                heads=self.heads[layer], depth=self.depths[layer],
                upsample_ratio=self.ratios[layer],
                local_attn_window_size=self.local_attn_window_size,
                name=f"layer{layer}")(x)
        x = nn.Dense(self.out_channels, use_bias=False, param_dtype=jnp.float32, name="project_out")(x)
        return x
