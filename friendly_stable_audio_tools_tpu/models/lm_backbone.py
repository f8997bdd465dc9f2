"""Audio LM backbones.

Parity target: reference `models/lm_backbone.py:12-172`. Both reference
backbones (x-transformers Decoder and ContinuousTransformer) map to the
native causal ContinuousTransformer here. Generation caching maps to the
static KV-cache decode path (fixed-size buffers + index, scan-compatible)
instead of torch-side mutable cache objects.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from .transformer import ContinuousTransformer


class _MLPEmbed(nn.Module):
    dim_out: int

    @nn.compact
    def __call__(self, x):
        x = nn.Dense(self.dim_out, use_bias=False, param_dtype=jnp.float32, name="0")(x)
        x = jax.nn.silu(x)
        x = nn.Dense(self.dim_out, use_bias=False, param_dtype=jnp.float32, name="2")(x)
        return x


class ContinuousTransformerAudioLMBackbone(nn.Module):
    """reference lm_backbone.py:111-172 (the x-transformers variant maps here
    too — same architecture natively)."""

    embed_dim: int
    cross_attn_cond_dim: int = 0
    prepend_cond_dim: int = 0
    project_cross_attn_cond: bool = False
    depth: int = 12
    num_heads: int = 8
    # passthrough kwargs
    ff_mult: int = 4
    qk_norm: bool = False

    use_generation_cache: tp.ClassVar[bool] = True

    def setup(self):
        self.model = ContinuousTransformer(
            dim=self.embed_dim,
            depth=self.depth,
            dim_heads=self.embed_dim // self.num_heads,
            dim_in=self.embed_dim,
            dim_out=self.embed_dim,
            cross_attend=self.cross_attn_cond_dim > 0,
            cond_token_dim=self.embed_dim if self.project_cross_attn_cond else self.cross_attn_cond_dim,
            causal=True,
            ff_mult=self.ff_mult,
            qk_norm=self.qk_norm,
        )
        if self.prepend_cond_dim > 0:
            self.to_prepend_embed = _MLPEmbed(self.embed_dim)
        if self.cross_attn_cond_dim > 0 and self.project_cross_attn_cond:
            self.to_cross_attn_embed = _MLPEmbed(self.embed_dim)

    def _prep(self, prepend_cond, prepend_cond_mask, cross_attn_cond):
        prepend_length = 0
        if prepend_cond is not None:
            prepend_cond = self.to_prepend_embed(prepend_cond)
            prepend_length = prepend_cond.shape[1]
            if prepend_cond_mask is not None:
                prepend_cond_mask = prepend_cond_mask.astype(bool)
        if cross_attn_cond is not None and self.cross_attn_cond_dim > 0 and self.project_cross_attn_cond:
            cross_attn_cond = self.to_cross_attn_embed(cross_attn_cond)
        return prepend_cond, prepend_cond_mask, cross_attn_cond, prepend_length

    def __call__(self, x, mask=None, prepend_cond=None, prepend_cond_mask=None,
                 cross_attn_cond=None, global_cond=None, use_cache: bool = False,
                 train: bool = False):
        prepend_cond, prepend_cond_mask, cross_attn_cond, pl = self._prep(
            prepend_cond, prepend_cond_mask, cross_attn_cond)
        out = self.model(
            x, mask=mask, context=cross_attn_cond,
            prepend_embeds=prepend_cond, prepend_mask=prepend_cond_mask,
            train=train,
        )
        return out[:, pl:, :]

    # ---- static-cache decode --------------------------------------------

    def init_cache(self, batch: int, max_len: int, prepend_len: int = 0, dtype=jnp.float32):
        """Allocate per-layer fixed KV buffers for `prepend_len + max_len`."""
        n_layers = self.model.depth
        kv_heads = self.model.dim // self.model.dim_heads
        total = max_len + prepend_len
        return [
            {
                "k": jnp.zeros((batch, kv_heads, total, self.model.dim_heads), dtype),
                "v": jnp.zeros((batch, kv_heads, total, self.model.dim_heads), dtype),
                # per-key validity: prefill writes the prepend mask here so
                # padded prepend positions stay masked for the whole decode
                "kmask": jnp.ones((batch, total), bool),
                "index": jnp.zeros((), jnp.int32),
            }
            for _ in range(n_layers)
        ]

    def decode_step(self, x, caches, cross_attn_cond=None, prepend_cond=None,
                    prepend_cond_mask=None, global_cond=None):
        """Run tokens through the transformer writing into static caches.
        For the PREFILL call include prepend_cond; subsequent single-token
        calls must not. Returns (output_without_prepend, new_caches)."""
        prepend_cond, prepend_cond_mask, cross_attn_cond, pl = self._prep(
            prepend_cond, prepend_cond_mask, cross_attn_cond)
        out, new_caches = self.model(
            x, context=cross_attn_cond,
            prepend_embeds=prepend_cond, prepend_mask=prepend_cond_mask,
            kv_caches=caches, return_kv=True,
        )
        return out[:, pl:, :], new_caches


# alias: the x-transformers Decoder backbone is the same architecture natively
XTransformersAudioLMBackbone = ContinuousTransformerAudioLMBackbone
