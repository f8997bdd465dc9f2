"""Misc normalization/pointwise blocks.

Parity target: reference `models/blocks.py` — `RMSNorm` (301-315), compiled
`rms_norm`/`linear_geglu` (273-287; XLA fuses these automatically, no
torch.compile needed), `ForcedWNConv1d` (242-256), `AdaRMSNorm` lives in
models/local_attention.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def rms_norm(x, scale, eps: float = 1e-8):
    """reference blocks.py:273-276 (fp32 accumulation)."""
    x32 = x.astype(jnp.float32)
    normed = x32 * jax.lax.rsqrt(jnp.mean(jnp.square(x32), -1, keepdims=True) + eps)
    return (normed * scale.astype(jnp.float32)).astype(x.dtype)


def linear_geglu(x, weight, bias=None):
    """reference blocks.py:279-284: x@W(+b) split in two, x * gelu(gate)."""
    y = x @ weight
    if bias is not None:
        y = y + bias
    a, gate = jnp.split(y, 2, axis=-1)
    return a * jax.nn.gelu(gate)


class RMSNorm(nn.Module):
    """reference blocks.py:301-315."""

    dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", nn.initializers.ones, (self.dim,), jnp.float32)
        return rms_norm(x, scale, self.eps)


class ForcedWNConv1d(nn.Module):
    """Conv with weight normalized at call time (reference blocks.py:242-256);
    channels-last."""

    in_channels: int
    out_channels: int
    kernel_size: int = 1

    @nn.compact
    def __call__(self, x):
        from .convs import conv1d

        w = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel_size, self.in_channels, self.out_channels), jnp.float32,
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(w), axis=(0, 1), keepdims=True))
        w = w / jnp.maximum(norm, 1e-12)
        return conv1d(x, w.astype(x.dtype), padding=self.kernel_size // 2)
