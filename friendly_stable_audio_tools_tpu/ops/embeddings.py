"""Positional / timestep embeddings.

Parity targets: FourierFeatures (reference models/blocks.py:88-97),
RotaryEmbedding + apply_rotary_pos_emb (reference models/transformer.py:99-183,
partial rotary, NTK base rescale, fp32 application), Absolute/ScaledSinusoidal
embeddings (transformer.py:47-90).
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class FourierFeatures(nn.Module):
    """f = 2*pi*x@W^T -> [cos(f), sin(f)]; W ~ N(0, std)."""

    in_features: int
    out_features: int
    std: float = 1.0

    @nn.compact
    def __call__(self, x):
        w = self.param(
            "weight",
            nn.initializers.normal(self.std),
            (self.out_features // 2, self.in_features),
            jnp.float32,
        )
        f = 2 * math.pi * x.astype(jnp.float32) @ w.T
        return jnp.concatenate([jnp.cos(f), jnp.sin(f)], axis=-1).astype(x.dtype)


def rotary_inv_freq(dim: int, base: float = 10000.0, base_rescale_factor: float = 1.0) -> jnp.ndarray:
    """NTK-aware base rescale (reference transformer.py:110-115)."""
    base = base * base_rescale_factor ** (dim / (dim - 2))
    return 1.0 / (base ** (jnp.arange(0, dim, 2, dtype=jnp.float32) / dim))


def rotary_freqs(seq_len: int, dim: int, base: float = 10000.0,
                 interpolation_factor: float = 1.0, base_rescale_factor: float = 1.0) -> jnp.ndarray:
    """[seq_len, dim] rotation angles; freqs duplicated over both halves
    (reference transformer.py:135-148)."""
    inv_freq = rotary_inv_freq(dim, base, base_rescale_factor)
    t = jnp.arange(seq_len, dtype=jnp.float32) / interpolation_factor
    f = jnp.einsum("i,j->ij", t, inv_freq)
    return jnp.concatenate([f, f], axis=-1)


def _rotate_half(x):
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rotary_pos_emb(t: jnp.ndarray, freqs: jnp.ndarray, scale: float = 1.0) -> jnp.ndarray:
    """Partial rotary in fp32 (reference transformer.py:164-183).

    t: [..., seq, head_dim]; freqs: [seq', rot_dim] with rot_dim <= head_dim.
    Uses the LAST seq' positions of freqs if t is shorter (KV-cache decode).

    TPU note: formulated as full-head-width elementwise ops (cos/sin tables
    padded to head_dim; rotate-half as two lane rolls + select) instead of
    rot_dim-wide slice/concat. Sub-lane (e.g. 32-of-128) slices force
    misaligned lane shuffles that XLA materializes at larger batches —
    measured 45x superlinear rope cost at CFG batch 16 with the sliced form.
    Same math, bit-identical results.
    """
    out_dtype = t.dtype
    rot_dim = freqs.shape[-1]
    head_dim = t.shape[-1]
    seq_len = t.shape[-2]
    freqs = freqs[-seq_len:, :].astype(jnp.float32)
    t32 = t.astype(jnp.float32)

    pad = head_dim - rot_dim
    cos = jnp.cos(freqs) * scale
    sin = jnp.sin(freqs) * scale
    if pad:
        cos = jnp.concatenate([cos, jnp.ones((seq_len, pad), jnp.float32)], axis=-1)
        sin = jnp.concatenate([sin, jnp.zeros((seq_len, pad), jnp.float32)], axis=-1)

    # rotate_half as a tiny [D, D] +-1 permutation matmul (same trick as the
    # fused Pallas rope, ops/pallas/flash_attention.py:_apply_rope_tile): the
    # MXU absorbs it and no lane shuffles are materialized
    half = rot_dim // 2
    p = np.zeros((head_dim, head_dim), np.float32)
    for j in range(half):
        p[j + half, j] = -1.0
        p[j, j + half] = 1.0
    rot = jax.lax.dot(t32.reshape(-1, head_dim), jnp.asarray(p),
                      precision=jax.lax.Precision.HIGHEST).reshape(t32.shape)
    out = t32 * cos + rot * sin
    return out.astype(out_dtype)


class AbsolutePositionalEmbedding(nn.Module):
    """Learned absolute positions, scaled by dim**-0.5 (transformer.py:47-69)."""

    dim: int
    max_seq_len: int

    @nn.compact
    def __call__(self, x, pos: tp.Optional[jnp.ndarray] = None):
        seq_len = x.shape[1]
        assert seq_len <= self.max_seq_len
        emb = self.param("emb", nn.initializers.normal(1.0), (self.max_seq_len, self.dim), jnp.float32)
        if pos is None:
            pos = jnp.arange(seq_len)
        return (emb[pos] * self.dim**-0.5).astype(x.dtype)


class ScaledSinusoidalEmbedding(nn.Module):
    """Sinusoidal with a learned scalar scale (transformer.py:72-96)."""

    dim: int
    theta: float = 10000.0

    @nn.compact
    def __call__(self, x, pos: tp.Optional[jnp.ndarray] = None):
        seq_len = x.shape[1]
        scale = self.param("scale", lambda *_: jnp.ones((1,)) * self.dim**-0.5, (1,), jnp.float32)
        half = self.dim // 2
        inv_freq = self.theta ** -(jnp.arange(half, dtype=jnp.float32) / half)
        if pos is None:
            pos = jnp.arange(seq_len, dtype=jnp.float32)
        f = jnp.einsum("i,j->ij", pos, inv_freq)
        emb = jnp.concatenate([jnp.sin(f), jnp.cos(f)], axis=-1)
        return (emb * scale).astype(x.dtype)
