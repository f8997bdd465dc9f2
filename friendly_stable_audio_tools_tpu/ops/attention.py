"""Scaled-dot-product attention for TPU.

Replaces the reference's CUDA backend ladder (natten -> FlashAttention-2 ->
torch SDPA -> einsum; reference models/transformer.py:479-536) with two paths:

  * "xla": one fused einsum-softmax-einsum; XLA's fusion handles moderate
    sequence lengths (<= ~8k tokens at head_dim 64) in VMEM comfortably.
  * "pallas": a flash-attention Pallas kernel (ops/pallas/flash_attention.py)
    for long self-attention sequences — O(seq) memory, fp32 accumulation.

Conventions: q [B, H, Tq, D], k/v [B, Hkv, Tk, D]; GQA via head repetition;
boolean masks are True = attend. Softmax always accumulates in fp32.
"""

from __future__ import annotations

import functools
import typing as tp

import jax
import jax.numpy as jnp

NEG_INF = -0.7 * float(jnp.finfo(jnp.float32).max)


def _repeat_kv(k: jnp.ndarray, v: jnp.ndarray, num_heads: int):
    kv_heads = k.shape[1]
    if kv_heads != num_heads:
        rep = num_heads // kv_heads
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    return k, v


def scaled_dot_product_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    mask: tp.Optional[jnp.ndarray] = None,
    causal: bool = False,
    implementation: str = "auto",
) -> jnp.ndarray:
    """mask: broadcastable to [B, H, Tq, Tk], True = keep."""
    num_heads = q.shape[1]
    k, v = _repeat_kv(k, v, num_heads)

    if implementation == "auto":
        import os

        # Pallas flash kernel pays off for long self-attention on real TPUs;
        # fall back to the XLA path on CPU (tests) and short/cross attention.
        use_pallas = (
            os.environ.get("FSAT_DISABLE_PALLAS_ATTN") != "1"
            and jax.default_backend() not in ("cpu",)
            and q.shape[-2] >= 1024
            and q.shape[-2] == k.shape[-2]
            and mask is None
            and q.shape[-1] <= 128
        )
        implementation = "pallas" if use_pallas else "xla"

    if implementation == "pallas":
        try:
            from .pallas.flash_attention import flash_attention
        except ImportError:
            return _xla_attention(q, k, v, mask=mask, causal=causal)
        return flash_attention(q, k, v, causal=causal)

    return _xla_attention(q, k, v, mask=mask, causal=causal)


def _xla_attention(q, k, v, mask=None, causal=False):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    if causal:
        i = q.shape[-2]
        j = k.shape[-2]
        causal_mask = jnp.tril(jnp.ones((i, j), bool), k=j - i)
        logits = jnp.where(causal_mask, logits, NEG_INF)
    if mask is not None:
        logits = jnp.where(mask, logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1)
    out = jnp.einsum("bhij,bhjd->bhid", probs.astype(v.dtype), v, preferred_element_type=jnp.float32)
    return out.astype(q.dtype)


def windowed_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    kernel_size: int,
    mask: tp.Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """1-D neighborhood attention (replaces natten, reference
    transformer.py:479-493): each query attends to a `kernel_size` window
    centered on it (clamped at the edges, matching natten semantics).

    Implemented as banded masking of full attention; for sequences where the
    O(T^2) mask is too large, the Pallas flash kernel with band limits takes
    over (TODO ops/pallas)."""
    t = q.shape[-2]
    half = kernel_size // 2
    centers = jnp.clip(jnp.arange(t), half, t - 1 - half)
    offsets = jnp.arange(t)
    band = jnp.abs(offsets[None, :] - centers[:, None]) <= half
    band = band[None, None]
    if mask is not None:
        band = jnp.logical_and(band, mask)
    return _xla_attention(q, k, v, mask=band, causal=False)
