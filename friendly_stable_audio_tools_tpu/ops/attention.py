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
    kv_len: tp.Optional[int] = None,
) -> jnp.ndarray:
    """mask: broadcastable to [B, H, Tq, Tk], True = keep.

    kv_len: true K/V length for pre-padded self-attention inputs (the
    padded-sequence transformer path) — positions >= kv_len are masked out;
    the padded q rows still produce (garbage) outputs for the caller to
    slice off once."""
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
            and (q.shape[-2] == k.shape[-2] or not causal)
            and mask is None
            and q.shape[-1] <= 128
            # short-K cross attention (e.g. 130 cond tokens): the per-program
            # fixed costs of the kernel dominate its tiny dots; XLA's fused
            # einsum-softmax-einsum wins there (A/B'd on v5e)
            and (k.shape[-2] >= 512 or os.environ.get("FSAT_PALLAS_CROSS") == "1")
        )
        implementation = "pallas" if use_pallas else "xla"

    if implementation == "pallas":
        if mask is not None:
            # the flash kernel has no arbitrary-mask support; silently
            # dropping the mask would attend over masked positions
            return _xla_attention(q, k, v, mask=mask, causal=causal, kv_len=kv_len)
        try:
            from .pallas.flash_attention import flash_attention
        except ImportError:
            return _xla_attention(q, k, v, mask=mask, causal=causal, kv_len=kv_len)
        return flash_attention(q, k, v, causal=causal, kv_len=kv_len)

    return _xla_attention(q, k, v, mask=mask, causal=causal, kv_len=kv_len)


def _xla_attention(q, k, v, mask=None, causal=False, kv_len=None):
    scale = 1.0 / (q.shape[-1] ** 0.5)
    logits = jnp.einsum("bhid,bhjd->bhij", q, k, preferred_element_type=jnp.float32) * scale
    if kv_len is not None and kv_len < k.shape[-2]:
        kpos = jnp.arange(k.shape[-2])
        logits = jnp.where(kpos[None, None, None, :] < kv_len, logits, NEG_INF)
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

    Short sequences use banded masking of full attention; long sequences use
    a chunked formulation — queries in chunks of size C attend to their
    chunk plus a (kernel_size-1) halo on each side — O(T * (C + 2k)) memory
    instead of O(T^2)."""
    t = q.shape[-2]
    if t <= 2048 or mask is not None:
        half = kernel_size // 2
        centers = jnp.clip(jnp.arange(t), half, t - 1 - half)
        offsets = jnp.arange(t)
        band = jnp.abs(offsets[None, :] - centers[:, None]) <= half
        band = band[None, None]
        if mask is not None:
            band = jnp.logical_and(band, mask)
        return _xla_attention(q, k, v, mask=band, causal=False)
    return _chunked_windowed_attention(q, k, v, kernel_size)


def _chunked_windowed_attention(q, k, v, kernel_size: int, chunk: int = 512):
    b, h, t, d = q.shape
    half = kernel_size // 2
    halo = kernel_size - 1  # clamped edge windows reach up to k-1 one-sided
    pad_t = (chunk - t % chunk) % chunk
    n_c = (t + pad_t) // chunk
    scale = 1.0 / (d ** 0.5)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, pad_t), (0, 0)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (halo, pad_t + halo), (0, 0)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (halo, pad_t + halo), (0, 0)))

    # [B, H, n_c, chunk, d] queries; [B, H, n_c, chunk + 2*halo, d] keys
    qc = qp.reshape(b, h, n_c, chunk, d)
    idx = (jnp.arange(n_c)[:, None] * chunk + jnp.arange(chunk + 2 * halo)[None, :])
    kc = kp[:, :, idx, :]
    vc = vp[:, :, idx, :]

    logits = jnp.einsum("bhcid,bhcjd->bhcij", qc, kc,
                        preferred_element_type=jnp.float32) * scale
    # global positions: query chunk*c + i; key chunk*c + j - halo
    qpos = jnp.arange(n_c)[:, None, None] * chunk + jnp.arange(chunk)[None, :, None]
    kpos = jnp.arange(n_c)[:, None, None] * chunk + jnp.arange(chunk + 2 * halo)[None, None, :] - halo
    centers = jnp.clip(qpos, half, t - 1 - half)
    keep = (jnp.abs(kpos - centers) <= half) & (kpos >= 0) & (kpos < t)
    logits = jnp.where(keep[None, None], logits, NEG_INF)
    probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
    out = jnp.einsum("bhcij,bhcjd->bhcid", probs, vc, preferred_element_type=jnp.float32)
    return out.reshape(b, h, n_c * chunk, d)[:, :, :t].astype(q.dtype)
