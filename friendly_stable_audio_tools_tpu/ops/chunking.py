"""Static-shape chunked streaming with crossfade overlap-add.

The reference implements chunked VAE encode/decode as host-side Python loops
over dynamic chunk lists with Bartlett-window crossfade
(models/autoencoders.py:410-645). On TPU this becomes a single `lax.scan`
over a statically known chunk count: each step dynamic-slices one chunk,
applies the (traced-once) network, windows the output edges, and accumulates
into the output buffer in place. Memory stays at one-chunk activations —
the entire point of chunking — while XLA pipelines HBM traffic.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp


def bartlett_window(n: int, dtype=jnp.float32) -> jnp.ndarray:
    """torch.bartlett_window(n) parity (periodic triangular window)."""
    if n == 1:
        return jnp.zeros((1,), dtype)
    # torch default is periodic=True: symmetric window of length n+1, truncated.
    i = jnp.arange(n, dtype=dtype)
    return 1.0 - jnp.abs(2.0 * i / n - 1.0)


def chunked_process(
    fn: tp.Callable[[jnp.ndarray], jnp.ndarray],
    x: jnp.ndarray,
    chunk_in: int,
    hop_in: int,
    chunk_out: int,
    hop_out: int,
    overlap_out: int,
    out_channels: int,
    out_length: int,
    pad_mode: str = "zero",
    out_dtype=None,
) -> jnp.ndarray:
    """Apply `fn: [B, chunk_in, Cin] -> [B, chunk_out, Cout]` over overlapping
    chunks of `x` [B, T, Cin], crossfading outputs with a Bartlett window.

    First chunk keeps its head un-windowed, last keeps its tail (reference
    autoencoders.py:483-494). Result is trimmed to `out_length`.
    """
    B, T, _ = x.shape
    n_chunk = max(int(math.ceil((T - chunk_in) / hop_in)) + 1, 1)
    pad = chunk_in + hop_in * (n_chunk - 1) - T
    if pad > 0:
        if pad_mode == "reflect":
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        else:
            x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))

    win = bartlett_window(overlap_out * 2, jnp.float32)
    rise, fall = win[:overlap_out], win[overlap_out:]

    out_dtype = out_dtype or x.dtype
    t_out_padded = chunk_out + hop_out * (n_chunk - 1)

    def body(out, i):
        xc = jax.lax.dynamic_slice(x, (0, i * hop_in, 0), (B, chunk_in, x.shape[-1]))
        yc = fn(xc).astype(jnp.float32)
        if overlap_out > 0:
            ones = jnp.ones((overlap_out,), jnp.float32)
            head = jnp.where(i == 0, ones, rise)
            tail = jnp.where(i == n_chunk - 1, ones, fall)
            w = jnp.concatenate([head, jnp.ones((chunk_out - 2 * overlap_out,), jnp.float32), tail])
            yc = yc * w[None, :, None]
        cur = jax.lax.dynamic_slice(out, (0, i * hop_out, 0), (B, chunk_out, out_channels))
        out = jax.lax.dynamic_update_slice(out, cur + yc, (0, i * hop_out, 0))
        return out, None

    out0 = jnp.zeros((B, t_out_padded, out_channels), jnp.float32)
    out, _ = jax.lax.scan(body, out0, jnp.arange(n_chunk))
    return out[:, :out_length].astype(out_dtype)


def microbatched(fn: tp.Callable, x: jnp.ndarray, max_batch: int) -> jnp.ndarray:
    """Apply `fn` over the batch dim in groups of `max_batch` via lax.map
    (reference `iterate_batch`, autoencoders.py:275-291). Pads the batch to a
    multiple of `max_batch` so shapes stay static, then trims."""
    B = x.shape[0]
    if max_batch >= B:
        return fn(x)
    n_groups = int(math.ceil(B / max_batch))
    pad = n_groups * max_batch - B
    if pad:
        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    grouped = x.reshape((n_groups, max_batch) + x.shape[1:])
    out = jax.lax.map(fn, grouped)
    return out.reshape((n_groups * max_batch,) + out.shape[2:])[:B]
