"""1-D convolutions with (optional) weight normalization, channels-last.

These are the workhorses of the Oobleck VAE and discriminators. The reference
uses `dac.nn.layers.WNConv1d` / `WNConvTranspose1d` (torch `weight_norm`);
here the same parameterization (direction `v`, magnitude `g`) is kept so that
training dynamics match and PyTorch checkpoints convert losslessly
(reference: models/autoencoders.py:11, SURVEY §7 "weight-norm conv parity").

Layout: inputs/outputs are [B, T, C] (NWC). XLA on TPU maps the channel dim
onto lanes and lowers these to MXU convolutions; strided convs over 44.1 kHz
waveforms are the VAE's FLOP budget, so keeping them as single
`lax.conv_general_dilated` calls (no im2col in Python) is the perf-critical
property.

Torch parity notes:
  * torch Conv1d weight has shape (out, in/groups, k); here `kernel`/`v` is
    (k, in/groups, out) — converters transpose (2, 1, 0).
  * torch weight_norm(dim=0): per-OUTPUT-channel norm for Conv1d, but
    per-INPUT-channel norm for ConvTranspose1d (its dim 0 is in_channels).
    Both behaviors are reproduced exactly.
  * torch ConvTranspose1d(stride s, padding p): out_len = (T-1)*s - 2p + k.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

Padding = tp.Union[int, tp.Tuple[int, int], str]


def _norm_padding(padding: Padding) -> tp.Union[str, tp.Sequence[tp.Tuple[int, int]]]:
    if isinstance(padding, str):
        return padding.upper()
    if isinstance(padding, int):
        return [(padding, padding)]
    return [tuple(padding)]


def conv1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding: Padding = 0,
    dilation: int = 1,
    groups: int = 1,
) -> jnp.ndarray:
    """[B, T, Cin] x [k, Cin/groups, Cout] -> [B, T', Cout]."""
    return jax.lax.conv_general_dilated(
        x,
        w,
        window_strides=(stride,),
        padding=_norm_padding(padding),
        rhs_dilation=(dilation,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def conv_transpose1d(
    x: jnp.ndarray,
    w: jnp.ndarray,
    stride: int = 1,
    padding: int = 0,
) -> jnp.ndarray:
    """Torch-semantics transposed conv: [B,T,Cin] x [k,Cin,Cout] -> [B,(T-1)s-2p+k,Cout].

    Implemented as an input-dilated convolution with a spatially flipped
    kernel — the exact adjoint of `conv1d` — which XLA lowers to an MXU conv.
    """
    k = w.shape[0]
    w_flip = jnp.flip(w, axis=0)
    return jax.lax.conv_general_dilated(
        x,
        w_flip,
        window_strides=(1,),
        padding=[(k - 1 - padding, k - 1 - padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"),
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)


def _fan_in_uniform(fan_in: int):
    """torch Conv1d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in))."""
    bound = 1.0 / (fan_in ** 0.5)

    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


class Conv1d(nn.Module):
    """Plain 1-D conv, torch-default init, channels-last."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: Padding = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = (self.in_channels // self.groups) * self.kernel_size
        w = self.param(
            "kernel",
            _fan_in_uniform(fan_in),
            (self.kernel_size, self.in_channels // self.groups, self.out_channels),
            jnp.float32,
        )
        y = conv1d(x, w.astype(x.dtype), self.stride, self.padding, self.dilation, self.groups)
        if self.use_bias:
            b = self.param("bias", _fan_in_uniform(fan_in), (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class WNConv1d(nn.Module):
    """Weight-normalized Conv1d: w = g * v / ||v||_(k,in) per output channel."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: Padding = 0
    dilation: int = 1
    groups: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = (self.in_channels // self.groups) * self.kernel_size
        v = self.param(
            "v",
            _fan_in_uniform(fan_in),
            (self.kernel_size, self.in_channels // self.groups, self.out_channels),
            jnp.float32,
        )
        # torch weight_norm initializes g = ||v|| so the initial weight equals v.
        g = self.param("g", lambda key, *_: _vnorm_oc(v), (self.out_channels,), jnp.float32)
        w = v * (g / (_vnorm_oc(v) + 1e-12))
        y = conv1d(x, w.astype(x.dtype), self.stride, self.padding, self.dilation, self.groups)
        if self.use_bias:
            b = self.param("bias", _fan_in_uniform(fan_in), (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


def _vnorm_oc(v: jnp.ndarray) -> jnp.ndarray:
    """L2 norm over (k, in) for each output channel -> shape (out,)."""
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1)))


def _vnorm_ic(v: jnp.ndarray) -> jnp.ndarray:
    """L2 norm over (k, out) for each INPUT channel -> shape (in,); this is
    what torch weight_norm(dim=0) computes on ConvTranspose1d's (in,out,k)."""
    return jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 2)))


class ConvTranspose1d(nn.Module):
    """Plain transposed conv with torch output-length semantics."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = self.out_channels * self.kernel_size  # torch: in_ch of fwd conv view
        w = self.param(
            "kernel",
            _fan_in_uniform(fan_in),
            (self.kernel_size, self.in_channels, self.out_channels),
            jnp.float32,
        )
        y = conv_transpose1d(x, w.astype(x.dtype), self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", _fan_in_uniform(fan_in), (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y


class WNConvTranspose1d(nn.Module):
    """Weight-normalized transposed conv; norm per input channel (torch dim=0)."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    padding: int = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        fan_in = self.out_channels * self.kernel_size
        v = self.param(
            "v",
            _fan_in_uniform(fan_in),
            (self.kernel_size, self.in_channels, self.out_channels),
            jnp.float32,
        )
        g = self.param("g", lambda key, *_: _vnorm_ic(v), (self.in_channels,), jnp.float32)
        w = v * (g / (_vnorm_ic(v) + 1e-12))[None, :, None]
        y = conv_transpose1d(x, w.astype(x.dtype), self.stride, self.padding)
        if self.use_bias:
            b = self.param("bias", _fan_in_uniform(fan_in), (self.out_channels,), jnp.float32)
            y = y + b.astype(y.dtype)
        return y
