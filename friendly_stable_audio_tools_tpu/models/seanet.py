"""SEANet encoder/decoder (EnCodec), native JAX.

The reference imports `encodec.modules.SEANetEncoder/SEANetDecoder`
(reference models/autoencoders.py:700-736) for the `seanet` encoder/decoder
type used by `encodec_musicgen_rvq.json`: weight-normalized conv stacks with
ELU activations, dilated residual blocks, strided up/downsampling and a
2-layer LSTM bottleneck.

Layout: channels-last [B, T, C].
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convs import WNConv1d, WNConvTranspose1d


def _same_pad(k: int, dilation: int = 1) -> int:
    return ((k - 1) * dilation) // 2


class SEANetResnetBlock(nn.Module):
    dim: int
    kernel_sizes: tp.Sequence[int] = (3, 1)
    dilations: tp.Sequence[int] = (1, 1)
    compress: int = 2

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // self.compress
        h = x
        dims = [self.dim, hidden, self.dim]
        for i, (k, d) in enumerate(zip(self.kernel_sizes, self.dilations)):
            h = jax.nn.elu(h)
            h = WNConv1d(dims[i], dims[i + 1], k, dilation=d, padding=_same_pad(k, d),
                         name=f"conv{i}")(h)
        return x + h


class _LSTM(nn.Module):
    """n-layer LSTM over time (replaces encodec's SLSTM); residual add."""

    dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.dim, param_dtype=jnp.float32, name=f"lstm{i}")
            rnn = nn.RNN(cell, name=f"rnn{i}")
            h = rnn(h)
        return x + h


class SEANetEncoder(nn.Module):
    """encodec.modules.SEANetEncoder-compatible config surface."""

    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: tp.Sequence[int] = (8, 5, 4, 2)  # note: reference factory reverses
    n_residual_layers: int = 1
    dilation_base: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    lstm: int = 2
    norm: str = "weight_norm"
    causal: bool = False

    @nn.compact
    def __call__(self, x):
        mult = 1
        x = WNConv1d(self.channels, mult * self.n_filters, self.kernel_size,
                     padding=_same_pad(self.kernel_size), name="conv_in")(x)
        for bi, ratio in enumerate(self.ratios):
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base**j, 1),
                    name=f"block{bi}_res{j}",
                )(x)
            x = jax.nn.elu(x)
            x = WNConv1d(mult * self.n_filters, mult * self.n_filters * 2, ratio * 2,
                         stride=ratio, padding=math.ceil(ratio / 2), name=f"down{bi}")(x)
            mult *= 2
        if self.lstm:
            x = _LSTM(mult * self.n_filters, self.lstm, name="lstm")(x)
        x = jax.nn.elu(x)
        x = WNConv1d(mult * self.n_filters, self.dimension, self.last_kernel_size,
                     padding=_same_pad(self.last_kernel_size), name="conv_out")(x)
        return x


class SEANetDecoder(nn.Module):
    channels: int = 1
    dimension: int = 128
    n_filters: int = 32
    ratios: tp.Sequence[int] = (8, 5, 4, 2)
    n_residual_layers: int = 1
    dilation_base: int = 2
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    lstm: int = 2
    norm: str = "weight_norm"
    causal: bool = False
    final_activation: tp.Optional[str] = None

    @nn.compact
    def __call__(self, x):
        mult = int(2 ** len(self.ratios))
        x = WNConv1d(self.dimension, mult * self.n_filters, self.kernel_size,
                     padding=_same_pad(self.kernel_size), name="conv_in")(x)
        if self.lstm:
            x = _LSTM(mult * self.n_filters, self.lstm, name="lstm")(x)
        for bi, ratio in enumerate(self.ratios):
            x = jax.nn.elu(x)
            x = WNConvTranspose1d(mult * self.n_filters, mult * self.n_filters // 2,
                                  ratio * 2, stride=ratio, padding=math.ceil(ratio / 2),
                                  name=f"up{bi}")(x)
            for j in range(self.n_residual_layers):
                x = SEANetResnetBlock(
                    mult * self.n_filters // 2,
                    kernel_sizes=(self.residual_kernel_size, 1),
                    dilations=(self.dilation_base**j, 1),
                    name=f"block{bi}_res{j}",
                )(x)
            mult //= 2
        x = jax.nn.elu(x)
        x = WNConv1d(self.n_filters, self.channels, self.last_kernel_size,
                     padding=_same_pad(self.last_kernel_size), name="conv_out")(x)
        if self.final_activation == "tanh":
            x = jnp.tanh(x)
        return x
