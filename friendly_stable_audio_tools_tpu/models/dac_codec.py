"""Descript Audio Codec (DAC) encoder/decoder architecture, native JAX.

The reference wraps `dac.model.dac.Encoder/Decoder`
(reference models/autoencoders.py:197-231: DACEncoderWrapper/DACDecoderWrapper)
— weight-normalized conv stacks with single-parameter Snake activations,
dilated residual units (1/3/9), strided down/up-sampling. Used by
`dac_2048_32_vae.json` / `stable_audio_1_0_vae.json` encoder/decoder types.

Layout: channels-last [B, T, C].
"""

from __future__ import annotations

import math
import typing as tp

import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import Snake
from ..ops.convs import WNConv1d, WNConvTranspose1d


class DACResidualUnit(nn.Module):
    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake(self.dim, name="snake1")(x)
        y = WNConv1d(self.dim, self.dim, 7, dilation=self.dilation, padding=pad, name="conv1")(y)
        y = Snake(self.dim, name="snake2")(y)
        y = WNConv1d(self.dim, self.dim, 1, name="conv2")(y)
        return x + y


class DACEncoderBlock(nn.Module):
    dim: int  # output dim
    stride: int

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate((1, 3, 9)):
            x = DACResidualUnit(self.dim // 2, d, name=f"res{i}")(x)
        x = Snake(self.dim // 2, name="snake")(x)
        x = WNConv1d(self.dim // 2, self.dim, 2 * self.stride, stride=self.stride,
                     padding=math.ceil(self.stride / 2), name="down")(x)
        return x


class DACEncoder(nn.Module):
    """dac.model.dac.Encoder: d_model doubles per stride."""

    d_model: int = 64
    strides: tp.Sequence[int] = (2, 4, 8, 8)
    d_latent: int = 64
    in_channels: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.d_model
        x = WNConv1d(self.in_channels, d, 7, padding=3, name="conv_in")(x)
        for i, s in enumerate(self.strides):
            d *= 2
            x = DACEncoderBlock(d, s, name=f"block{i}")(x)
        x = Snake(d, name="snake_out")(x)
        x = WNConv1d(d, self.d_latent, 3, padding=1, name="conv_out")(x)
        return x


class DACDecoderBlock(nn.Module):
    in_dim: int
    out_dim: int
    rate: int

    @nn.compact
    def __call__(self, x):
        x = Snake(self.in_dim, name="snake")(x)
        x = WNConvTranspose1d(self.in_dim, self.out_dim, 2 * self.rate, stride=self.rate,
                              padding=math.ceil(self.rate / 2), name="up")(x)
        for i, d in enumerate((1, 3, 9)):
            x = DACResidualUnit(self.out_dim, d, name=f"res{i}")(x)
        return x


class DACDecoder(nn.Module):
    """dac.model.dac.Decoder."""

    input_channel: int = 64
    channels: int = 1536
    rates: tp.Sequence[int] = (8, 8, 4, 2)
    d_out: int = 1

    @nn.compact
    def __call__(self, x):
        x = WNConv1d(self.input_channel, self.channels, 7, padding=3, name="conv_in")(x)
        ch = self.channels
        for i, r in enumerate(self.rates):
            x = DACDecoderBlock(ch, ch // 2, r, name=f"block{i}")(x)
            ch //= 2
        x = Snake(ch, name="snake_out")(x)
        x = WNConv1d(ch, self.d_out, 7, padding=3, name="conv_out")(x)
        return jnp.tanh(x)


class DACEncoderWrapper(nn.Module):
    """reference autoencoders.py:197-219."""

    in_channels: int = 1
    latent_dim: tp.Optional[int] = None
    d_model: int = 64
    strides: tp.Sequence[int] = (2, 4, 8, 8)

    @nn.compact
    def __call__(self, x):
        encoder_out_dim = self.d_model * (2 ** len(self.strides))
        x = DACEncoder(d_model=self.d_model, strides=self.strides,
                       d_latent=encoder_out_dim, in_channels=self.in_channels,
                       name="encoder")(x)
        if self.latent_dim is not None:
            fan_in = encoder_out_dim
            x = nn.Dense(self.latent_dim, param_dtype=jnp.float32, name="proj_out")(x)
        return x


class DACDecoderWrapper(nn.Module):
    """reference autoencoders.py:222-231."""

    latent_dim: int
    out_channels: int = 1
    channels: int = 1536
    rates: tp.Sequence[int] = (8, 8, 4, 2)

    @nn.compact
    def __call__(self, x):
        return DACDecoder(input_channel=self.latent_dim, channels=self.channels,
                          rates=self.rates, d_out=self.out_channels, name="decoder")(x)
