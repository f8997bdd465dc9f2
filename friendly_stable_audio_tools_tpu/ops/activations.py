"""Pointwise activations for the audio stacks.

Snake / SnakeBeta follow the BigVGAN formulation used by the reference
(`models/blocks.py:318-358`): periodic activations with per-channel learned
frequency (alpha) and magnitude (beta), optionally parameterized in log scale.
XLA fuses these into surrounding convolutions; on TPU the VPU executes the
sin/pow chain, so no hand-written kernel is needed for the pointwise math
itself (the conv+snake fusion lives in ops/pallas when profitable).

Layout: all activations here operate on channels-LAST arrays [..., C]
(TPU-friendly lane mapping), unlike the reference's [B, C, T].
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp
from flax import linen as nn

_EPS = 1e-9


def snake_beta(x: jnp.ndarray, alpha: jnp.ndarray, beta: jnp.ndarray) -> jnp.ndarray:
    """x + (1/beta) * sin^2(alpha * x)  (reference: models/blocks.py:318-319)."""
    # sin^2 written via cos(2ax) keeps one transcendental on the VPU.
    return x + (0.5 / (beta + _EPS)) * (1.0 - jnp.cos(2.0 * alpha * x))


class SnakeBeta(nn.Module):
    """Per-channel snake activation with learned alpha/beta.

    Matches `SnakeBeta` in the reference (models/blocks.py:330-358): log-scale
    parameters initialized to zeros (=> alpha=beta=1 effective), linear-scale
    initialized to ones.
    """

    features: int
    alpha_logscale: bool = True

    def setup(self):
        init = nn.initializers.zeros if self.alpha_logscale else nn.initializers.ones
        self.alpha = self.param("alpha", init, (self.features,), jnp.float32)
        self.beta = self.param("beta", init, (self.features,), jnp.float32)

    def effective(self):
        """(alpha_eff, inv_beta_eff) for fused snake->conv kernels."""
        alpha = jnp.exp(self.alpha) if self.alpha_logscale else self.alpha
        beta = jnp.exp(self.beta) if self.alpha_logscale else self.beta
        return alpha, 1.0 / (beta + _EPS)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = jnp.exp(self.alpha) if self.alpha_logscale else self.alpha
        beta = jnp.exp(self.beta) if self.alpha_logscale else self.beta
        dtype = x.dtype
        return snake_beta(x, alpha.astype(dtype), beta.astype(dtype))


class Snake(nn.Module):
    """Single-parameter snake: x + (1/alpha) sin^2(alpha x) (dac.nn.layers.Snake1d
    behavior relied on by the reference's DAC encoder path)."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        alpha = self.param("alpha", nn.initializers.ones, (self.features,), jnp.float32)
        alpha = alpha.astype(x.dtype)
        return x + (0.5 / (alpha + _EPS)) * (1.0 - jnp.cos(2.0 * alpha * x))


class _Elu(nn.Module):
    @nn.compact
    def __call__(self, x):
        return nn.elu(x)


class _Identity(nn.Module):
    @nn.compact
    def __call__(self, x):
        return x


def get_activation(
    activation: tp.Literal["elu", "snake", "none"],
    antialias: bool = False,
    channels: tp.Optional[int] = None,
    name: tp.Optional[str] = None,
) -> nn.Module:
    """Activation factory (reference: models/autoencoders.py:29-42).

    `antialias` in the reference wraps the activation in alias-free up/down
    resampling (alias_free_torch.Activation1d). That costs 2x resampling convs
    per activation; here it is accepted for config parity but implemented as
    the plain activation (the anti-aliased variant is not used by any shipped
    config).
    """
    if activation == "elu":
        return _Elu(name=name)
    if activation == "snake":
        assert channels is not None
        return SnakeBeta(features=channels, name=name)
    if activation == "none":
        return _Identity(name=name)
    raise ValueError(f"Unknown activation {activation}")
