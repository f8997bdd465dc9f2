"""Exponential moving average of parameters with a power-law warmup schedule.

Parity target: the reference uses `ema_pytorch.EMA(beta=0.9999, power=3/4,
update_every=1, update_after_step=1)` (training/diffusion.py:53-59 etc.):
decay_t = min(beta, (1 + step/inv_gamma)^(-power)) ... specifically
ema_pytorch computes `1 - (1 + step/inv_gamma)**-power` clamped to
[min_value, beta], with step offset by update_after_step.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp


def ema_decay(step, beta: float = 0.9999, power: float = 0.75, inv_gamma: float = 1.0,
              update_after_step: int = 1, min_value: float = 0.0):
    epoch = jnp.clip(step - update_after_step - 1, 0, None)
    value = 1 - (1 + epoch / inv_gamma) ** -power
    return jnp.where(epoch <= 0, 0.0, jnp.clip(value, min_value, beta))


def ema_update(ema_params, params, step, beta: float = 0.9999, power: float = 0.75,
               update_after_step: int = 1):
    """One EMA update; decay follows the ema-pytorch power schedule."""
    d = ema_decay(step, beta=beta, power=power, update_after_step=update_after_step)
    return jax.tree_util.tree_map(lambda e, p: e * d + p * (1.0 - d), ema_params, params)
