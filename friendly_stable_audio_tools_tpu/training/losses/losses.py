"""Named/weighted loss composition framework.

Parity target: reference `training/losses/losses.py:7-107`.

Loss modules are plain callables over an `info` dict of jnp arrays; MultiLoss
sums weighted values and returns the per-loss dict. Everything is pure and
jit-friendly.
"""

from __future__ import annotations

import typing as tp

import jax.numpy as jnp


class LossModule:
    def __init__(self, name: str, weight: float = 1.0):
        self.name = name
        self.weight = float(weight)

    def __call__(self, info: dict) -> jnp.ndarray:
        raise NotImplementedError


class ValueLoss(LossModule):
    """Pull an already-computed scalar out of the info dict (reference :21-28)."""

    def __init__(self, key: str, name: str, weight: float = 1.0):
        super().__init__(name=name, weight=weight)
        self.key = key

    def __call__(self, info):
        return self.weight * info[self.key]


class L1Loss(LossModule):
    def __init__(self, key_a: str, key_b: str, weight: float = 1.0,
                 mask_key: tp.Optional[str] = None, name: str = "l1_loss"):
        super().__init__(name=name, weight=weight)
        self.key_a, self.key_b, self.mask_key = key_a, key_b, mask_key

    def __call__(self, info):
        diff = jnp.abs(info[self.key_a].astype(jnp.float32) - info[self.key_b].astype(jnp.float32))
        if self.mask_key is not None and info.get(self.mask_key) is not None:
            mask = info[self.mask_key]
            if mask.ndim == 2 and diff.ndim == 3:
                mask = mask[:, :, None]
            diff = jnp.where(mask, diff, 0.0)
            loss = diff.sum() / jnp.maximum(jnp.broadcast_to(mask, diff.shape).sum(), 1.0)
        else:
            loss = diff.mean()
        return self.weight * loss


class MSELoss(LossModule):
    """Masked MSE (reference :48-80); mask [B, T] broadcasts over channels."""

    def __init__(self, key_a: str, key_b: str, weight: float = 1.0,
                 mask_key: tp.Optional[str] = None, name: str = "mse_loss"):
        super().__init__(name=name, weight=weight)
        self.key_a, self.key_b, self.mask_key = key_a, key_b, mask_key

    def __call__(self, info):
        a = info[self.key_a].astype(jnp.float32)
        b = info[self.key_b].astype(jnp.float32)
        sq = jnp.square(a - b)
        if self.mask_key is not None and info.get(self.mask_key) is not None:
            mask = info[self.mask_key]
            if mask.ndim == 2 and sq.ndim == 3:
                mask = mask[:, :, None]  # [B, T, 1] channels-last
            sq = jnp.where(mask, sq, 0.0)
            loss = sq.sum() / jnp.maximum(jnp.broadcast_to(mask, sq.shape).sum(), 1.0)
        else:
            loss = sq.mean()
        return self.weight * loss


class AuralossLoss(LossModule):
    """Adapter for the spectral losses in auraloss.py (reference :83-95)."""

    def __init__(self, auraloss_module, input_key: str, target_key: str,
                 name: str, weight: float = 1.0):
        super().__init__(name, weight)
        self.auraloss_module = auraloss_module
        self.input_key = input_key
        self.target_key = target_key

    def __call__(self, info):
        return self.weight * self.auraloss_module(info[self.input_key], info[self.target_key])


class MultiLoss:
    """Sum of weighted losses + per-loss dict (reference :98-107)."""

    def __init__(self, losses: tp.Sequence[LossModule]):
        self.losses = list(losses)

    def __call__(self, info):
        total = jnp.asarray(0.0, jnp.float32)
        individual = {}
        for m in self.losses:
            v = m(info)
            total = total + v
            individual[m.name] = v
        return total, individual
