"""Pseudo-QMF polyphase filterbank.

Parity target: reference `models/pqmf.py:10-401` — Kaiser-designed prototype
filter optimized by Nelder-Mead over the cutoff, cosine-modulated filter
bank, polyphase analysis/synthesis with alias cancellation.

Filter design happens host-side with scipy at construction; the hot
analysis/synthesis paths are single grouped XLA convolutions.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def design_kaiser_lowpass(angular_cutoff: float, attenuation: float, filter_length=None) -> np.ndarray:
    from scipy.signal import firwin, kaiserord

    estimated_length, beta = kaiserord(attenuation, angular_cutoff / np.pi)
    estimated_length = 2 * (estimated_length // 2) + 1
    if filter_length is None:
        filter_length = estimated_length
    return firwin(filter_length, angular_cutoff, window=("kaiser", beta), scale=False, fs=2 * np.pi)


def evaluate_filter_objective(angular_cutoff, attenuation, num_bands, filter_length) -> float:
    h = design_kaiser_lowpass(angular_cutoff, attenuation, filter_length)
    conv = np.convolve(h, h[::-1], "full")
    return float(np.max(np.abs(conv[conv.shape[-1] // 2 :: 2 * num_bands][1:])))


def design_prototype_filter(attenuation, num_bands, filter_length=None) -> np.ndarray:
    from scipy.optimize import fmin

    cutoff = fmin(
        lambda w: evaluate_filter_objective(w, attenuation, num_bands, filter_length),
        1 / num_bands, disp=0,
    )[0]
    return design_kaiser_lowpass(cutoff, attenuation, filter_length).astype(np.float32)


def generate_modulated_filter_bank(prototype: np.ndarray, num_bands: int) -> np.ndarray:
    sub = np.arange(num_bands).reshape(-1, 1)
    L = prototype.shape[-1]
    t = np.arange(-(L // 2), (L // 2) + 1)
    phase = (-1) ** sub * np.pi / 4
    modulation = np.cos((2 * sub + 1) * np.pi / (2 * num_bands) * t + phase)
    return (2 * prototype * modulation).astype(np.float32)


def pad_to_nearest_power_of_two(x: np.ndarray) -> np.ndarray:
    cur = x.shape[-1]
    target = 2 ** math.ceil(math.log2(cur))
    total = target - cur
    lo = total // 2
    return np.pad(x, [(0, 0)] * (x.ndim - 1) + [(lo, total - lo)])


def _alias_cancel(x: jnp.ndarray) -> jnp.ndarray:
    """Invert every second element of every second band (reference :260-290).
    x: [..., bands, time]."""
    mask = np.ones((x.shape[-2], x.shape[-1]), np.float32)
    mask[1::2, ::2] = -1
    return x * jnp.asarray(mask)


class PQMF:
    def __init__(self, attenuation: int, num_bands: int):
        assert math.log2(num_bands) == int(math.log2(num_bands)), "'num_bands' must be a power of 2."
        prototype = design_prototype_filter(attenuation, num_bands)
        bank = generate_modulated_filter_bank(prototype, num_bands)
        self.filter_bank = jnp.asarray(pad_to_nearest_power_of_two(bank))  # [bands, L]
        self.prototype = jnp.asarray(prototype)
        self.num_bands = num_bands

    # [B, C, T] reference-layout API -----------------------------------------

    def forward(self, signal: jnp.ndarray) -> jnp.ndarray:
        """[B, C, T] -> [B, C, bands, T/bands] (reference :37-45)."""
        n = self.num_bands
        b, c, t = signal.shape
        rem = t % n
        if rem:
            signal = jnp.pad(signal, ((0, 0), (0, 0), (0, n - rem)))
            t = signal.shape[-1]
        # polyphase analysis (reference :315-350)
        x = signal.reshape(b * c, t // n, n).transpose(0, 2, 1)  # [(bc), n, t/n]
        fb = self.filter_bank.reshape(n, -1, n).transpose(0, 2, 1)  # [bands, n, L/n]
        pad = fb.shape[-1] // 2
        y = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 1), fb.transpose(2, 1, 0),
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ).transpose(0, 2, 1)
        y = y[..., :-1]
        y = y.reshape(b, c, n, -1)
        return _alias_cancel(y)

    def inverse(self, bands: jnp.ndarray) -> jnp.ndarray:
        """[B, C, bands, T'] -> [B, C, T] (reference :47-50, :352-401)."""
        n = self.num_bands
        bands = _alias_cancel(bands)
        b, c, _, t = bands.shape
        fb = jnp.flip(self.filter_bank, -1).reshape(n, -1, n).transpose(2, 0, 1)  # [n, bands, L/n]
        x = bands.reshape(b * c, n, t)
        pad = fb.shape[-1] // 2 + 1
        y = jax.lax.conv_general_dilated(
            x.transpose(0, 2, 1), fb.transpose(2, 1, 0),
            window_strides=(1,), padding=[(pad, pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        ).transpose(0, 2, 1)
        y = y[..., :-1] * n
        y = jnp.flip(y, 1)
        y = y.transpose(0, 2, 1).reshape(b, c, -1)
        L_over_n = self.filter_bank.shape[-1] // n
        return y[..., 2 * L_over_n :]

    # channels-last internal API ---------------------------------------------

    def forward_nwc(self, x: jnp.ndarray) -> jnp.ndarray:
        """[B, T, C] -> [B, T/bands, C*bands] (pretransform layout)."""
        y = self.forward(x.transpose(0, 2, 1))  # [B, C, n, T/n]
        b, c, n, t = y.shape
        return y.reshape(b, c * n, t).transpose(0, 2, 1)

    def inverse_nwc(self, z: jnp.ndarray) -> jnp.ndarray:
        b, t, cn = z.shape
        n = self.num_bands
        y = z.transpose(0, 2, 1).reshape(b, cn // n, n, t)
        return self.inverse(y).transpose(0, 2, 1)
