"""Crop/pad/channel/augmentation ops for the data pipeline (host-side numpy).

Parity target: reference `data/modification.py:11-108`.
Audio arrays are (C, T) float32 numpy.
"""

from __future__ import annotations

import math
import random
import typing as tp

import numpy as np


class PadCrop:
    """reference :11-23."""

    def __init__(self, n_samples: int, randomize: bool = True):
        self.n_samples = n_samples
        self.randomize = randomize

    def __call__(self, signal: np.ndarray) -> np.ndarray:
        n, s = signal.shape
        start = 0 if not self.randomize else random.randint(0, max(0, s - self.n_samples))
        end = start + self.n_samples
        output = np.zeros((n, self.n_samples), signal.dtype)
        output[:, : min(s, self.n_samples)] = signal[:, start:end]
        return output


class PadCrop_Normalized_T:
    """Random crop with normalized timing metadata + padding mask
    (reference :26-70). Returns (chunk, t_start, t_end, seconds_start,
    seconds_total, padding_mask)."""

    def __init__(self, n_samples: int, sample_rate: int, randomize: bool = True):
        self.n_samples = n_samples
        self.sample_rate = sample_rate
        self.randomize = randomize

    def __call__(self, source: np.ndarray):
        n_channels, n_samples = source.shape
        max_ofs = max(0, n_samples - self.n_samples)
        full_length = max_ofs + self.n_samples
        offset = random.randint(0, max_ofs) if (self.randomize and max_ofs) else 0

        t_start = offset / full_length
        t_end = (offset + self.n_samples) / full_length

        chunk = np.zeros((n_channels, self.n_samples), source.dtype)
        chunk[:, : min(n_samples, self.n_samples)] = source[:, offset : offset + self.n_samples]

        seconds_start = math.floor(offset / self.sample_rate)
        seconds_total = math.ceil(n_samples / self.sample_rate)

        padding_mask = np.zeros((self.n_samples,), np.float32)
        padding_mask[: min(n_samples, self.n_samples)] = 1

        return chunk, t_start, t_end, seconds_start, seconds_total, padding_mask


class Mono:
    """reference :75-78."""

    def __call__(self, x: np.ndarray) -> np.ndarray:
        assert x.ndim <= 2
        return x.mean(axis=0, keepdims=True) if x.ndim > 1 else x


class Stereo:
    """reference :81-94."""

    def __call__(self, x: np.ndarray) -> np.ndarray:
        assert x.ndim <= 2
        if x.ndim == 1:
            x = np.stack([x, x])
        elif x.ndim == 2:
            if x.shape[0] == 1:
                x = np.repeat(x, 2, axis=0)
            elif x.shape[0] > 2:
                x = x[:2, :]
        return x


class PhaseFlipper:
    """Random sign flip augmentation (reference :99-108)."""

    def __init__(self, p: float = 0.5):
        self.p = p

    def __call__(self, x: np.ndarray) -> np.ndarray:
        assert x.ndim <= 2
        return -x if random.random() < self.p else x
