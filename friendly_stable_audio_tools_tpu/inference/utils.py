"""Audio preparation helpers (reference `inference/utils.py:7-39`).

Host-side (numpy) — these run before data reaches the device.
"""

from __future__ import annotations

import math

import numpy as np


def set_audio_channels(audio: np.ndarray, target_channels: int) -> np.ndarray:
    """[B, C, T] channel coercion (reference inference/utils.py:7-17):
    target 1 -> downmix by mean; target 2 from mono -> duplicate."""
    audio = np.asarray(audio)
    if target_channels == 1:
        audio = audio.mean(1, keepdims=True)
    elif target_channels == 2 and audio.shape[1] == 1:
        audio = np.repeat(audio, 2, axis=1)
    elif audio.shape[1] > target_channels:
        audio = audio[:, :target_channels, :]
    return audio


def pad_crop(audio: np.ndarray, target_length: int) -> np.ndarray:
    """Pad with zeros or crop the trailing time axis to `target_length`."""
    t = audio.shape[-1]
    if t >= target_length:
        return audio[..., :target_length]
    pad = [(0, 0)] * (audio.ndim - 1) + [(0, target_length - t)]
    return np.pad(audio, pad)


def resample(audio: np.ndarray, in_sr: int, target_sr: int) -> np.ndarray:
    if in_sr == target_sr:
        return audio
    from scipy.signal import resample_poly

    g = math.gcd(int(in_sr), int(target_sr))
    return resample_poly(audio, target_sr // g, in_sr // g, axis=-1).astype(audio.dtype)


def prepare_audio(audio, in_sr: int, target_sr: int, target_length: int,
                  target_channels: int, device=None) -> np.ndarray:
    """(T,) | (C,T) | (B,C,T) -> [B, target_channels, target_length] at
    target_sr (reference inference/utils.py:20-39). `device` accepted for
    signature parity; placement happens when the array reaches jax."""
    audio = np.asarray(audio, dtype=np.float32)
    audio = resample(audio, in_sr, target_sr)
    if audio.ndim == 1:
        audio = audio[None, None, :]
    elif audio.ndim == 2:
        audio = audio[None, :, :]
    audio = pad_crop(audio, target_length)
    return set_audio_channels(audio, target_channels)
