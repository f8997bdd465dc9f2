"""Audio helpers (reference `utils/audio_utils.py:7-27`)."""

from __future__ import annotations

import numpy as np


def is_silence(audio, thresh: float = -60.0) -> bool:
    """dB-threshold silence check (reference :7-19)."""
    audio = np.asarray(audio)
    dBmax = 20 * np.log10(np.max(np.abs(audio)) + 1e-12)
    return bool(dBmax < thresh)


def float_to_int16_audio(x) -> np.ndarray:
    """[-1,1] float -> int16 pcm (reference :22-27)."""
    x = np.asarray(x, np.float32)
    peak = np.max(np.abs(x))
    if peak > 1.0:
        x = x / peak
    return (np.clip(x, -1.0, 1.0) * 32767.0).astype(np.int16)


def write_wav(path: str, sample_rate: int, audio) -> None:
    """Write (C, T) or (T,) float audio as 16-bit wav."""
    from scipy.io import wavfile

    audio = np.asarray(audio)
    if audio.ndim == 2:
        audio = audio.T  # (T, C)
    wavfile.write(path, int(sample_rate), float_to_int16_audio(audio))
