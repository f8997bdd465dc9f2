"""Visualization helpers for demo logging.

Parity target: reference `training/viz.py:18-221` — mel `spectrogram_image`,
`tokens_spectrogram_image` latent heatmaps, and `pca_point_cloud` 3-D latent
PCA. matplotlib is optional; every function degrades to returning None when
it (or a downstream lib) is unavailable so demo callbacks never crash
training.
"""

from __future__ import annotations

import typing as tp

import numpy as np


def _get_plt():
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        return plt
    except Exception:
        return None


def audio_spectrogram_image(audio: np.ndarray, sample_rate: int = 44100,
                            n_fft: int = 1024, hop: int = 256, n_mels: int = 80):
    """Mel spectrogram PNG figure of (C, T) audio (reference viz.py:18-69)."""
    plt = _get_plt()
    if plt is None:
        return None
    from ..training.losses.auraloss import mel_filterbank, _hann_window

    audio = np.asarray(audio)
    mono = audio.mean(0) if audio.ndim == 2 else audio
    window = _hann_window(n_fft)
    pad = n_fft // 2
    x = np.pad(mono, (pad, pad), mode="reflect")
    frames = 1 + (len(x) - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(frames)[:, None]
    spec = np.abs(np.fft.rfft(x[idx] * window, axis=-1)) ** 2
    mel = mel_filterbank(sample_rate, n_fft, n_mels) @ spec.T
    db = 10 * np.log10(np.maximum(mel, 1e-10))

    fig, ax = plt.subplots(figsize=(6, 3))
    ax.imshow(db, aspect="auto", origin="lower", cmap="magma")
    ax.set_xlabel("frames")
    ax.set_ylabel("mel bin")
    fig.tight_layout()
    return fig


def tokens_spectrogram_image(latents: np.ndarray, title: str = "Latents"):
    """Latent channel-x-time heatmap (reference viz.py:72-107). latents [B,C,T]."""
    plt = _get_plt()
    if plt is None:
        return None
    z = np.asarray(latents)
    if z.ndim == 3:
        z = z[0]
    fig, ax = plt.subplots(figsize=(6, 3))
    ax.imshow(z, aspect="auto", origin="lower", cmap="coolwarm")
    ax.set_title(title)
    ax.set_xlabel("time")
    ax.set_ylabel("channel")
    fig.tight_layout()
    return fig


def pca_point_cloud(latents: np.ndarray):
    """3-D PCA of latent vectors (reference viz.py:110-221): returns an
    (N, 6) array of xyz+rgb points (plotly/wandb Object3D-compatible)."""
    z = np.asarray(latents)
    if z.ndim == 3:  # [B, C, T] -> [B*T, C]
        z = z.transpose(0, 2, 1).reshape(-1, z.shape[1])
    z = z - z.mean(0, keepdims=True)
    # top-3 principal components via SVD
    _, _, vt = np.linalg.svd(z, full_matrices=False)
    pts = z @ vt[:3].T
    t = np.linspace(0, 1, len(pts))
    colors = np.stack([t * 255, 255 - t * 255, np.full_like(t, 128)], axis=1)
    return np.concatenate([pts, colors], axis=1)
