"""Spectral losses (native JAX port of the auraloss subset the reference
vendors: `training/losses/auraloss.py:40-611`).

Includes SumAndDifference mid/side extraction, A-weighting FIR prefilter
(designed host-side with scipy bilinear+firls exactly like the reference),
SpectralConvergenceLoss, STFTMagnitudeLoss, STFTLoss (mel scale supported via
a native slaney-style mel filterbank), MultiResolutionSTFTLoss, and
SumAndDifferenceSTFTLoss.

The STFT matches torch.stft semantics (center=True, reflect pad, hann
window, one-sided) so loss curves are comparable with the reference.
All loss math runs in fp32 on device; the MRSTFT stack (7 FFT sizes x 3-4
signals) fuses into one XLA program.

Audio layout here is [B, C, T] (these operate on waveforms at the public
boundary, matching the reference's call sites).
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np


def _hann_window(n: int) -> np.ndarray:
    # torch.hann_window(n, periodic=True)
    return 0.5 * (1 - np.cos(2 * np.pi * np.arange(n) / n))


def _stft_reim(x, fft_size, hop_size, win_length, window):
    """Shared framed rDFT: torch.stft padding semantics, (re, im) each
    [N, frames, fft//2+1]. On TPU the framing+DFT runs as MXU GEMMs
    (ops/stft.py framed_dft_reim) instead of gather + jnp.fft.rfft."""
    from ...ops.stft import framed_dft_reim

    pad = fft_size // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    t = x.shape[-1]
    n_frames = 1 + (t - fft_size) // hop_size
    if win_length < fft_size:
        lpad = (fft_size - win_length) // 2
        win = jnp.pad(window, (lpad, fft_size - win_length - lpad))
    else:
        win = window
    return framed_dft_reim(x, fft_size, hop_size, win, n_frames)


def stft_complex(x: jnp.ndarray, fft_size: int, hop_size: int, win_length: int,
                 window: jnp.ndarray) -> jnp.ndarray:
    """torch.stft-compatible complex STFT. x: [N, T] -> [N, fft//2+1, frames]."""
    re, im = _stft_reim(x, fft_size, hop_size, win_length, window)
    return jax.lax.complex(re, im).transpose(0, 2, 1)


def stft_mag(x: jnp.ndarray, fft_size: int, hop_size: int, win_length: int,
             window: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """torch.stft-compatible magnitude. x: [N, T] -> [N, fft//2+1, frames]."""
    re, im = _stft_reim(x, fft_size, hop_size, win_length, window)
    mag = jnp.sqrt(jnp.maximum(re ** 2 + im ** 2, eps))
    return mag.transpose(0, 2, 1)


def design_a_weighting_fir(fs: int, ntaps: int = 101) -> np.ndarray:
    """IEC 1672 analog A-weighting -> bilinear -> 101-tap FIR via firls
    (reference auraloss.py:119-149)."""
    import scipy.signal

    f1, f2, f3, f4 = 20.598997, 107.65265, 737.86223, 12194.217
    A1000 = 1.9997
    NUMs = [(2 * np.pi * f4) ** 2 * (10 ** (A1000 / 20)), 0, 0, 0, 0]
    DENs = np.polymul(
        [1, 4 * np.pi * f4, (2 * np.pi * f4) ** 2],
        [1, 4 * np.pi * f1, (2 * np.pi * f1) ** 2],
    )
    DENs = np.polymul(np.polymul(DENs, [1, 2 * np.pi * f3]), [1, 2 * np.pi * f2])
    b, a = scipy.signal.bilinear(NUMs, DENs, fs=fs)
    w_iir, h_iir = scipy.signal.freqz(b, a, worN=512, fs=fs)
    taps = scipy.signal.firls(ntaps, w_iir, abs(h_iir), fs=fs)
    return taps.astype(np.float32)


class FIRFilter:
    """FIR pre-emphasis ("hp", "fd", "aw") applied to input AND target
    (reference auraloss.py:73-166)."""

    def __init__(self, filter_type: str = "hp", coef: float = 0.85, fs: int = 44100, ntaps: int = 101):
        self.filter_type = filter_type
        self.ntaps = ntaps
        if filter_type == "hp":
            taps = np.array([1, -coef, 0], np.float32)
            self.pad = 1
        elif filter_type == "fd":
            taps = np.array([1, 0, -coef], np.float32)
            self.pad = 1
        elif filter_type == "aw":
            if ntaps % 2 == 0:
                raise ValueError(f"ntaps must be odd (ntaps={ntaps}).")
            taps = design_a_weighting_fir(fs, ntaps)
            self.pad = ntaps // 2
        else:
            raise ValueError(filter_type)
        self.taps = jnp.asarray(taps)

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: [N, T] -> filtered [N, T].

        lax.conv_general_dilated is CROSS-correlation exactly like
        torch.conv1d (verified empirically) — no kernel flip. The previous
        flip mirrored asymmetric filters ("hp"/"fd"); the shipped "aw" taps
        are symmetric, so A-weighting was unaffected."""
        k = self.taps
        return jax.lax.conv_general_dilated(
            x[:, :, None], k[:, None, None],
            window_strides=(1,), padding=[(self.pad, self.pad)],
            dimension_numbers=("NWC", "WIO", "NWC"),
        )[:, :, 0]


def mel_filterbank(sr: int, n_fft: int, n_mels: int, fmin: float = 0.0,
                   fmax: tp.Optional[float] = None) -> np.ndarray:
    """Slaney-style mel filterbank (librosa.filters.mel parity)."""
    fmax = fmax or sr / 2

    def hz_to_mel(f):
        f = np.asarray(f, np.float64)
        mel = f / (200.0 / 3)
        log_region = f >= 1000.0
        mel = np.where(log_region, 15.0 + np.log(np.maximum(f, 1e-10) / 1000.0) / (np.log(6.4) / 27.0), mel)
        return mel

    def mel_to_hz(m):
        m = np.asarray(m, np.float64)
        f = m * (200.0 / 3)
        log_region = m >= 15.0
        f = np.where(log_region, 1000.0 * np.exp((np.log(6.4) / 27.0) * (m - 15.0)), f)
        return f

    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    mel_pts = mel_to_hz(np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2))
    fdiff = np.diff(mel_pts)
    ramps = mel_pts[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_pts[2 : n_mels + 2] - mel_pts[:n_mels])
    weights *= enorm[:, None]
    return weights.astype(np.float32)


def chroma_filterbank(sr: int, n_fft: int, n_chroma: int = 12, tuning: float = 0.0,
                      ctroct: float = 5.0, octwidth: float = 2.0,
                      base_c: bool = True) -> np.ndarray:
    """librosa.filters.chroma parity (the reference's chroma STFT scale,
    reference training/losses/auraloss.py:341-348): Gaussian-bumped
    wrapped-pitch-class weights over FFT bins, L2-normalized per bin, with an
    octave-centered Gaussian taper and C-based rotation."""
    frequencies = np.linspace(0, sr, n_fft, endpoint=False)[1:]
    a440 = 440.0 * 2.0 ** (tuning / n_chroma)
    frqbins = n_chroma * np.log2(frequencies / (a440 / 16))
    frqbins = np.concatenate(([frqbins[0] - 1.5 * n_chroma], frqbins))
    binwidthbins = np.concatenate((np.maximum(frqbins[1:] - frqbins[:-1], 1.0), [1.0]))
    d = np.subtract.outer(frqbins, np.arange(0, n_chroma, dtype="d")).T
    half = np.round(float(n_chroma) / 2)
    d = np.remainder(d + half + 10 * n_chroma, n_chroma) - half
    wts = np.exp(-0.5 * (2 * d / np.tile(binwidthbins, (n_chroma, 1))) ** 2)
    norm = np.sqrt(np.sum(wts ** 2, axis=0, keepdims=True))
    wts = wts / np.maximum(norm, np.finfo(np.float64).tiny)
    if octwidth is not None:
        wts *= np.tile(np.exp(-0.5 * (((frqbins / n_chroma - ctroct) / octwidth) ** 2)),
                       (n_chroma, 1))
    if base_c:
        wts = np.roll(wts, -3 * (n_chroma // 12), axis=0)
    return np.ascontiguousarray(wts[:, : int(1 + n_fft / 2)], dtype=np.float32)


def spectral_convergence(x_mag, y_mag):
    """(reference auraloss.py:169-179)."""
    num = jnp.sqrt(jnp.sum((y_mag - x_mag) ** 2, axis=(-2, -1)))
    den = jnp.sqrt(jnp.sum(y_mag**2, axis=(-2, -1)))
    return (num / jnp.maximum(den, 1e-12)).mean()


def stft_magnitude_loss(x_mag, y_mag, log=True, distance="L1", log_eps=0.0, log_fac=1.0):
    """(reference auraloss.py:182-222)."""
    if log:
        x_mag = jnp.log(log_fac * x_mag + log_eps) if log_eps else jnp.log(log_fac * x_mag)
        y_mag = jnp.log(log_fac * y_mag + log_eps) if log_eps else jnp.log(log_fac * y_mag)
    if distance == "L1":
        return jnp.abs(x_mag - y_mag).mean()
    if distance == "L2":
        return jnp.square(x_mag - y_mag).mean()
    raise ValueError(f"Invalid distance: '{distance}'.")


class STFTLoss:
    """(reference auraloss.py:225-444)."""

    def __init__(
        self,
        fft_size: int = 1024,
        hop_size: int = 256,
        win_length: int = 1024,
        window: str = "hann_window",
        w_sc: float = 1.0,
        w_log_mag: float = 1.0,
        w_lin_mag: float = 0.0,
        w_phs: float = 0.0,
        sample_rate: tp.Optional[int] = None,
        scale: tp.Optional[str] = None,
        n_bins: tp.Optional[int] = None,
        perceptual_weighting: bool = False,
        scale_invariance: bool = False,
        eps: float = 1e-8,
        output: str = "loss",
        reduction: str = "mean",
        mag_distance: str = "L1",
        device=None,
        **kwargs,
    ):
        assert window == "hann_window", "only hann windows are used by shipped configs"
        if reduction != "mean":
            raise NotImplementedError(
                f"STFTLoss reduction={reduction!r}: only 'mean' is implemented "
                "(shipped configs use it); refusing to silently apply a "
                "different reduction than configured")
        self.log_eps = float(kwargs.pop("log_eps", 0.0))
        self.log_fac = float(kwargs.pop("log_fac", 1.0))
        self.fft_size, self.hop_size, self.win_length = fft_size, hop_size, win_length
        self.window = jnp.asarray(_hann_window(win_length), jnp.float32)
        self.w_sc, self.w_log_mag, self.w_lin_mag, self.w_phs = w_sc, w_log_mag, w_lin_mag, w_phs
        self.scale_invariance = scale_invariance
        self.eps = eps
        self.output = output
        self.mag_distance = mag_distance
        self.scale = scale
        self.fb = None
        if scale is not None:
            assert sample_rate is not None and n_bins is not None
            if scale == "mel":
                self.fb = jnp.asarray(mel_filterbank(sample_rate, fft_size, n_bins))
            elif scale == "chroma":
                assert n_bins <= fft_size, "Must be more FFT bins than chroma bins"
                self.fb = jnp.asarray(chroma_filterbank(sample_rate, fft_size, n_chroma=n_bins))
            else:
                raise ValueError(f"Invalid scale: {scale}. Must be 'mel' or 'chroma'.")
        self.prefilter = None
        if perceptual_weighting:
            if sample_rate is None:
                raise ValueError("`sample_rate` must be supplied when `perceptual_weighting = True`.")
            self.prefilter = FIRFilter("aw", fs=sample_rate)

    def __call__(self, input: jnp.ndarray, target: jnp.ndarray,
                 skip_prefilter: bool = False):
        """input/target: [B, C, T]. `skip_prefilter=True` means the caller
        already applied this loss's perceptual prefilter (the multi-resolution
        wrappers hoist the identical FIR out of the per-scale loop: measured
        1.6 ms/signal/scale on v5e vs 0.3 ms for the whole framed DFT —
        7 scales re-filtering the same signal was ~90% of the loss cost)."""
        bs, chs, t = input.shape
        x = input.reshape(bs * chs, t).astype(jnp.float32)
        y = target.reshape(bs * chs, t).astype(jnp.float32)
        if self.prefilter is not None and not skip_prefilter:
            x = self.prefilter(x)
            y = self.prefilter(y)
        x_mag = stft_mag(x, self.fft_size, self.hop_size, self.win_length, self.window, self.eps)
        y_mag = stft_mag(y, self.fft_size, self.hop_size, self.win_length, self.window, self.eps)
        if self.fb is not None:
            x_mag = jnp.einsum("mf,nft->nmt", self.fb, x_mag)
            y_mag = jnp.einsum("mf,nft->nmt", self.fb, y_mag)
        if self.scale_invariance:
            alpha = (x_mag * y_mag).sum((-2, -1)) / jnp.maximum((y_mag**2).sum((-2, -1)), 1e-12)
            y_mag = y_mag * alpha[:, None, None]
        sc = spectral_convergence(x_mag, y_mag) if self.w_sc else 0.0
        logm = stft_magnitude_loss(x_mag, y_mag, log=True, distance=self.mag_distance,
                                   log_eps=self.log_eps, log_fac=self.log_fac) if self.w_log_mag else 0.0
        linm = stft_magnitude_loss(x_mag, y_mag, log=False, distance=self.mag_distance) if self.w_lin_mag else 0.0
        phs = 0.0
        if self.w_phs:
            xs = stft_complex(x, self.fft_size, self.hop_size, self.win_length, self.window)
            ys = stft_complex(y, self.fft_size, self.hop_size, self.win_length, self.window)
            x_phs = jnp.arctan2(xs.imag, xs.real)
            y_phs = jnp.arctan2(ys.imag, ys.real)
            phs = jnp.square(x_phs - y_phs).mean()
        loss = self.w_sc * sc + self.w_log_mag * logm + self.w_lin_mag * linm + self.w_phs * phs
        if self.output == "full":
            return loss, sc, logm, linm, phs
        return loss


class MultiResolutionSTFTLoss:
    """(reference auraloss.py:447-535)."""

    def __init__(
        self,
        fft_sizes: tp.Sequence[int] = (1024, 2048, 512),
        hop_sizes: tp.Sequence[int] = (120, 240, 50),
        win_lengths: tp.Sequence[int] = (600, 1200, 240),
        window: str = "hann_window",
        **kwargs,
    ):
        assert len(fft_sizes) == len(hop_sizes) == len(win_lengths)
        self.stft_losses = [
            STFTLoss(fs, hs, wl, window, **kwargs)
            for fs, hs, wl in zip(fft_sizes, hop_sizes, win_lengths)
        ]

    def __call__(self, input, target):
        skip = False
        pf = self.stft_losses[0].prefilter if self.stft_losses else None
        if pf is not None:
            # every scale shares one prefilter config (constructed from the
            # same kwargs): apply the FIR once, not once per scale
            bs, chs, t = input.shape
            input = pf(input.reshape(bs * chs, t).astype(jnp.float32)).reshape(bs, chs, t)
            target = pf(target.reshape(bs * chs, t).astype(jnp.float32)).reshape(bs, chs, t)
            skip = True
        loss = 0.0
        for f in self.stft_losses:
            loss = loss + f(input, target, skip_prefilter=skip)
        return loss / len(self.stft_losses)


class SumAndDifference:
    """Mid/side extraction (reference auraloss.py:40-70). [B, 2, T]."""

    @staticmethod
    def sum(x):
        return x[:, 0, :] + x[:, 1, :]

    @staticmethod
    def diff(x):
        return x[:, 0, :] - x[:, 1, :]

    def __call__(self, x):
        assert x.shape[1] == 2, f"Input must be stereo: {x.shape[1]} channel(s)."
        return self.sum(x)[:, None, :], self.diff(x)[:, None, :]


class SumAndDifferenceSTFTLoss:
    """(reference auraloss.py:538-611)."""

    def __init__(self, fft_sizes, hop_sizes, win_lengths, window="hann_window",
                 w_sum: float = 1.0, w_diff: float = 1.0, output: str = "loss", **kwargs):
        self.sd = SumAndDifference()
        self.w_sum, self.w_diff = w_sum, w_diff
        self.output = output
        self.mrstft = MultiResolutionSTFTLoss(fft_sizes, hop_sizes, win_lengths, window, **kwargs)

    def __call__(self, input, target):
        input_sum, input_diff = self.sd(input)
        target_sum, target_diff = self.sd(target)
        sum_loss = self.mrstft(input_sum, target_sum)
        diff_loss = self.mrstft(input_diff, target_diff)
        loss = (self.w_sum * sum_loss + self.w_diff * diff_loss) / 2
        if self.output == "full":
            return loss, sum_loss, diff_loss
        return loss
