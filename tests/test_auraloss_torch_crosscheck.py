"""Value-level torch cross-check for the spectral loss stack.

The reference vendors auraloss (reference training/losses/auraloss.py:225-611);
this file transcribes that torch math line-by-line IN-TEST (torch.stft,
A-weighting FIR conv1d, spectral-convergence + log/lin magnitude losses,
multi-resolution stacking, sum/difference) and diffs values against our JAX
implementation on fixed signals — the same pattern as
tests/test_sampler_torch_crosscheck.py.

librosa is not installed in this environment, so for the mel/chroma scales
BOTH sides consume our numpy filterbank (mel_filterbank / chroma_filterbank);
the filterbanks' librosa parity is property-tested in tests/test_stft_adp.py.
Everything else (STFT semantics, window, reflect padding, FIR, loss math,
weighting, resolution averaging) is checked against torch end to end.
"""

import numpy as np
import pytest
import torch

from friendly_stable_audio_tools_tpu.training.losses.auraloss import (
    STFTLoss,
    MultiResolutionSTFTLoss,
    SumAndDifferenceSTFTLoss,
    chroma_filterbank,
    design_a_weighting_fir,
    mel_filterbank,
)


# ---------------------------------------------------------------------------
# Reference transcription (reference training/losses/auraloss.py)
# ---------------------------------------------------------------------------


def _t_stft_mag(x, fft_size, hop_size, win_length, eps=1e-8):
    """reference auraloss.py:372-383 (torch.stft, hann, clamp+sqrt)."""
    window = torch.hann_window(win_length)
    spec = torch.stft(x, fft_size, hop_size, win_length, window, return_complex=True)
    return torch.sqrt(torch.clamp(spec.real ** 2 + spec.imag ** 2, min=eps))


def _t_spectral_convergence(x_mag, y_mag):
    """reference auraloss.py:169-180."""
    return (torch.norm(y_mag - x_mag, p="fro", dim=[-1, -2])
            / torch.norm(y_mag, p="fro", dim=[-1, -2])).mean()


def _t_mag_loss(x_mag, y_mag, log, distance="L1", log_eps=0.0, log_fac=1.0):
    """reference auraloss.py:219-223."""
    if log:
        x_mag = torch.log(log_fac * x_mag + log_eps)
        y_mag = torch.log(log_fac * y_mag + log_eps)
    if distance == "L1":
        return torch.nn.functional.l1_loss(x_mag, y_mag)
    return torch.nn.functional.mse_loss(x_mag, y_mag)


def _t_stft_loss(x, y, fft_size, hop_size, win_length, w_sc=1.0, w_log_mag=1.0,
                 w_lin_mag=0.0, fb=None, aw_taps=None, eps=1e-8):
    """reference auraloss.py:385-441 (STFTLoss.forward, reduction='mean')."""
    bs, chs, t = x.shape
    if aw_taps is not None:  # reference auraloss.py:160-166 (FIRFilter.forward)
        ntaps = aw_taps.numel()
        w = aw_taps.view(1, 1, -1)
        x = torch.nn.functional.conv1d(x.reshape(bs * chs, 1, t), w, padding=ntaps // 2)
        y = torch.nn.functional.conv1d(y.reshape(bs * chs, 1, t), w, padding=ntaps // 2)
        x = x.view(bs, chs, -1)
        y = y.view(bs, chs, -1)
    x_mag = _t_stft_mag(x.reshape(-1, x.shape[-1]), fft_size, hop_size, win_length, eps)
    y_mag = _t_stft_mag(y.reshape(-1, y.shape[-1]), fft_size, hop_size, win_length, eps)
    if fb is not None:
        x_mag = torch.matmul(fb, x_mag)
        y_mag = torch.matmul(fb, y_mag)
    sc = _t_spectral_convergence(x_mag, y_mag) if w_sc else 0.0
    logm = _t_mag_loss(x_mag, y_mag, log=True) if w_log_mag else 0.0
    linm = _t_mag_loss(x_mag, y_mag, log=False) if w_lin_mag else 0.0
    return w_sc * sc + w_log_mag * logm + w_lin_mag * linm


def _t_mrstft(x, y, fft_sizes, hop_sizes, win_lengths, **kw):
    """reference auraloss.py:506-535 (sum / len)."""
    loss = 0.0
    for fs, hs, wl in zip(fft_sizes, hop_sizes, win_lengths):
        loss = loss + _t_stft_loss(x, y, fs, hs, wl, **kw)
    return loss / len(fft_sizes)


def _signals(t=4096, seed=0):
    rng = np.random.RandomState(seed)
    # band-limited-ish signals: white noise + tones, stereo, batch 2
    ts = np.arange(t) / 44100.0
    base = (0.4 * np.sin(2 * np.pi * 440 * ts) + 0.2 * np.sin(2 * np.pi * 1270 * ts))
    x = 0.1 * rng.randn(2, 2, t).astype(np.float32) + base.astype(np.float32)
    y = x + 0.05 * rng.randn(2, 2, t).astype(np.float32)
    return x, y


FFTS, HOPS, WINS = (1024, 512), (256, 128), (1024, 512)


def test_stft_loss_matches_torch_default():
    x, y = _signals()
    got = float(STFTLoss(1024, 256, 1024)(x, y))
    ref = float(_t_stft_loss(torch.tensor(x), torch.tensor(y), 1024, 256, 1024))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_stft_loss_matches_torch_lin_mag_and_shorter_window():
    x, y = _signals()
    got = float(STFTLoss(1024, 120, 600, w_lin_mag=1.0)(x, y))
    ref = float(_t_stft_loss(torch.tensor(x), torch.tensor(y), 1024, 120, 600,
                             w_lin_mag=1.0))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_mrstft_matches_torch():
    x, y = _signals()
    got = float(MultiResolutionSTFTLoss(FFTS, HOPS, WINS)(x, y))
    ref = float(_t_mrstft(torch.tensor(x), torch.tensor(y), FFTS, HOPS, WINS))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_a_weighting_perceptual_matches_torch():
    """A-weighting FIR prefilter path (reference auraloss.py:119-166,391-404).
    The FIR design runs through the same scipy recipe on both sides; the
    torch side applies it with conv1d exactly as the reference does."""
    x, y = _signals()
    got = float(STFTLoss(1024, 256, 1024, sample_rate=44100,
                         perceptual_weighting=True)(x, y))
    taps = torch.tensor(design_a_weighting_fir(44100))
    ref = float(_t_stft_loss(torch.tensor(x), torch.tensor(y), 1024, 256, 1024,
                             aw_taps=taps))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


@pytest.mark.parametrize("scale", ["mel", "chroma"])
def test_scaled_stft_loss_matches_torch(scale):
    """mel/chroma filterbank application (reference auraloss.py:330-357,
    409-413). Both sides use our filterbank (librosa absent here — see module
    docstring); the reference applies mel as [1, M, F] and chroma as [M, F]."""
    x, y = _signals()
    n_bins = 64 if scale == "mel" else 12
    got = float(STFTLoss(1024, 256, 1024, sample_rate=44100,
                         scale=scale, n_bins=n_bins)(x, y))
    if scale == "mel":
        fb = torch.tensor(mel_filterbank(44100, 1024, n_bins)).unsqueeze(0)
    else:
        fb = torch.tensor(chroma_filterbank(44100, 1024, n_chroma=n_bins))
    ref = float(_t_stft_loss(torch.tensor(x), torch.tensor(y), 1024, 256, 1024,
                             fb=fb))
    np.testing.assert_allclose(got, ref, rtol=1e-5)


def test_sum_and_difference_matches_torch():
    """reference auraloss.py:538-611: mid/side MRSTFT averaged."""
    x, y = _signals()
    got = float(SumAndDifferenceSTFTLoss(FFTS, HOPS, WINS)(x, y))

    tx, ty = torch.tensor(x), torch.tensor(y)
    def sd(a):
        return (a[:, 0] + a[:, 1]).unsqueeze(1), (a[:, 0] - a[:, 1]).unsqueeze(1)
    xs, xd = sd(tx)
    ys, yd = sd(ty)
    sum_loss = _t_mrstft(xs, ys, FFTS, HOPS, WINS)
    diff_loss = _t_mrstft(xd, yd, FFTS, HOPS, WINS)
    ref = float((sum_loss + diff_loss) / 2)
    np.testing.assert_allclose(got, ref, rtol=1e-5)
