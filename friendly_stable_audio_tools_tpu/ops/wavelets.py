"""Multi-level 1-D discrete wavelet transform.

Parity target: reference `models/wavelets.py:19-88` (WaveletEncode1d /
WaveletDecode1d: bior filter bank as grouped conv, level-wise halving of
length / doubling of channels). The reference takes filter banks from pywt;
here the biorthogonal spline (CDF) banks for the supported even-order
wavelets (bior2.2/2.4/2.6/2.8/4.4/6.8) are constructed natively from the
closed-form spline factorization:

    rec_lo = sqrt(2) * u^(Nr/2)
    dec_lo = sqrt(2) * u^(Nd/2) * P(v),   P(y) = sum_k C(K-1+k, k) y^k
    dec_hi(z) = z^{-1} rec_lo(-z),  rec_hi(z) = z * dec_lo(-z)

with u = cos^2(w/2), v = sin^2(w/2), K = (Nr+Nd)/2 — verified to satisfy
exact zero-delay perfect reconstruction (see tests/test_pqmf_wavelets.py).

Layout: channels-last [B, T, C].
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np

_U = np.array([0.25, 0.5, 0.25])  # cos^2(w/2) as a centered Laurent polynomial
_V = np.array([-0.25, 0.5, -0.25])  # sin^2(w/2)


def _conv_pow(base: np.ndarray, n: int) -> np.ndarray:
    out = np.array([1.0])
    for _ in range(n):
        out = np.convolve(out, base)
    return out


def _center_pad(x: np.ndarray, length: int) -> np.ndarray:
    total = length - len(x)
    lo = total // 2
    return np.pad(x, (lo, total - lo))


def bior_filter_bank(wavelet: str) -> np.ndarray:
    """Return centered (dec_lo, dec_hi, rec_lo, rec_hi) stacked [4, L], odd L,
    satisfying zero-delay perfect reconstruction."""
    assert wavelet.startswith("bior"), f"unsupported wavelet {wavelet}"
    nr, nd = (int(v) for v in wavelet[4:].split("."))
    assert nr % 2 == 0 and nd % 2 == 0, "even-order bior wavelets only"

    K = (nr + nd) // 2
    acc = np.zeros(1)
    for k in range(K):
        term = math.comb(K - 1 + k, k) * _conv_pow(_V, k)
        L = max(len(acc), len(term))
        acc = _center_pad(acc, L) + _center_pad(term, L)

    dec_lo = math.sqrt(2) * np.convolve(_conv_pow(_U, nd // 2), acc)
    Lb = len(dec_lo) + 2  # room for the +-1 tap shifts of the high-pass pair
    dec_lo = _center_pad(dec_lo, Lb)
    rec_lo = _center_pad(math.sqrt(2) * _conv_pow(_U, nr // 2), Lb)
    c = Lb // 2
    i = np.arange(Lb)
    sign = lambda e: (-1.0) ** e  # noqa: E731
    dec_hi = np.zeros(Lb)
    rec_hi = np.zeros(Lb)
    dec_hi[1:] = sign(i[1:] - 1 - c) * rec_lo[:-1]  # z^{-1} rec_lo(-z)
    rec_hi[:-1] = sign(i[:-1] + 1 - c) * dec_lo[1:]  # z^{+1} dec_lo(-z)
    return np.stack([dec_lo, dec_hi, rec_lo, rec_hi]).astype(np.float32)


class WaveletEncode1d:
    """[B, T, C] -> [B, T/2^levels, C*2^levels] (reference wavelets.py:19-50)."""

    def __init__(self, channels: int, levels: int, wavelet: str = "bior4.4"):
        self.channels = channels
        self.levels = levels
        filt = bior_filter_bank(wavelet)
        # centered convolution == correlation with the flipped kernel
        self.kernel = jnp.asarray(filt[:2, ::-1].copy())  # [2, L]
        self.pad = filt.shape[-1] // 2

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        k = self.kernel
        L = k.shape[-1]
        for _ in range(self.levels):
            low, rest = x[..., :c], x[..., c:]
            lowp = jnp.pad(low, ((0, 0), (self.pad, self.pad), (0, 0)), mode="reflect")
            # grouped conv output channels are per-group contiguous:
            # out[2g] = lo(ch g), out[2g+1] = hi(ch g)
            w = jnp.zeros((L, 1, 2 * c), x.dtype)
            w = w.at[:, 0, 0::2].set(jnp.repeat(k[0][:, None], c, 1))
            w = w.at[:, 0, 1::2].set(jnp.repeat(k[1][:, None], c, 1))
            y = jax.lax.conv_general_dilated(
                lowp, w, window_strides=(2,), padding=[(0, 0)],
                dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=c,
            )
            # grouped conv emits per-group [lo_g, hi_g]; regroup to [lo*, hi*]
            b, t2, _ = y.shape
            y = y.reshape(b, t2, c, 2).transpose(0, 1, 3, 2).reshape(b, t2, 2 * c)
            if rest.shape[-1]:
                b, t, cr = rest.shape
                rest = rest.reshape(b, t // 2, 2, cr).transpose(0, 1, 3, 2).reshape(b, t // 2, 2 * cr)
                x = jnp.concatenate([y, rest], axis=-1)
            else:
                x = y
        return x


class WaveletDecode1d:
    """Inverse of WaveletEncode1d (reference wavelets.py:53-88)."""

    def __init__(self, channels: int, levels: int, wavelet: str = "bior4.4"):
        self.channels = channels
        self.levels = levels
        filt = bior_filter_bank(wavelet)
        self.kernel = jnp.asarray(filt[2:, ::-1].copy())  # [2, L] flipped rec filters
        self.pad = filt.shape[-1] // 2

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = self.channels
        k = self.kernel
        L = k.shape[-1]
        for _ in range(self.levels):
            low, rest = x[..., : 2 * c], x[..., 2 * c :]
            lo = low[..., :c]
            hi = low[..., c:]

            def synth(sig, filt_1d):
                # centered convolution of the zero-upsampled signal:
                # lhs_dilation=2 -> length 2t-1; pad (c, c+1) -> output 2t
                wk = jnp.repeat(filt_1d[:, None, None], c, 2)  # [L, 1, c]
                return jax.lax.conv_general_dilated(
                    sig, wk, window_strides=(1,),
                    padding=[(self.pad, self.pad + 1)],
                    lhs_dilation=(2,), dimension_numbers=("NWC", "WIO", "NWC"),
                    feature_group_count=c,
                )

            y = synth(lo, k[0]) + synth(hi, k[1])
            if rest.shape[-1]:
                # invert the encoder's (ch, l2) channel packing
                b2, t2, cr = rest.shape
                rest = rest.reshape(b2, t2, cr // 2, 2).transpose(0, 1, 3, 2).reshape(b2, t2 * 2, cr // 2)
                x = jnp.concatenate([y, rest], axis=-1)
            else:
                x = y
        return x
