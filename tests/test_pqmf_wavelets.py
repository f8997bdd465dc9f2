"""PQMF and wavelet pretransforms: perfect-reconstruction properties."""

import numpy as np
import pytest

import jax.numpy as jnp

from friendly_stable_audio_tools_tpu.ops.pqmf import PQMF
from friendly_stable_audio_tools_tpu.ops.wavelets import (
    WaveletDecode1d,
    WaveletEncode1d,
    bior_filter_bank,
)


def test_bior22_filter_bank_matches_known_values():
    filt = bior_filter_bank("bior2.2")  # centered, padded by 1 each side
    s2 = np.sqrt(2)
    np.testing.assert_allclose(filt[0], s2 * np.array([0, -1 / 8, 1 / 4, 3 / 4, 1 / 4, -1 / 8, 0]), atol=1e-7)
    np.testing.assert_allclose(filt[2], s2 * np.array([0, 0, 1 / 4, 1 / 2, 1 / 4, 0, 0]), atol=1e-7)


@pytest.mark.parametrize("wavelet", ["bior2.2", "bior2.4", "bior4.4", "bior6.8"])
def test_wavelet_bank_perfect_reconstruction_property(wavelet):
    """dec/rec banks satisfy the biorthogonal PR condition:
    conv(dec_lo, rec_lo) + conv(dec_hi, rec_hi) is a 2-delta."""
    filt = bior_filter_bank(wavelet)
    p = np.convolve(filt[0], filt[2]) + np.convolve(filt[1], filt[3])
    center = len(p) // 2
    np.testing.assert_allclose(p[center], 2.0, atol=1e-6)
    np.testing.assert_allclose(np.delete(p, center), 0.0, atol=1e-6)


def test_wavelet_encode_decode_shapes_and_reconstruction():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 256, 2)).astype(np.float32))
    enc = WaveletEncode1d(2, levels=2)
    dec = WaveletDecode1d(2, levels=2)
    z = enc(x)
    assert z.shape == (1, 64, 8)
    y = dec(z)
    assert y.shape == x.shape
    # interior reconstruction is exact (edges differ: reflect pad)
    err = np.abs(np.asarray(y)[0, 32:-32] - np.asarray(x)[0, 32:-32]).max()
    assert err < 1e-5, err


def test_pqmf_roundtrip():
    rng = np.random.default_rng(0)
    pq = PQMF(attenuation=80, num_bands=4)
    x = jnp.asarray(rng.standard_normal((1, 2, 1024)).astype(np.float32) * 0.5)
    bands = pq.forward(x)
    assert bands.shape[1] == 2 and bands.shape[2] == 4
    y = pq.inverse(bands)
    # align (group delay) and compare energy of interior
    xn = np.asarray(x)[0, 0]
    yn = np.asarray(y)[0, 0, : xn.shape[0]]
    # find best alignment within +-64 samples
    best = min(
        (np.mean((yn[64 + s : 512 + s] - xn[64:512]) ** 2), s) for s in range(-64, 64)
    )
    assert best[0] < 1e-3, best


def test_pqmf_pretransform_nwc_layout():
    pq = PQMF(attenuation=80, num_bands=4)
    x = jnp.ones((1, 512, 1))
    z = pq.forward_nwc(x)
    assert z.shape == (1, 128, 4)
    y = pq.inverse_nwc(z)
    assert y.shape[2] == 1
