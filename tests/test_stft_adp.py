"""STFT-domain ADP U-Net wrapping + chroma STFT-loss scale.

torch parity: the reference wraps torch.stft/istft (reference
models/adp.py:1522-1602, center=True, reflect pad, normalized=True); the
chroma scale uses librosa.filters.chroma (reference
training/losses/auraloss.py:341-348).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from friendly_stable_audio_tools_tpu.ops.stft import STFT, hann_window, istft, stft


@pytest.mark.parametrize("n_fft,hop,wl", [(1023, 256, 1023), (512, 128, 400)])
def test_stft_matches_torch(n_fft, hop, wl):
    t = 4096
    x = np.random.default_rng(0).standard_normal((3, t)).astype(np.float32)
    ours = stft(jnp.asarray(x), n_fft, hop, wl)
    ref = torch.stft(
        torch.from_numpy(x), n_fft=n_fft, hop_length=hop, win_length=wl,
        window=torch.hann_window(wl), return_complex=True, normalized=True,
    ).numpy()
    assert ours.shape == ref.shape
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)


def test_istft_matches_torch():
    n_fft, hop, wl, t = 512, 128, 512, 4096
    x = np.random.default_rng(1).standard_normal((2, t)).astype(np.float32)
    spec = torch.stft(torch.from_numpy(x), n_fft=n_fft, hop_length=hop, win_length=wl,
                      window=torch.hann_window(wl), return_complex=True, normalized=True)
    ref = torch.istft(spec, n_fft=n_fft, hop_length=hop, win_length=wl,
                      window=torch.hann_window(wl), length=t, normalized=True).numpy()
    ours = istft(jnp.asarray(spec.numpy()), n_fft, hop, wl, length=t)
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-4, rtol=1e-3)
    np.testing.assert_allclose(np.asarray(ours), x, atol=1e-4, rtol=1e-3)


def test_stft_helper_encode1d_roundtrip():
    s = STFT(num_fft=511, hop_length=128, length=2048)
    x = jnp.asarray(np.random.default_rng(2).standard_normal((2, 2048, 2)), jnp.float32)
    pair = s.encode1d(x)
    f = 511 // 2 + 1
    assert pair.shape == (2, pair.shape[1], 2 * 2 * f)
    rec = s.decode1d(pair)
    assert rec.shape == x.shape
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x), atol=1e-3, rtol=1e-3)


@pytest.mark.slow
def test_unet1d_stft_wrapping_forward():
    from friendly_stable_audio_tools_tpu.models.adp import UNet1d

    unet = UNet1d(
        in_channels=1, channels=8, multipliers=[1, 2], factors=[2],
        num_blocks=[1], attentions=[0], resnet_groups=4,
        use_stft=True, stft_num_fft=127, stft_hop_length=32, stft_length=512,
    )
    x = jnp.asarray(np.random.default_rng(3).standard_normal((1, 512, 1)) * 0.1, jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), x, t)["params"]
    y = unet.apply({"params": params}, x, t)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


@pytest.mark.slow
def test_unetcfg1d_stft_config_driven():
    """config-driven instantiation of an STFT-wrapped CFG U-Net (the
    reference's `stft_*` kwargs surface, adp.py:1105-1113)."""
    from friendly_stable_audio_tools_tpu.models.adp import UNetCFG1d

    cfg = dict(
        context_embedding_max_length=8, context_embedding_features=16,
        in_channels=1, channels=32, multipliers=[1, 2], factors=[2],
        num_blocks=[1], attentions=[0, 1], resnet_groups=4,
        attention_heads=2, attention_features=8, attention_multiplier=2,
        use_stft=True, stft_num_fft=127, stft_hop_length=32, stft_length=256,
    )
    unet = UNetCFG1d(**cfg)
    x = jnp.asarray(np.random.default_rng(4).standard_normal((1, 256, 1)) * 0.1, jnp.float32)
    t = jnp.asarray([0.5], jnp.float32)
    emb = jnp.zeros((1, 8, 16), jnp.float32)
    params = unet.init(jax.random.PRNGKey(0), x, t, emb)["params"]
    y = unet.apply({"params": params}, x, t, emb, embedding_scale=3.0)
    assert y.shape == x.shape
    assert np.isfinite(np.asarray(y)).all()


def test_chroma_filterbank_properties():
    from friendly_stable_audio_tools_tpu.training.losses.auraloss import chroma_filterbank

    sr, n_fft, n_chroma = 22050, 2048, 12
    fb = chroma_filterbank(sr, n_fft, n_chroma)
    assert fb.shape == (n_chroma, n_fft // 2 + 1)
    assert np.isfinite(fb).all() and (fb >= 0).all()
    # the FFT bin nearest 440 Hz must peak at pitch class A (index 9 with
    # base_c rotation: C=0 ... A=9)
    bin_440 = int(round(440.0 * n_fft / sr))
    assert int(np.argmax(fb[:, bin_440])) == 9
    # and 261.63 Hz (C4) at pitch class C (index 0)
    bin_c4 = int(round(261.63 * n_fft / sr))
    assert int(np.argmax(fb[:, bin_c4])) == 0


def test_stft_loss_chroma_scale_forward():
    from friendly_stable_audio_tools_tpu.training.losses.auraloss import STFTLoss

    loss = STFTLoss(fft_size=512, hop_size=128, win_length=512,
                    sample_rate=22050, scale="chroma", n_bins=12)
    x = jnp.asarray(np.random.default_rng(5).standard_normal((1, 2, 2048)), jnp.float32)
    y = jnp.asarray(np.random.default_rng(6).standard_normal((1, 2, 2048)), jnp.float32)
    val = loss(x, y)
    assert np.isfinite(float(val))
    assert float(loss(x, x)) < float(val)


def test_framed_dft_gemm_matches_rfft():
    """The TPU GEMM framing path (phase-block DFT matmuls) == gather+rfft,
    across fft/hop ratios and a non-hop-divisible signal length."""
    import numpy as np
    import jax.numpy as jnp
    from friendly_stable_audio_tools_tpu.ops.stft import framed_dft_reim, hann_window

    rng = np.random.RandomState(0)
    for (n_fft, hop, t) in ((256, 64, 2000), (128, 32, 1027), (64, 16, 511),
                            (32, 8, 300), (512, 128, 4096)):
        x = jnp.asarray(rng.randn(3, t + n_fft), jnp.float32)  # "padded" input
        win = hann_window(n_fft)
        n_frames = 1 + t // hop
        re_g, im_g = framed_dft_reim(x, n_fft, hop, win, n_frames, force_gemm=True)
        re_r, im_r = framed_dft_reim(x, n_fft, hop, win, n_frames)  # cpu -> rfft
        assert re_g.shape == re_r.shape == (3, n_frames, n_fft // 2 + 1)
        scale = float(jnp.abs(re_r).max())
        np.testing.assert_allclose(np.asarray(re_g), np.asarray(re_r),
                                   atol=2e-4 * max(scale, 1.0))
        np.testing.assert_allclose(np.asarray(im_g), np.asarray(im_r),
                                   atol=2e-4 * max(scale, 1.0))


def test_mrstft_loss_gemm_vs_rfft_paths(monkeypatch):
    """MultiResolutionSTFTLoss value is backend-path independent: force the
    GEMM framing inside stft_mag via framed_dft_reim and compare."""
    import numpy as np
    import jax.numpy as jnp
    import friendly_stable_audio_tools_tpu.ops.stft as stft_mod
    from friendly_stable_audio_tools_tpu.training.losses.auraloss import (
        MultiResolutionSTFTLoss,
    )

    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 2, 4096) * 0.1, jnp.float32)
    y = jnp.asarray(rng.randn(2, 2, 4096) * 0.1, jnp.float32)
    loss = MultiResolutionSTFTLoss(fft_sizes=[256, 128], hop_sizes=[64, 32],
                                   win_lengths=[256, 128])
    ref = float(loss(x, y))
    orig = stft_mod.framed_dft_reim
    monkeypatch.setattr(
        stft_mod, "framed_dft_reim",
        lambda *a, **k: orig(*a, **{**k, "force_gemm": True}))
    got = float(loss(x, y))
    np.testing.assert_allclose(got, ref, rtol=1e-4)
