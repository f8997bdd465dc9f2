"""GAN discriminator ensembles for VAE-GAN training.

Parity target: reference `models/discriminators.py:14-551` — hinge losses,
EncodecDiscriminator (multi-scale complex-STFT), the Oobleck family
(SharedDiscriminatorConvNet / MultiScale / MultiPeriod / MultiDiscriminator
with the real/fake batch-concat trick), and the DAC family (MPD / MSD /
complex multi-band MRD / DACDiscriminator / DACGANLoss least-squares GAN +
L1 feature matching).

Layout: waveforms enter as [B, T, C] (channels-last); 2-D conv paths use
[B, H, W, C] (NHWC). Each ensemble is a flax module whose `loss` method
returns (dis_loss, adv_loss, feature_matching_distance) like the reference.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.convs import WNConv1d, conv1d


def get_hinge_losses(score_real, score_fake):
    """reference discriminators.py:14-17."""
    gen_loss = -jnp.mean(score_fake)
    dis_loss = jnp.mean(jax.nn.relu(1 - score_real)) + jnp.mean(jax.nn.relu(1 + score_fake))
    return dis_loss, gen_loss


class WNConv2d(nn.Module):
    """Weight-normalized 2-D conv, NHWC, torch-weight_norm(dim=0) semantics."""

    in_channels: int
    out_channels: int
    kernel_size: tp.Tuple[int, int]
    stride: tp.Tuple[int, int] = (1, 1)
    padding: tp.Tuple[int, int] = (0, 0)
    dilation: tp.Tuple[int, int] = (1, 1)
    use_bias: bool = True
    act: bool = False  # optional leaky-relu epilogue (unused by call sites)

    @nn.compact
    def __call__(self, x):
        kh, kw = self.kernel_size
        fan_in = self.in_channels * kh * kw
        bound = 1.0 / np.sqrt(fan_in)
        v = self.param(
            "v",
            lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
            (kh, kw, self.in_channels, self.out_channels),
        )
        norm = jnp.sqrt(jnp.sum(jnp.square(v), axis=(0, 1, 2)))
        g = self.param("g", lambda key, *_: norm, (self.out_channels,))
        w = v * (g / (norm + 1e-12))
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype),
            window_strides=self.stride,
            padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
            rhs_dilation=self.dilation,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ).astype(x.dtype)
        if self.use_bias:
            b = self.param(
                "bias",
                lambda key, shape: jax.random.uniform(key, shape, jnp.float32, -bound, bound),
                (self.out_channels,),
            )
            y = y + b.astype(y.dtype)
        if self.act:
            y = jax.nn.leaky_relu(y, 0.1)
        return y


# --------------------------------------------------------------------------
# EnCodec multi-scale STFT discriminator (reference :20-58 + encodec.msstftd)
# --------------------------------------------------------------------------


def _stft_realimag(x: jnp.ndarray, n_fft: int, hop: int, win_length: int) -> jnp.ndarray:
    """[N, T] -> [N, frames, freq, 2] complex STFT as real/imag channels.
    On TPU the framing+DFT runs as MXU GEMMs (ops/stft.py framed_dft_reim)
    instead of gather + jnp.fft.rfft."""
    from ..ops.stft import framed_dft_reim
    from ..training.losses.auraloss import _hann_window

    window = jnp.asarray(_hann_window(win_length), jnp.float32)
    pad = n_fft // 2
    x = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        window = jnp.pad(window, (lpad, n_fft - win_length - lpad))
    re, im = framed_dft_reim(x, n_fft, hop, window, n_frames)
    # torchaudio Spectrogram(normalized=True) semantics (encodec.msstftd)
    norm = jnp.sqrt(jnp.sum(window.astype(jnp.float32) ** 2))
    return jnp.stack([re, im], axis=-1) / norm  # [N, fr, freq, 2]


class DiscriminatorSTFT(nn.Module):
    """One EnCodec STFT-scale discriminator (encodec.msstftd.DiscriminatorSTFT
    structure: 2*C input channels, (3,9) convs with time-dilated stack)."""

    filters: int
    in_channels: int = 1
    out_channels: int = 1
    n_fft: int = 1024
    hop_length: int = 256
    win_length: int = 1024
    dilations: tp.Sequence[int] = (1, 2, 4)
    filters_scale: int = 1
    max_filters: int = 1024

    @nn.compact
    def __call__(self, x):  # x: [B, T, C]
        b, t, c = x.shape
        z = _stft_realimag(x.transpose(0, 2, 1).reshape(b * c, t), self.n_fft, self.hop_length, self.win_length)
        # -> [B, frames, freq, 2*C]
        z = z.reshape(b, c, z.shape[1], z.shape[2], 2).transpose(0, 2, 3, 1, 4).reshape(b, z.shape[1], z.shape[2], 2 * c)
        fmap = []
        # encodec.msstftd channel schedule: min(filters_scale**(i+1)*filters,
        # max_filters) — CONSTANT at the default filters_scale=1 (the old
        # doubling schedule built a different, bigger discriminator) — and
        # LeakyReLU(0.3) activations like encodec
        slope = 0.3
        h = WNConv2d(2 * c, self.filters, (3, 9), padding=(1, 4), name="conv_in")(z)
        h = jax.nn.leaky_relu(h, slope)
        fmap.append(h)
        ch = self.filters
        for i, d in enumerate(self.dilations):
            out_ch = min(self.filters_scale ** (i + 1) * self.filters, self.max_filters)
            h = WNConv2d(ch, out_ch, (3, 9), stride=(1, 2), dilation=(d, 1),
                         padding=(d, 4), name=f"conv{i}")(h)
            h = jax.nn.leaky_relu(h, slope)
            fmap.append(h)
            ch = out_ch
        out_mid = min(self.filters_scale ** (len(self.dilations) + 1) * self.filters, self.max_filters)
        h = WNConv2d(ch, out_mid, (3, 3), padding=(1, 1), name="conv_mid")(h)
        h = jax.nn.leaky_relu(h, slope)
        fmap.append(h)
        logits = WNConv2d(out_mid, self.out_channels, (3, 3), padding=(1, 1), name="conv_post")(h)
        return logits, fmap


class EncodecDiscriminator(nn.Module):
    """reference discriminators.py:20-58."""

    in_channels: int = 1
    filters: int = 32
    n_ffts: tp.Sequence[int] = (1024, 2048, 512)
    hop_lengths: tp.Sequence[int] = (256, 512, 128)
    win_lengths: tp.Sequence[int] = (1024, 2048, 512)

    @nn.compact
    def __call__(self, x):
        logits, features = [], []
        for i, (n_fft, hop, win) in enumerate(zip(self.n_ffts, self.hop_lengths, self.win_lengths)):
            lg, fm = DiscriminatorSTFT(
                self.filters, in_channels=self.in_channels, n_fft=n_fft,
                hop_length=hop, win_length=win, name=f"disc{i}",
            )(x)
            logits.append(lg)
            features.append(fm)
        return logits, features

    def loss(self, x, y):
        """x=real, y=fake, both [B, T, C]. Returns (dis, adv, fm)."""
        logits_true, feature_true = self(x)
        logits_fake, feature_fake = self(y)
        dis_loss = 0.0
        adv_loss = 0.0
        fm = 0.0
        for i in range(len(logits_true)):
            scale_fm = sum(
                jnp.mean(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)))
                for a, b in zip(feature_true[i], feature_fake[i])
            ) / len(feature_true[i])
            fm = fm + scale_fm
            d, a = get_hinge_losses(logits_true[i].astype(jnp.float32), logits_fake[i].astype(jnp.float32))
            dis_loss = dis_loss + d
            adv_loss = adv_loss + a
        return dis_loss, adv_loss, fm


# --------------------------------------------------------------------------
# Oobleck family (reference :68-302)
# --------------------------------------------------------------------------


class SharedDiscriminatorConvNet(nn.Module):
    """reference :68-120; `dims`=1 for Conv1d, 2 for Conv2d variants."""

    in_size: int
    dims: int = 1
    out_size: int = 1
    capacity: int = 32
    n_layers: int = 4
    kernel_size: int = 15
    stride: int = 4

    @nn.compact
    def __call__(self, x):
        channels = [self.in_size] + list(self.capacity * 2 ** np.arange(self.n_layers))
        features = []
        h = x
        for i in range(self.n_layers):
            pad = self.kernel_size // 2
            if self.dims == 1:
                h = WNConv1d(channels[i], int(channels[i + 1]), self.kernel_size,
                             stride=self.stride, padding=pad, name=f"conv{i}")(h)
            else:
                # reference passes the int kernel_size to nn.Conv2d: SQUARE
                # (15,15) kernels with stride/pad on BOTH axes — the period
                # axis is convolved and downsampled too
                h = WNConv2d(int(channels[i]), int(channels[i + 1]),
                             (self.kernel_size, self.kernel_size),
                             stride=(self.stride, self.stride),
                             padding=(pad, pad), name=f"conv{i}")(h)
            features.append(h)
            h = jax.nn.silu(h)
        # the reference's final projection is a PLAIN conv, outside the
        # weight_norm normalization() wrapper (:108)
        if self.dims == 1:
            from ..ops.convs import Conv1d as _PlainConv1d

            h = _PlainConv1d(int(channels[-1]), self.out_size, 1, name="conv_out")(h)
        else:
            h = nn.Conv(self.out_size, (1, 1), padding="VALID", name="conv_out")(h)
        features.append(h)
        score = h.reshape(h.shape[0], -1).mean(-1)
        return score, features


class MultiScaleDiscriminator(nn.Module):
    """avg-pool pyramid (reference :123-141); input [B, T, C]."""

    in_channels: int
    n_scales: int

    @nn.compact
    def __call__(self, x):
        score = 0.0
        features = []
        for i in range(self.n_scales):
            s, f = SharedDiscriminatorConvNet(self.in_channels, dims=1, name=f"scale{i}")(x)
            score = score + s
            features.extend(f)
            # avg_pool1d(2) on time
            t = x.shape[1] // 2 * 2
            x = (x[:, 0:t:2, :] + x[:, 1:t:2, :]) / 2
        return score, features


class MultiPeriodDiscriminator(nn.Module):
    """fold-by-period 2-D discriminator (reference :144-168); input [B, T, C]."""

    in_channels: int
    periods: tp.Sequence[int]

    @nn.compact
    def __call__(self, x):
        score = 0.0
        features = []
        for i, n in enumerate(self.periods):
            folded = self.fold(x, n)
            s, f = SharedDiscriminatorConvNet(self.in_channels, dims=2, name=f"period{i}")(folded)
            score = score + s
            features.extend(f)
        return score, features

    @staticmethod
    def fold(x, n):
        b, t, c = x.shape
        pad = (n - (t % n)) % n
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        return x.reshape(b, -1, n, c)  # [B, T/n, n, C] as NHWC


class OobleckDiscriminator(nn.Module):
    """MultiScale + MultiPeriod with real/fake batch-concat
    (reference :171-302)."""

    in_channels: int = 1

    def setup(self):
        self.msd = MultiScaleDiscriminator(self.in_channels, n_scales=3)
        self.mpd = MultiPeriodDiscriminator(self.in_channels, periods=(2, 3, 5, 7, 11))

    def __call__(self, x):
        s1, f1 = self.msd(x)
        s2, f2 = self.mpd(x)
        return s1 + s2, f1 + f2

    def loss(self, reals, fakes):
        """[B, T, C] each. Batch-concat trick: one forward over cat(real,fake)."""
        b = reals.shape[0]
        both = jnp.concatenate([reals, fakes], axis=0)
        score, features = self(both)
        score_real, score_fake = score[:b], score[b:]
        dis_loss, gen_loss = get_hinge_losses(score_real.astype(jnp.float32), score_fake.astype(jnp.float32))
        fm = 0.0
        # reference sums per-feature mean-abs-diffs WITHOUT dividing by the
        # feature count (its /len(scale_real) divides by the batch dim of one
        # tensor, which the per-sample means already cancel)
        for f in features:
            fr, ff = f[:b], f[b:]
            fm = fm + jnp.mean(jnp.abs(fr.astype(jnp.float32) - ff.astype(jnp.float32)))
        return dis_loss, gen_loss, fm


# --------------------------------------------------------------------------
# DAC family (reference :307-551)
# --------------------------------------------------------------------------


class MPD(nn.Module):
    """reference :307-343; input [B, T, C]."""

    period: int
    channels: int = 1

    @nn.compact
    def __call__(self, x):
        b, t, c = x.shape
        # reference pad_to_period always pads period - t % period — a FULL
        # extra period when t is already aligned (:307-343)
        pad = self.period - t % self.period
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)), mode="reflect")
        x = x.reshape(b, -1, self.period, c)
        fmap = []
        chans = [c, 32, 128, 512, 1024]
        for i in range(4):
            x = WNConv2d(chans[i], chans[i + 1], (5, 1), (3, 1), padding=(2, 0), act=False, name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, 0.1)
            fmap.append(x)
        x = WNConv2d(1024, 1024, (5, 1), (1, 1), padding=(2, 0), act=False, name="conv4")(x)
        x = jax.nn.leaky_relu(x, 0.1)
        fmap.append(x)
        x = WNConv2d(1024, 1, (3, 1), padding=(1, 0), act=False, name="conv_post")(x)
        fmap.append(x)
        return fmap


class MSD(nn.Module):
    """reference :346-377; `rate` resampling is approximated by strided
    average (the reference uses julius resampling inside audiotools)."""

    rate: int = 1
    sample_rate: int = 44100
    channels: int = 1

    @nn.compact
    def __call__(self, x):
        if self.rate > 1:
            t = x.shape[1] // self.rate * self.rate
            x = x[:, :t].reshape(x.shape[0], -1, self.rate, x.shape[2]).mean(2)
        fmap = []
        specs = [
            (self.channels, 16, 15, 1, 1, 7),
            (16, 64, 41, 4, 4, 20),
            (64, 256, 41, 4, 16, 20),
            (256, 1024, 41, 4, 64, 20),
            (1024, 1024, 41, 4, 256, 20),
            (1024, 1024, 5, 1, 1, 2),
        ]
        for i, (ci, co, k, s, g, p) in enumerate(specs):
            x = WNConv1d(ci, co, k, stride=s, padding=p, groups=g, name=f"conv{i}")(x)
            x = jax.nn.leaky_relu(x, 0.1)
            fmap.append(x)
        x = WNConv1d(1024, 1, 3, padding=1, name="conv_post")(x)
        fmap.append(x)
        return fmap


BANDS = ((0.0, 0.1), (0.1, 0.25), (0.25, 0.5), (0.5, 0.75), (0.75, 1.0))


class MRD(nn.Module):
    """Complex multi-band STFT discriminator (reference :383-458)."""

    window_length: int
    hop_factor: float = 0.25
    sample_rate: int = 44100
    bands: tp.Sequence[tp.Tuple[float, float]] = BANDS
    channels: int = 1

    @nn.compact
    def __call__(self, x):  # [B, T, C]
        b, t, c = x.shape
        hop = int(self.window_length * self.hop_factor)
        z = _stft_realimag(x.transpose(0, 2, 1).reshape(b * c, t), self.window_length, hop, self.window_length)
        # [B*C, frames, freq, 2] -> treat like reference's "(b ch) c t f" as NHWC [N, t, f, 2]
        n_fft_bins = self.window_length // 2 + 1
        bands = [(int(lo * n_fft_bins), int(hi * n_fft_bins)) for lo, hi in self.bands]
        fmap = []
        outs = []
        ch = 32
        for bi, (lo, hi) in enumerate(bands):
            h = z[:, :, lo:hi, :]
            specs = [
                (2, ch, (3, 9), (1, 1), (1, 4)),
                (ch, ch, (3, 9), (1, 2), (1, 4)),
                (ch, ch, (3, 9), (1, 2), (1, 4)),
                (ch, ch, (3, 9), (1, 2), (1, 4)),
                (ch, ch, (3, 3), (1, 1), (1, 1)),
            ]
            for li, (ci, co, k, s, p) in enumerate(specs):
                h = WNConv2d(ci, co, k, s, padding=p, act=False, name=f"band{bi}_conv{li}")(h)
                h = jax.nn.leaky_relu(h, 0.1)
                fmap.append(h)
            outs.append(h)
        h = jnp.concatenate(outs, axis=2)
        h = WNConv2d(ch, 1, (3, 3), padding=(1, 1), act=False, name="conv_post")(h)
        fmap.append(h)
        return fmap


class DACDiscriminator(nn.Module):
    """reference :461-504."""

    channels: int = 1
    rates: tp.Sequence[int] = ()
    periods: tp.Sequence[int] = (2, 3, 5, 7, 11)
    fft_sizes: tp.Sequence[int] = (2048, 1024, 512)
    sample_rate: int = 44100
    bands: tp.Sequence[tp.Tuple[float, float]] = BANDS

    def setup(self):
        discs = [MPD(p, channels=self.channels) for p in self.periods]
        discs += [MSD(r, sample_rate=self.sample_rate, channels=self.channels) for r in self.rates]
        discs += [MRD(f, sample_rate=self.sample_rate, bands=self.bands, channels=self.channels) for f in self.fft_sizes]
        self.discriminators = discs

    def preprocess(self, y):
        y = y - y.mean(axis=1, keepdims=True)
        y = 0.8 * y / (jnp.abs(y).max(axis=1, keepdims=True) + 1e-9)
        return y

    def __call__(self, x):
        x = self.preprocess(x)
        return [d(x) for d in self.discriminators]


class DACGANLoss(nn.Module):
    """Least-squares GAN + L1 feature matching (reference :507-551)."""

    channels: int = 1
    sample_rate: int = 44100
    rates: tp.Sequence[int] = ()
    periods: tp.Sequence[int] = (2, 3, 5, 7, 11)
    fft_sizes: tp.Sequence[int] = (2048, 1024, 512)

    def setup(self):
        self.discriminator = DACDiscriminator(
            channels=self.channels, rates=self.rates, periods=self.periods,
            fft_sizes=self.fft_sizes, sample_rate=self.sample_rate,
        )

    def __call__(self, fake, real):
        return self.discriminator(fake), self.discriminator(real)

    def loss(self, fake, real):
        """fake/real [B, T, C]. NB the reference's DACGANLoss.loss signature is
        (fake, real) while the trainer calls discriminator.loss(reals, decoded);
        the AE trainer handles the flip. Returns (dis, adv, fm)."""
        d_fake = self.discriminator(fake)
        d_real = self.discriminator(real)
        loss_d = 0.0
        loss_g = 0.0
        loss_feature = 0.0
        for x_fake, x_real in zip(d_fake, d_real):
            xf = x_fake[-1].astype(jnp.float32)
            xr = x_real[-1].astype(jnp.float32)
            # the reference detaches the fake WAVEFORM for the disc loss
            # (generator grads are cut); in the functional trainer that cut is
            # made by differentiating only w.r.t. disc params, so no
            # stop_gradient here — it would kill the disc's own gradient.
            loss_d = loss_d + jnp.mean(xf**2) + jnp.mean((1 - xr) ** 2)
            loss_g = loss_g + jnp.mean((1 - xf) ** 2)
            for j in range(len(x_fake) - 1):
                loss_feature = loss_feature + jnp.mean(
                    jnp.abs(x_fake[j].astype(jnp.float32) - jax.lax.stop_gradient(x_real[j].astype(jnp.float32)))
                )
        return loss_d, loss_g, loss_feature
