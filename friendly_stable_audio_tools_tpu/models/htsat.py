"""HTSAT audio branch of CLAP, native JAX (Swin transformer over log-mels).

The reference's `CLAPAudioConditioner` (reference models/conditioners.py:195-258)
embeds audio through `laion_clap.CLAP_Module.get_audio_embedding_from_data`:
a log-mel frontend, the HTSAT Swin-style audio encoder (with the optional
4-channel "feature fusion" path for >10 s clips), an avg-pooled latent, a
2-layer MLP projection to the 512-d joint space, and L2 normalization.

This module implements all of that natively:

  * `ClapAudioFeatureProcessor` — host-side numpy mel/crop prep, matching the
    behavior of laion-clap `get_audio_features` ("fusion" / "rand_trunc"
    truncation, "repeatpad" filling) bit-for-bit with HF's ClapFeatureExtractor
    (which ports the same logic), so converted checkpoints see the exact
    distribution they were trained on.
  * `HTSATAudioEncoder` / `CLAPAudioBranch` — flax modules (patch embed +
    AFF fusion, 4 Swin stages with (shifted-)window attention + relative
    position bias, patch merging, pooled latent, projection). Pure functions
    of params; compose into jit. Window attention runs as batched dense
    attention over static 64-token windows — ideal MXU shapes, no Pallas
    needed at this size.
  * `convert_clap_audio_branch` — maps laion-clap torch checkpoints
    (`audio_branch.*` keys, fused qkv) or HF transformers CLAP checkpoints
    (`audio_model.audio_encoder.*`) onto the flax param tree.

BatchNorms run in inference mode from checkpoint running stats (the reference
freezes the audio branch in the conditioner path; finetuning here keeps BN
frozen — documented divergence from train-mode BN).
"""

from __future__ import annotations

import dataclasses
import typing as tp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


# ---------------------------------------------------------------------------
# config
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class HTSATConfig:
    spec_size: int = 256
    patch_size: int = 4
    patch_stride: tp.Tuple[int, int] = (4, 4)
    num_mel_bins: int = 64
    window_size: int = 8
    embed_dim: int = 128                      # patch_embeds_hidden_size
    depths: tp.Tuple[int, ...] = (2, 2, 12, 2)
    num_heads: tp.Tuple[int, ...] = (4, 8, 16, 32)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    layer_norm_eps: float = 1e-5
    enable_fusion: bool = False
    aff_block_r: int = 4
    projection_dim: int = 512
    # mel frontend
    sample_rate: int = 48_000
    fft_size: int = 1024
    hop_size: int = 480
    fmin: float = 50.0
    fmax: float = 14_000.0
    max_length_s: int = 10

    @property
    def num_features(self) -> int:
        return self.embed_dim * 2 ** (len(self.depths) - 1)

    @property
    def freq_ratio(self) -> int:
        return self.spec_size // self.num_mel_bins

    @property
    def grid_size(self) -> tp.Tuple[int, int]:
        return (self.spec_size // self.patch_stride[0], self.spec_size // self.patch_stride[1])


# laion-clap model registry (laion_clap/clap_module/htsat.py create_htsat_model)
HTSAT_CONFIGS = {
    "HTSAT-tiny": HTSATConfig(embed_dim=96, depths=(2, 2, 6, 2)),
    "HTSAT-base": HTSATConfig(embed_dim=128, depths=(2, 2, 12, 2)),
    "HTSAT-large": HTSATConfig(embed_dim=256, depths=(2, 2, 12, 2)),
}


# ---------------------------------------------------------------------------
# mel filterbanks + log-mel spectrogram (host-side numpy)
# ---------------------------------------------------------------------------


def _hz_to_mel(freq, scale: str):
    freq = np.asarray(freq, np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + freq / 700.0)
    # slaney: linear below 1 kHz, log above
    mels = 3.0 * freq / 200.0
    log_region = freq >= 1000.0
    logstep = 27.0 / np.log(6.4)
    return np.where(log_region, 15.0 + np.log(np.maximum(freq, 1e-9) / 1000.0) * logstep, mels)


def _mel_to_hz(mels, scale: str):
    mels = np.asarray(mels, np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (mels / 2595.0) - 1.0)
    freq = 200.0 * mels / 3.0
    log_region = mels >= 15.0
    logstep = np.log(6.4) / 27.0
    return np.where(log_region, 1000.0 * np.exp(logstep * (mels - 15.0)), freq)


def mel_filter_bank(num_frequency_bins: int, num_mel_filters: int, min_frequency: float,
                    max_frequency: float, sampling_rate: int, norm: tp.Optional[str],
                    mel_scale: str) -> np.ndarray:
    """Triangular mel filterbank [num_frequency_bins, num_mel_filters];
    htk/None for the torchaudio-default filters (fusion path), slaney/slaney
    for the librosa-default filters (rand_trunc path)."""
    mel_min = _hz_to_mel(min_frequency, mel_scale)
    mel_max = _hz_to_mel(max_frequency, mel_scale)
    mel_freqs = np.linspace(mel_min, mel_max, num_mel_filters + 2)
    filter_freqs = _mel_to_hz(mel_freqs, mel_scale)
    fft_freqs = np.linspace(0, sampling_rate // 2, num_frequency_bins)

    fdiff = np.diff(filter_freqs)
    slopes = filter_freqs[None, :] - fft_freqs[:, None]  # [bins, mel+2]
    down = -slopes[:, :-2] / fdiff[:-1]
    up = slopes[:, 2:] / fdiff[1:]
    fb = np.maximum(0.0, np.minimum(down, up))
    if norm == "slaney":
        enorm = 2.0 / (filter_freqs[2 : num_mel_filters + 2] - filter_freqs[:num_mel_filters])
        fb *= enorm[None, :]
    return fb


def log_mel_spectrogram(waveform: np.ndarray, mel_filters: np.ndarray, fft_size: int = 1024,
                        hop_size: int = 480) -> np.ndarray:
    """Power STFT (periodic hann, centered, reflect pad) -> mel -> dB.
    Returns [frames, n_mels]; matches torch.stft / HF audio_utils numerics."""
    x = np.asarray(waveform, np.float64)
    window = 0.5 * (1 - np.cos(2 * np.pi * np.arange(fft_size) / fft_size))  # periodic hann
    half = fft_size // 2
    x = np.pad(x, (half, half), mode="reflect")
    num_frames = 1 + (len(x) - fft_size) // hop_size
    idx = np.arange(fft_size)[None, :] + hop_size * np.arange(num_frames)[:, None]
    frames = x[idx] * window[None, :]
    spec = np.abs(np.fft.rfft(frames, fft_size, axis=-1)) ** 2  # [frames, bins]
    mel = spec @ mel_filters
    return (10.0 * np.log10(np.maximum(mel, 1e-10))).astype(np.float32)


class ClapAudioFeatureProcessor:
    """Waveform [T] (or batch) -> (input_features, is_longer) for HTSAT.

    Ports laion-clap `get_audio_features` (data_truncating fusion|rand_trunc,
    data_filling repeatpad|repeat|pad) as replicated by HF ClapFeatureExtractor.
    Fusion mode emits [B, 4, frames, mels] (shrunk global + 3 random crops);
    non-fusion emits [B, 1, frames, mels] from the slaney filterbank.
    """

    def __init__(self, cfg: HTSATConfig = HTSATConfig(), truncation: tp.Optional[str] = None,
                 padding: str = "repeatpad"):
        self.cfg = cfg
        self.truncation = truncation or ("fusion" if cfg.enable_fusion else "rand_trunc")
        self.padding = padding
        self.max_samples = cfg.max_length_s * cfg.sample_rate
        bins = fft_bins = cfg.fft_size // 2 + 1
        self.mel_filters = mel_filter_bank(fft_bins, cfg.num_mel_bins, cfg.fmin, cfg.fmax,
                                           cfg.sample_rate, norm=None, mel_scale="htk")
        self.mel_filters_slaney = mel_filter_bank(bins, cfg.num_mel_bins, cfg.fmin, cfg.fmax,
                                                  cfg.sample_rate, norm="slaney", mel_scale="slaney")

    def _mel(self, waveform, filters):
        return log_mel_spectrogram(waveform, filters, self.cfg.fft_size, self.cfg.hop_size)

    def _random_mel_fusion(self, mel, total_frames, chunk_frames, rng: np.random.RandomState):
        ranges = np.array_split(list(range(0, total_frames - chunk_frames + 1)), 3)
        if len(ranges[1]) == 0:
            ranges[1] = [0]
        if len(ranges[2]) == 0:
            ranges[2] = [0]
        idx_front = rng.choice(ranges[0])
        idx_middle = rng.choice(ranges[1])
        idx_back = rng.choice(ranges[2])
        front = mel[idx_front : idx_front + chunk_frames, :]
        middle = mel[idx_middle : idx_middle + chunk_frames, :]
        back = mel[idx_back : idx_back + chunk_frames, :]
        shrink = _interp_bilinear_2d(mel, (chunk_frames, mel.shape[1]))
        return np.stack([shrink, front, middle, back], axis=0)

    def process_one(self, waveform: np.ndarray, rng: np.random.RandomState):
        waveform = np.asarray(waveform, np.float64).reshape(-1)
        max_length = self.max_samples
        if waveform.shape[0] > max_length:
            if self.truncation == "rand_trunc":
                overflow = len(waveform) - max_length
                idx = rng.randint(0, overflow + 1)
                return self._mel(waveform[idx : idx + max_length], self.mel_filters_slaney)[None], True
            mel = self._mel(waveform, self.mel_filters)
            chunk_frames = max_length // self.cfg.hop_size + 1
            if chunk_frames == mel.shape[0]:
                return np.stack([mel] * 4, axis=0), False
            return self._random_mel_fusion(mel, mel.shape[0], chunk_frames, rng), True

        if waveform.shape[0] < max_length:
            if self.padding == "repeat":
                waveform = np.tile(waveform, int(max_length / len(waveform)) + 1)[:max_length]
            elif self.padding == "repeatpad":
                waveform = np.tile(waveform, max(1, int(max_length / len(waveform))))
            waveform = np.pad(waveform, (0, max_length - waveform.shape[0]))
        if self.truncation == "fusion":
            mel = self._mel(waveform, self.mel_filters)
            return np.stack([mel] * 4, axis=0), False
        return self._mel(waveform, self.mel_filters_slaney)[None], False

    def __call__(self, waveforms, rng: tp.Optional[np.random.RandomState] = None):
        rng = rng or np.random.RandomState()
        if isinstance(waveforms, np.ndarray) and waveforms.ndim == 1:
            waveforms = [waveforms]
        mels, longer = [], []
        for w in waveforms:
            m, lg = self.process_one(np.asarray(w), rng)
            mels.append(m)
            longer.append(lg)
        if self.truncation == "fusion" and not any(longer):
            # laion-clap trains with >=1 fused sample per batch; HF replicates
            longer[rng.randint(0, len(mels))] = True
        return np.stack(mels).astype(np.float32), np.asarray(longer, bool)


def _cubic_kernel(x, a=-0.75):
    ax = np.abs(x)
    w1 = (a + 2) * ax**3 - (a + 3) * ax**2 + 1
    w2 = a * ax**3 - 5 * a * ax**2 + 8 * a * ax - 4 * a
    return np.where(ax <= 1, w1, np.where(ax < 2, w2, 0.0))


def _interp_matrix_1d(n_in: int, n_out: int, mode: str, align_corners: bool) -> np.ndarray:
    """Dense [n_out, n_in] interpolation matrix replicating torch's
    F.interpolate semantics (border-replicate taps)."""
    if n_in == n_out:
        return np.eye(n_in)
    if align_corners:
        src = np.arange(n_out) * (n_in - 1) / (n_out - 1)
    else:
        src = (np.arange(n_out) + 0.5) * n_in / n_out - 0.5
    mat = np.zeros((n_out, n_in))
    if mode == "bilinear":
        i0 = np.clip(np.floor(src).astype(int), 0, n_in - 1)
        i1 = np.clip(i0 + 1, 0, n_in - 1)
        frac = np.clip(src - np.floor(src), 0.0, 1.0)
        frac = np.where(src < 0, 0.0, frac)
        for r in range(n_out):
            mat[r, i0[r]] += 1 - frac[r]
            mat[r, i1[r]] += frac[r]
        return mat
    # bicubic, 4 taps
    base = np.floor(src).astype(int)
    for r in range(n_out):
        for tap in range(-1, 3):
            idx = base[r] + tap
            w = _cubic_kernel(src[r] - idx)
            mat[r, np.clip(idx, 0, n_in - 1)] += w
    return mat


def _interp_bilinear_2d(x: np.ndarray, size: tp.Tuple[int, int]) -> np.ndarray:
    """torch F.interpolate(mode=bilinear, align_corners=False) on [H, W]."""
    mh = _interp_matrix_1d(x.shape[0], size[0], "bilinear", False)
    mw = _interp_matrix_1d(x.shape[1], size[1], "bilinear", False)
    return (mh @ x.astype(np.float64) @ mw.T).astype(x.dtype)


# ---------------------------------------------------------------------------
# flax modules
# ---------------------------------------------------------------------------


class _EvalBatchNorm(nn.Module):
    """Inference-mode BatchNorm over the channel axis (last) from running
    stats; the audio branch is frozen in the conditioner path."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [..., C]
        scale = self.param("scale", nn.initializers.ones, (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        mean = self.param("mean", nn.initializers.zeros, (self.features,), jnp.float32)
        var = self.param("var", nn.initializers.ones, (self.features,), jnp.float32)
        inv = scale * jax.lax.rsqrt(var + self.eps)
        return (x.astype(jnp.float32) - mean) * inv + bias


class AFFBlock(nn.Module):
    """Attentional Feature Fusion (laion-clap feature_fusion.py AFF, 2D)."""

    channels: int
    r: int = 4

    @nn.compact
    def __call__(self, x, residual):  # NHWC
        inter = self.channels // self.r

        def branch(h, name):
            h = nn.Conv(inter, (1, 1), param_dtype=jnp.float32, name=f"{name}_conv1")(h)
            h = _EvalBatchNorm(inter, name=f"{name}_bn1")(h)
            h = jax.nn.relu(h)
            h = nn.Conv(self.channels, (1, 1), param_dtype=jnp.float32, name=f"{name}_conv2")(h)
            return _EvalBatchNorm(self.channels, name=f"{name}_bn2")(h)

        s = (x + residual).astype(jnp.float32)
        local = branch(s, "local")
        glob = branch(jnp.mean(s, axis=(1, 2), keepdims=True), "global")
        sig = jax.nn.sigmoid(local + glob)
        return 2.0 * x * sig + 2.0 * residual * (1.0 - sig)


class PatchEmbed(nn.Module):
    """Conv patch embed (+ mel_conv2d/AFF fusion for the 3 local crops)."""

    cfg: HTSATConfig

    @nn.compact
    def __call__(self, x, is_longer=None):  # x: [B, C_in, H, W] channels-first mel img
        cfg = self.cfg
        ps, st = cfg.patch_size, cfg.patch_stride
        pad = ((ps - st[0]) // 2, (ps - st[1]) // 2)

        def proj(h):  # NHWC conv
            return nn.Conv(cfg.embed_dim, (ps, ps), strides=st,
                           padding=((pad[0], pad[0]), (pad[1], pad[1])),
                           param_dtype=jnp.float32, name="proj")(h)

        if cfg.enable_fusion:
            glob = proj(x[:, 0][..., None])  # [B, H, W, embed]
            b, gh, gw, _ = glob.shape
            # local crops: [B, 3, H, W] -> conv with kernel (ps, 3ps), stride (st, 3st)
            local = x[:, 1:].reshape(-1, x.shape[2], x.shape[3])[..., None]  # [B*3, H, W, 1]
            local = nn.Conv(cfg.embed_dim, (ps, ps * 3), strides=(st[0], st[1] * 3),
                            padding=((pad[0], pad[0]), (pad[1], pad[1])),
                            param_dtype=jnp.float32, name="mel_conv2d")(local)
            lb, lh, lw, lc = local.shape
            local = local.reshape(b, 3, lh, lw, lc)
            # torch: view(B,3,C,h,w).permute(0,2,3,1,4).flatten(3) -> [B,C,h,3w]
            local = local.transpose(0, 2, 1, 3, 4).reshape(b, lh, 3 * lw, lc)
            local = jnp.pad(local, ((0, 0), (0, 0), (0, gw - 3 * lw), (0, 0)))
            fused = AFFBlock(cfg.embed_dim, cfg.aff_block_r, name="fusion_model")(glob, local)
            sel = is_longer if is_longer is not None else jnp.zeros((b,), bool)
            h = jnp.where(sel[:, None, None, None], fused, glob)
        else:
            h = proj(x[:, 0][..., None])
        b, gh, gw, c = h.shape
        h = h.reshape(b, gh * gw, c)
        return nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32, name="norm")(h)


def _relative_position_index(window_size: int) -> np.ndarray:
    coords = np.stack(np.meshgrid(np.arange(window_size), np.arange(window_size), indexing="ij"))
    flat = coords.reshape(2, -1)
    rel = flat[:, :, None] - flat[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += window_size - 1
    rel[:, :, 1] += window_size - 1
    rel[:, :, 0] *= 2 * window_size - 1
    return rel.sum(-1)  # [ws*ws, ws*ws]


def _shift_attn_mask(height: int, width: int, window_size: int, shift: int) -> np.ndarray:
    """Additive mask [num_windows, ws², ws²] for shifted-window attention;
    static shapes -> computed once in numpy at trace time."""
    img = np.zeros((height, width))
    cnt = 0
    for hs in (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)):
        for ws_ in (slice(0, -window_size), slice(-window_size, -shift), slice(-shift, None)):
            img[hs, ws_] = cnt
            cnt += 1
    img = img.reshape(height // window_size, window_size, width // window_size, window_size)
    win = img.transpose(0, 2, 1, 3).reshape(-1, window_size * window_size)
    diff = win[:, None, :] - win[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


class WindowAttention(nn.Module):
    dim: int
    num_heads: int
    window_size: int
    qkv_bias: bool = True

    @nn.compact
    def __call__(self, x, attn_mask=None):  # x: [B*nW, N, C]
        n = self.window_size * self.window_size
        hd = self.dim // self.num_heads
        dense = lambda name: nn.Dense(self.dim, use_bias=self.qkv_bias,
                                      param_dtype=jnp.float32, name=name)
        q = dense("query")(x).reshape(-1, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        k = dense("key")(x).reshape(-1, n, self.num_heads, hd).transpose(0, 2, 1, 3)
        v = dense("value")(x).reshape(-1, n, self.num_heads, hd).transpose(0, 2, 1, 3)

        table = self.param("relative_position_bias_table", nn.initializers.zeros,
                           ((2 * self.window_size - 1) ** 2, self.num_heads), jnp.float32)
        rpi = _relative_position_index(self.window_size).reshape(-1)
        bias = table[rpi].reshape(n, n, self.num_heads).transpose(2, 0, 1)

        logits = jnp.einsum("bhid,bhjd->bhij", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(hd)
        logits = logits + bias[None]
        if attn_mask is not None:
            nw = attn_mask.shape[0]
            logits = logits.reshape(-1, nw, self.num_heads, n, n) + attn_mask[None, :, None]
            logits = logits.reshape(-1, self.num_heads, n, n)
        probs = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(v.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", probs, v).transpose(0, 2, 1, 3).reshape(-1, n, self.dim)
        return nn.Dense(self.dim, param_dtype=jnp.float32, name="out")(out)


class SwinBlock(nn.Module):
    cfg: HTSATConfig
    dim: int
    num_heads: int
    resolution: tp.Tuple[int, int]
    shift: int

    @nn.compact
    def __call__(self, x):  # [B, H*W, C]
        cfg = self.cfg
        h, w = self.resolution
        ws = min(cfg.window_size, min(self.resolution))
        shift = 0 if min(self.resolution) <= cfg.window_size else self.shift

        shortcut = x
        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                         name="layernorm_before")(x)
        b = x.shape[0]
        x = x.reshape(b, h, w, self.dim)
        if shift > 0:
            x = jnp.roll(x, (-shift, -shift), axis=(1, 2))
        # partition [B, H, W, C] -> [B*nW, ws*ws, C]
        x = x.reshape(b, h // ws, ws, w // ws, ws, self.dim)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(-1, ws * ws, self.dim)
        mask = jnp.asarray(_shift_attn_mask(h, w, ws, shift)) if shift > 0 else None
        x = WindowAttention(self.dim, self.num_heads, ws, cfg.qkv_bias,
                            name="attention")(x, mask)
        x = x.reshape(b, h // ws, w // ws, ws, ws, self.dim)
        x = x.transpose(0, 1, 3, 2, 4, 5).reshape(b, h, w, self.dim)
        if shift > 0:
            x = jnp.roll(x, (shift, shift), axis=(1, 2))
        x = shortcut + x.reshape(b, h * w, self.dim)

        y = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32,
                         name="layernorm_after")(x)
        y = nn.Dense(int(cfg.mlp_ratio * self.dim), param_dtype=jnp.float32, name="intermediate")(y)
        y = jax.nn.gelu(y, approximate=False)
        y = nn.Dense(self.dim, param_dtype=jnp.float32, name="output")(y)
        return x + y


class PatchMerging(nn.Module):
    dim: int
    resolution: tp.Tuple[int, int]
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):  # [B, H*W, C] -> [B, H/2*W/2, 2C]
        h, w = self.resolution
        b = x.shape[0]
        x = x.reshape(b, h, w, self.dim)
        x = jnp.concatenate(
            [x[:, 0::2, 0::2], x[:, 1::2, 0::2], x[:, 0::2, 1::2], x[:, 1::2, 1::2]], axis=-1
        ).reshape(b, (h // 2) * (w // 2), 4 * self.dim)
        x = nn.LayerNorm(epsilon=self.eps, param_dtype=jnp.float32, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, param_dtype=jnp.float32, name="reduction")(x)


class HTSATAudioEncoder(nn.Module):
    """Mel features [B, C, frames, mels] -> pooled latent [B, num_features]."""

    cfg: HTSATConfig = HTSATConfig()

    @nn.compact
    def __call__(self, input_features, is_longer=None):
        cfg = self.cfg
        # bn over mel bins (laion htsat.py bn0; HF batch_norm) — mel is the
        # last axis of [B, C, T, F], so channel-last BN applies directly
        x = _EvalBatchNorm(cfg.num_mel_bins, name="batch_norm")(input_features.astype(jnp.float32))
        x = self._reshape_mel2img(x)
        h = PatchEmbed(cfg, name="patch_embed")(x, is_longer)

        res = cfg.grid_size
        dim = cfg.embed_dim
        for i, (depth, heads) in enumerate(zip(cfg.depths, cfg.num_heads)):
            for j in range(depth):
                shift = 0 if j % 2 == 0 else cfg.window_size // 2
                h = SwinBlock(cfg, dim, heads, res, shift, name=f"stage{i}_block{j}")(h)
            if i < len(cfg.depths) - 1:
                h = PatchMerging(dim, res, cfg.layer_norm_eps, name=f"stage{i}_downsample")(h)
                res = (res[0] // 2, res[1] // 2)
                dim *= 2

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, param_dtype=jnp.float32, name="norm")(h)
        # latent = avgpool over all tokens (the reference's freq-group
        # reshape + AdaptiveAvgPool1d(1) reduces to a plain token mean)
        return jnp.mean(h, axis=1)

    def _reshape_mel2img(self, x):
        """[B, C, T, F] -> [B, C, spec, spec] (laion htsat.py reshape_wav2img:
        bicubic align-corners time stretch, then freq-ratio fold)."""
        cfg = self.cfg
        b, c, t, f = x.shape
        spec_w = cfg.spec_size * cfg.freq_ratio
        spec_h = cfg.spec_size // cfg.freq_ratio
        if t > spec_w or f > spec_h:
            raise ValueError(f"mel input ({t}x{f}) exceeds swin input ({spec_w}x{spec_h})")
        if t < spec_w:
            m = jnp.asarray(_interp_matrix_1d(t, spec_w, "bicubic", True), jnp.float32)
            x = jnp.einsum("st,bctf->bcsf", m, x)
        if f < spec_h:
            m = jnp.asarray(_interp_matrix_1d(f, spec_h, "bicubic", True), jnp.float32)
            x = jnp.einsum("sf,bctf->bcts", m, x)
        t, f = x.shape[2], x.shape[3]
        fr = cfg.freq_ratio
        x = x.reshape(b, c * fr, t // fr, f)
        x = x.transpose(0, 1, 3, 2)
        return x.reshape(b, c, f * fr, t // fr)


class CLAPAudioBranch(nn.Module):
    """HTSAT encoder + 2-layer MLP projection -> L2-normalized [B, 512]
    (laion-clap get_audio_embedding_from_data semantics)."""

    cfg: HTSATConfig = HTSATConfig()

    def setup(self):
        self.audio_branch = HTSATAudioEncoder(self.cfg)
        self.projection_0 = nn.Dense(self.cfg.projection_dim, param_dtype=jnp.float32)
        self.projection_2 = nn.Dense(self.cfg.projection_dim, param_dtype=jnp.float32)

    def __call__(self, input_features, is_longer=None):
        pooled = self.audio_branch(input_features, is_longer)
        h = self.projection_2(jax.nn.relu(self.projection_0(pooled)))
        return h / jnp.maximum(jnp.linalg.norm(h, axis=-1, keepdims=True), 1e-12)

    def embed_unnormalized(self, input_features, is_longer=None):
        pooled = self.audio_branch(input_features, is_longer)
        return self.projection_2(jax.nn.relu(self.projection_0(pooled)))


# ---------------------------------------------------------------------------
# checkpoint conversion (laion-clap and HF transformers naming)
# ---------------------------------------------------------------------------


def _normalize_laion_keys(sd: dict) -> dict:
    """laion-clap audio keys -> HF-equivalent canonical keys (the same renames
    HF's CLAP conversion applies): audio_branch->audio encoder, attn.qkv split,
    norm1/2 -> layernorm_before/after, mlp.fc1/fc2 -> intermediate/output."""
    out = {}
    for k, v in sd.items():
        k = k[len("module."):] if k.startswith("module.") else k
        if k.startswith("audio_projection."):
            k = (k.replace("audio_projection.0.", "audio_projection.linear1.")
                  .replace("audio_projection.2.", "audio_projection.linear2."))
            out[k] = v
            continue
        if not k.startswith("audio_branch."):
            continue
        k = "enc." + k[len("audio_branch."):]
        k = (k.replace(".norm1.", ".layernorm_before.")
              .replace(".norm2.", ".layernorm_after.")
              .replace(".mlp.fc1.", ".intermediate.dense.")
              .replace(".mlp.fc2.", ".output.dense.")
              .replace("enc.bn0.", "enc.batch_norm."))
        if ".attn.qkv." in k:
            v = np.asarray(v)
            d = v.shape[0] // 3
            for name, chunk in zip(("query", "key", "value"), (v[:d], v[d : 2 * d], v[2 * d :])):
                out[k.replace(".attn.qkv.", f".attention.self.{name}.")] = chunk
            continue
        k = (k.replace(".attn.proj.", ".attention.output.dense.")
              .replace(".attn.relative_position_bias_table",
                       ".attention.self.relative_position_bias_table"))
        out[k] = v
    return out


def _normalize_hf_keys(sd: dict) -> dict:
    out = {}
    for k, v in sd.items():
        if k.startswith("audio_projection."):
            out[k] = v
        elif k.startswith("audio_model.audio_encoder."):
            out["enc." + k[len("audio_model.audio_encoder."):]] = v
    return out


def convert_clap_audio_branch(sd: dict, cfg: HTSATConfig) -> dict:
    """Torch CLAP state dict (laion-clap or HF transformers) -> flax params
    for CLAPAudioBranch."""
    if any(k.startswith(("audio_branch.", "module.audio_branch.")) for k in sd):
        sd = _normalize_laion_keys(sd)
    else:
        sd = _normalize_hf_keys(sd)
    g = lambda k: np.asarray(sd[k])
    out: dict = {}

    def lin(dst, src, transpose=True):
        _set(out, dst + "/kernel", g(src + ".weight").T if transpose else g(src + ".weight"))
        if src + ".bias" in sd:
            _set(out, dst + "/bias", g(src + ".bias"))

    def ln(dst, src):
        _set(out, dst + "/scale", g(src + ".weight"))
        _set(out, dst + "/bias", g(src + ".bias"))

    def bn(dst, src):
        _set(out, dst + "/scale", g(src + ".weight"))
        _set(out, dst + "/bias", g(src + ".bias"))
        _set(out, dst + "/mean", g(src + ".running_mean"))
        _set(out, dst + "/var", g(src + ".running_var"))

    def conv(dst, src):
        # torch [O, I, kh, kw] -> flax [kh, kw, I, O]
        _set(out, dst + "/kernel", g(src + ".weight").transpose(2, 3, 1, 0))
        if src + ".bias" in sd:
            _set(out, dst + "/bias", g(src + ".bias"))

    e = "audio_branch/"
    bn(e + "batch_norm", "enc.batch_norm")
    conv(e + "patch_embed/proj", "enc.patch_embed.proj")
    ln(e + "patch_embed/norm", "enc.patch_embed.norm")
    if cfg.enable_fusion and "enc.patch_embed.mel_conv2d.weight" in sd:
        conv(e + "patch_embed/mel_conv2d", "enc.patch_embed.mel_conv2d")
        for br, pre in (("local", "local_att"), ("global", "global_att")):
            # torch Sequential: [conv, bn, relu, conv, bn] (global has a
            # leading AdaptiveAvgPool2d, shifting indices by one)
            off = 1 if br == "global" else 0
            fm = f"enc.patch_embed.fusion_model.{pre}"
            conv(e + f"patch_embed/fusion_model/{br}_conv1", f"{fm}.{0 + off}")
            bn(e + f"patch_embed/fusion_model/{br}_bn1", f"{fm}.{1 + off}")
            conv(e + f"patch_embed/fusion_model/{br}_conv2", f"{fm}.{3 + off}")
            bn(e + f"patch_embed/fusion_model/{br}_bn2", f"{fm}.{4 + off}")

    for i in range(len(cfg.depths)):
        for j in range(cfg.depths[i]):
            t = f"enc.layers.{i}.blocks.{j}"
            d = e + f"stage{i}_block{j}"
            ln(d + "/layernorm_before", t + ".layernorm_before")
            ln(d + "/layernorm_after", t + ".layernorm_after")
            for p in ("query", "key", "value"):
                lin(d + f"/attention/{p}", t + f".attention.self.{p}")
            _set(out, d + "/attention/relative_position_bias_table",
                 g(t + ".attention.self.relative_position_bias_table"))
            lin(d + "/attention/out", t + ".attention.output.dense")
            lin(d + "/intermediate", t + ".intermediate.dense")
            lin(d + "/output", t + ".output.dense")
        if i < len(cfg.depths) - 1:
            t = f"enc.layers.{i}.downsample"
            ln(e + f"stage{i}_downsample/norm", t + ".norm")
            lin(e + f"stage{i}_downsample/reduction", t + ".reduction")
    ln(e + "norm", "enc.norm")
    lin("projection_0", "audio_projection.linear1")
    lin("projection_2", "audio_projection.linear2")
    return out


def _set(tree: dict, path: str, value):
    parts = path.split("/")
    cur = tree
    for p in parts[:-1]:
        cur = cur.setdefault(p, {})
    cur[parts[-1]] = np.asarray(value)
