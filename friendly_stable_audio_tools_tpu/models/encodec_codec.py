"""EnCodec compression codec (audiocraft / MusicGen tokenizer), native JAX.

The reference's AudiocraftCompressionPretransform loads
`audiocraft.models.CompressionModel.get_pretrained("facebook/encodec_32khz")`
(reference pretransforms.py:198-254) and only uses tokenize/decode_tokens.
This module reimplements that codec natively with the EXACT semantics of the
HuggingFace `transformers.EncodecModel` port (modeling_encodec.py) so released
checkpoints convert and reproduce:

  * asymmetric "same" padding with reflect mode and extra right-padding for
    stride alignment (EncodecConv1d._pad1d/_get_extra_padding_for_conv1d)
  * transposed convs computed full-length then trimmed left/right
    (EncodecConvTranspose1d.forward)
  * 2-layer residual LSTM bottleneck (EncodecLSTM)
  * plain-euclidean residual VQ without projections
    (EncodecResidualVectorQuantizer)

Layout: channels-last [B, T, C]. Weight conversion:
utils/torch_import.convert_encodec_state_dict.
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convs import WNConv1d, WNConvTranspose1d

# facebook/encodec_32khz (the MusicGen tokenizer the reference loads)
ENCODEC_PRESETS: tp.Dict[str, dict] = {
    "facebook/encodec_32khz": dict(
        audio_channels=1, num_filters=64, hidden_size=128,
        upsampling_ratios=(8, 5, 4, 4), codebook_size=2048, num_quantizers=4,
        kernel_size=7, last_kernel_size=7, residual_kernel_size=3,
        num_residual_layers=1, dilation_growth_rate=2, compress=2,
        num_lstm_layers=2, use_conv_shortcut=False, causal=False,
        pad_mode="reflect", sampling_rate=32000,
    ),
}


def _pad1d(x, pad_left: int, pad_right: int, mode: str):
    """HF EncodecConv1d._pad1d on [B, T, C]: reflect with zero extension when
    the signal is shorter than the pad."""
    if mode != "reflect":
        return jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)))
    length = x.shape[1]
    max_pad = max(pad_left, pad_right)
    extra = max_pad - length + 1 if length <= max_pad else 0
    if extra:
        x = jnp.pad(x, ((0, 0), (0, extra), (0, 0)))
    x = jnp.pad(x, ((0, 0), (pad_left, pad_right), (0, 0)), mode="reflect")
    return x[:, : x.shape[1] - extra, :]


class EncodecConv(nn.Module):
    """EncodecConv1d: pad (asymmetric/causal + stride-alignment extra) then
    valid conv. Static shapes -> padding computed in Python at trace time."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    dilation: int = 1
    causal: bool = False
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        k_eff = (self.kernel_size - 1) * self.dilation + 1
        pad_total = k_eff - self.stride
        length = x.shape[1]
        n_frames = (length - k_eff + pad_total) / self.stride + 1
        ideal = (math.ceil(n_frames) - 1) * self.stride + k_eff - pad_total
        extra = ideal - length
        if self.causal:
            x = _pad1d(x, pad_total, extra, self.pad_mode)
        else:
            right = pad_total // 2
            x = _pad1d(x, pad_total - right, right + extra, self.pad_mode)
        return WNConv1d(self.in_channels, self.out_channels, self.kernel_size,
                        stride=self.stride, dilation=self.dilation, padding=0,
                        name="conv")(x)


class EncodecConvTranspose(nn.Module):
    """EncodecConvTranspose1d: full-length transposed conv then trim."""

    in_channels: int
    out_channels: int
    kernel_size: int
    stride: int = 1
    causal: bool = False
    trim_right_ratio: float = 1.0

    @nn.compact
    def __call__(self, x):
        y = WNConvTranspose1d(self.in_channels, self.out_channels, self.kernel_size,
                              stride=self.stride, padding=0, name="conv")(x)
        pad_total = self.kernel_size - self.stride
        if self.causal:
            right = math.ceil(pad_total * self.trim_right_ratio)
        else:
            right = pad_total // 2
        left = pad_total - right
        return y[:, left: y.shape[1] - right, :]


class EncodecLSTM(nn.Module):
    """num_layers stacked LSTM + residual (HF EncodecLSTM). Gate order and
    bias conventions match torch nn.LSTM (see convert_encodec_state_dict)."""

    dim: int
    num_layers: int = 2

    @nn.compact
    def __call__(self, x):
        h = x
        for i in range(self.num_layers):
            cell = nn.OptimizedLSTMCell(self.dim, param_dtype=jnp.float32, name=f"cell{i}")
            h = nn.RNN(cell)(h)
        return h + x


class EncodecResnetBlock(nn.Module):
    dim: int
    dilations: tp.Sequence[int]
    residual_kernel_size: int = 3
    compress: int = 2
    use_conv_shortcut: bool = False
    causal: bool = False
    pad_mode: str = "reflect"

    @nn.compact
    def __call__(self, x):
        hidden = self.dim // self.compress
        kernel_sizes = (self.residual_kernel_size, 1)
        dims = (self.dim, hidden, self.dim)
        h = x
        for i, (k, d) in enumerate(zip(kernel_sizes, self.dilations)):
            h = jax.nn.elu(h)
            h = EncodecConv(dims[i], dims[i + 1], k, dilation=d, causal=self.causal,
                            pad_mode=self.pad_mode, name=f"block{i}")(h)
        if self.use_conv_shortcut:
            x = EncodecConv(self.dim, self.dim, 1, causal=self.causal,
                            pad_mode=self.pad_mode, name="shortcut")(x)
        return x + h


class EncodecEncoder(nn.Module):
    cfg: dict

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        scaling = 1
        x = EncodecConv(c["audio_channels"], c["num_filters"], c["kernel_size"],
                        causal=c["causal"], pad_mode=c["pad_mode"], name="conv_in")(x)
        for bi, ratio in enumerate(reversed(c["upsampling_ratios"])):
            cur = scaling * c["num_filters"]
            for j in range(c["num_residual_layers"]):
                x = EncodecResnetBlock(
                    cur, (c["dilation_growth_rate"]**j, 1),
                    residual_kernel_size=c["residual_kernel_size"], compress=c["compress"],
                    use_conv_shortcut=c["use_conv_shortcut"], causal=c["causal"],
                    pad_mode=c["pad_mode"], name=f"block{bi}_res{j}")(x)
            x = jax.nn.elu(x)
            x = EncodecConv(cur, cur * 2, ratio * 2, stride=ratio, causal=c["causal"],
                            pad_mode=c["pad_mode"], name=f"down{bi}")(x)
            scaling *= 2
        x = EncodecLSTM(scaling * c["num_filters"], c["num_lstm_layers"], name="lstm")(x)
        x = jax.nn.elu(x)
        x = EncodecConv(scaling * c["num_filters"], c["hidden_size"], c["last_kernel_size"],
                        causal=c["causal"], pad_mode=c["pad_mode"], name="conv_out")(x)
        return x


class EncodecDecoder(nn.Module):
    cfg: dict

    @nn.compact
    def __call__(self, x):
        c = self.cfg
        scaling = int(2 ** len(c["upsampling_ratios"]))
        x = EncodecConv(c["hidden_size"], scaling * c["num_filters"], c["kernel_size"],
                        causal=c["causal"], pad_mode=c["pad_mode"], name="conv_in")(x)
        x = EncodecLSTM(scaling * c["num_filters"], c["num_lstm_layers"], name="lstm")(x)
        for bi, ratio in enumerate(c["upsampling_ratios"]):
            cur = scaling * c["num_filters"]
            x = jax.nn.elu(x)
            x = EncodecConvTranspose(cur, cur // 2, ratio * 2, stride=ratio,
                                     causal=c["causal"], name=f"up{bi}")(x)
            for j in range(c["num_residual_layers"]):
                x = EncodecResnetBlock(
                    cur // 2, (c["dilation_growth_rate"]**j, 1),
                    residual_kernel_size=c["residual_kernel_size"], compress=c["compress"],
                    use_conv_shortcut=c["use_conv_shortcut"], causal=c["causal"],
                    pad_mode=c["pad_mode"], name=f"block{bi}_res{j}")(x)
            scaling //= 2
        x = jax.nn.elu(x)
        x = EncodecConv(c["num_filters"], c["audio_channels"], c["last_kernel_size"],
                        causal=c["causal"], pad_mode=c["pad_mode"], name="conv_out")(x)
        return x


class EncodecCodecModule(nn.Module):
    """encoder -> euclidean residual VQ (no projections) -> decoder."""

    cfg: dict

    def setup(self):
        from .bottleneck import ResidualVQ

        self.encoder = EncodecEncoder(self.cfg)
        self.quantizer = ResidualVQ(
            input_dim=self.cfg["hidden_size"],
            num_quantizers=self.cfg["num_quantizers"],
            codebook_size=self.cfg["codebook_size"],
            codebook_dim=self.cfg["hidden_size"],  # no projections
        )
        self.decoder = EncodecDecoder(self.cfg)

    def __call__(self, x):  # init path
        emb = self.encode(x)
        z, codes, _, _ = self.quantizer(emb)
        return self.decode(z), codes

    def encode(self, x):
        return self.encoder(x)

    def tokenize(self, x):
        emb = self.encoder(x)
        _, codes, _, _ = self.quantizer(emb)
        return codes  # [B, L, Q]

    def decode(self, z):
        return self.decoder(z)

    def from_codes(self, codes):  # [B, L, Q] -> [B, L, C]
        return self.quantizer.from_codes(codes)


class EncodecCodec:
    """Plain wrapper holding module + params (pattern: DACCodec)."""

    def __init__(self, model_type: str = "facebook/encodec_32khz"):
        if model_type not in ENCODEC_PRESETS:
            raise ValueError(f"Unknown EnCodec preset {model_type!r}; "
                             f"options: {sorted(ENCODEC_PRESETS)}")
        cfg = dict(ENCODEC_PRESETS[model_type])
        self.cfg = cfg
        self.sample_rate = cfg["sampling_rate"]
        self.num_quantizers = cfg["num_quantizers"]
        self.codebook_size = cfg["codebook_size"]
        self.latent_dim = cfg["hidden_size"]
        self.channels = cfg["audio_channels"]
        self.downsampling_ratio = 1
        for r in cfg["upsampling_ratios"]:
            self.downsampling_ratio *= r
        self.module = EncodecCodecModule(cfg)
        self.params: tp.Optional[dict] = None

    def init(self, rng):
        x = jnp.zeros((1, self.downsampling_ratio * 2, self.channels), jnp.float32)
        self.params = jax.jit(self.module.init)(rng, x)["params"]
        return self.params

    def _p(self, params):
        p = params if params is not None else self.params
        assert p is not None, "EncodecCodec has no params; load a converted checkpoint"
        return {"params": p}

    def tokenize_nwc(self, x, params=None):
        return self.module.apply(self._p(params), x, method="tokenize")

    def decode_tokens_nwc(self, codes, params=None):
        p = self._p(params)
        z = self.module.apply(p, codes, method="from_codes")
        return self.module.apply(p, z, method="decode")

    def load(self, path: str):
        """Load a HF `transformers.EncodecModel` torch checkpoint
        (model.safetensors / pytorch_model.bin) or a pre-converted JAX
        safetensors (keys '/'-joined)."""
        from ..models.utils import load_ckpt_state_dict
        from ..utils.common import _unflatten_dict

        sd = load_ckpt_state_dict(path)
        if any(".weight_v" in k or ".parametrizations." in k or ".weight_ih_l0" in k
               for k in sd):
            from ..utils.torch_import import convert_encodec_state_dict

            self.params = convert_encodec_state_dict(sd, self.cfg)
        else:
            self.params = _unflatten_dict(sd)
        self.params = jax.tree_util.tree_map(jnp.asarray, self.params)
        return self
