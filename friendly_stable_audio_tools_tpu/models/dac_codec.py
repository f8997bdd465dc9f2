"""Descript Audio Codec (DAC) encoder/decoder architecture, native JAX.

The reference wraps `dac.model.dac.Encoder/Decoder`
(reference models/autoencoders.py:197-231: DACEncoderWrapper/DACDecoderWrapper)
— weight-normalized conv stacks with single-parameter Snake activations,
dilated residual units (1/3/9), strided down/up-sampling. Used by
`dac_2048_32_vae.json` / `stable_audio_1_0_vae.json` encoder/decoder types.

Layout: channels-last [B, T, C].
"""

from __future__ import annotations

import math
import typing as tp

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.activations import Snake
from ..ops.convs import WNConv1d, WNConvTranspose1d


class DACResidualUnit(nn.Module):
    dim: int
    dilation: int

    @nn.compact
    def __call__(self, x):
        pad = ((7 - 1) * self.dilation) // 2
        y = Snake(self.dim, name="snake1")(x)
        y = WNConv1d(self.dim, self.dim, 7, dilation=self.dilation, padding=pad, name="conv1")(y)
        y = Snake(self.dim, name="snake2")(y)
        y = WNConv1d(self.dim, self.dim, 1, name="conv2")(y)
        return x + y


class DACEncoderBlock(nn.Module):
    dim: int  # output dim
    stride: int

    @nn.compact
    def __call__(self, x):
        for i, d in enumerate((1, 3, 9)):
            x = DACResidualUnit(self.dim // 2, d, name=f"res{i}")(x)
        x = Snake(self.dim // 2, name="snake")(x)
        x = WNConv1d(self.dim // 2, self.dim, 2 * self.stride, stride=self.stride,
                     padding=math.ceil(self.stride / 2), name="down")(x)
        return x


class DACEncoder(nn.Module):
    """dac.model.dac.Encoder: d_model doubles per stride."""

    d_model: int = 64
    strides: tp.Sequence[int] = (2, 4, 8, 8)
    d_latent: int = 64
    in_channels: int = 1

    @nn.compact
    def __call__(self, x):
        d = self.d_model
        x = WNConv1d(self.in_channels, d, 7, padding=3, name="conv_in")(x)
        for i, s in enumerate(self.strides):
            d *= 2
            x = DACEncoderBlock(d, s, name=f"block{i}")(x)
        x = Snake(d, name="snake_out")(x)
        x = WNConv1d(d, self.d_latent, 3, padding=1, name="conv_out")(x)
        return x


class DACDecoderBlock(nn.Module):
    in_dim: int
    out_dim: int
    rate: int

    @nn.compact
    def __call__(self, x):
        x = Snake(self.in_dim, name="snake")(x)
        x = WNConvTranspose1d(self.in_dim, self.out_dim, 2 * self.rate, stride=self.rate,
                              padding=math.ceil(self.rate / 2), name="up")(x)
        for i, d in enumerate((1, 3, 9)):
            x = DACResidualUnit(self.out_dim, d, name=f"res{i}")(x)
        return x


class DACDecoder(nn.Module):
    """dac.model.dac.Decoder."""

    input_channel: int = 64
    channels: int = 1536
    rates: tp.Sequence[int] = (8, 8, 4, 2)
    d_out: int = 1

    @nn.compact
    def __call__(self, x):
        x = WNConv1d(self.input_channel, self.channels, 7, padding=3, name="conv_in")(x)
        ch = self.channels
        for i, r in enumerate(self.rates):
            x = DACDecoderBlock(ch, ch // 2, r, name=f"block{i}")(x)
            ch //= 2
        x = Snake(ch, name="snake_out")(x)
        x = WNConv1d(ch, self.d_out, 7, padding=3, name="conv_out")(x)
        return jnp.tanh(x)


class DACEncoderWrapper(nn.Module):
    """reference autoencoders.py:197-219."""

    in_channels: int = 1
    latent_dim: tp.Optional[int] = None
    d_model: int = 64
    strides: tp.Sequence[int] = (2, 4, 8, 8)

    @nn.compact
    def __call__(self, x):
        encoder_out_dim = self.d_model * (2 ** len(self.strides))
        x = DACEncoder(d_model=self.d_model, strides=self.strides,
                       d_latent=encoder_out_dim, in_channels=self.in_channels,
                       name="encoder")(x)
        if self.latent_dim is not None:
            fan_in = encoder_out_dim
            x = nn.Dense(self.latent_dim, param_dtype=jnp.float32, name="proj_out")(x)
        return x


class DACDecoderWrapper(nn.Module):
    """reference autoencoders.py:222-231."""

    latent_dim: int
    out_channels: int = 1
    channels: int = 1536
    rates: tp.Sequence[int] = (8, 8, 4, 2)

    @nn.compact
    def __call__(self, x):
        return DACDecoder(input_channel=self.latent_dim, channels=self.channels,
                          rates=self.rates, d_out=self.out_channels, name="decoder")(x)


# ---------------------------------------------------------------------------
# Full pretrained DAC codec (encoder + residual VQ + decoder)
# ---------------------------------------------------------------------------
#
# The reference's PretrainedDACPretransform wraps `dac.DAC.load(...)` — the
# complete Descript codec (reference pretransforms.py:136-195). Here the codec
# is assembled from this package's native pieces; weights come from a local
# descript `weights.pth` (converted on load) or a pre-converted JAX
# safetensors — there is no hub download in this environment.

# (model_type, model_bitrate) -> architecture hyperparameters of the released
# descript-audio-codec checkpoints.
DAC_PRESETS: tp.Dict[tp.Tuple[str, str], dict] = {
    ("44khz", "8kbps"): dict(encoder_dim=64, encoder_rates=(2, 4, 8, 8),
                             decoder_dim=1536, decoder_rates=(8, 8, 4, 2),
                             n_codebooks=9, codebook_size=1024, codebook_dim=8,
                             sample_rate=44100),
    ("44khz", "16kbps"): dict(encoder_dim=64, encoder_rates=(2, 4, 8, 8),
                              decoder_dim=1536, decoder_rates=(8, 8, 4, 2),
                              n_codebooks=18, codebook_size=1024, codebook_dim=8,
                              sample_rate=44100),
    ("24khz", "8kbps"): dict(encoder_dim=64, encoder_rates=(2, 4, 5, 8),
                             decoder_dim=1536, decoder_rates=(8, 5, 4, 2),
                             n_codebooks=32, codebook_size=1024, codebook_dim=8,
                             sample_rate=24000),
    ("16khz", "8kbps"): dict(encoder_dim=64, encoder_rates=(2, 4, 5, 8),
                             decoder_dim=1536, decoder_rates=(8, 5, 4, 2),
                             n_codebooks=12, codebook_size=1024, codebook_dim=8,
                             sample_rate=16000),
}


class DACCodecModule(nn.Module):
    """dac.model.dac.DAC: encoder -> residual VQ (with per-stage in/out
    projections + cosine assignment) -> decoder. Layout [B, T, C]."""

    encoder_dim: int = 64
    encoder_rates: tp.Sequence[int] = (2, 4, 8, 8)
    decoder_dim: int = 1536
    decoder_rates: tp.Sequence[int] = (8, 8, 4, 2)
    n_codebooks: int = 9
    codebook_size: int = 1024
    codebook_dim: int = 8
    in_channels: int = 1

    def setup(self):
        from .bottleneck import ResidualVQ

        self.latent_dim = self.encoder_dim * (2 ** len(self.encoder_rates))
        self.encoder = DACEncoder(d_model=self.encoder_dim, strides=self.encoder_rates,
                                  d_latent=self.latent_dim, in_channels=self.in_channels)
        self.quantizer = ResidualVQ(input_dim=self.latent_dim,
                                    num_quantizers=self.n_codebooks,
                                    codebook_size=self.codebook_size,
                                    codebook_dim=self.codebook_dim,
                                    normalize=True)
        self.decoder = DACDecoder(input_channel=self.latent_dim, channels=self.decoder_dim,
                                  rates=self.decoder_rates, d_out=self.in_channels)

    def __call__(self, x):  # init path: touch everything
        latents = self.encode(x)
        z, codes, _, _ = self.quantize(latents)
        return self.decode(z), codes

    def encode(self, x):
        """audio [B, T, 1] -> pre-quantizer latents [B, L, latent_dim]."""
        return self.encoder(x)

    def quantize(self, latents, n_quantizers: tp.Optional[int] = None):
        return self.quantizer(latents, n_quantizers=n_quantizers)

    def decode(self, z):
        return self.decoder(z)

    def from_codes(self, codes):
        return self.quantizer.from_codes(codes)


class DACCodec:
    """Plain wrapper holding the flax module + params (same pattern as
    AudioAutoencoder). All methods are channels-last [B, T, C]."""

    def __init__(self, model_type: str = "44khz", model_bitrate: str = "8kbps"):
        key = (model_type, model_bitrate)
        if key not in DAC_PRESETS:
            raise ValueError(f"Unknown DAC preset {key}; options: {sorted(DAC_PRESETS)}")
        cfg = DAC_PRESETS[key]
        self.sample_rate = cfg["sample_rate"]
        self.n_codebooks = cfg["n_codebooks"]
        self.codebook_size = cfg["codebook_size"]
        self.latent_dim = cfg["encoder_dim"] * (2 ** len(cfg["encoder_rates"]))
        self.downsampling_ratio = 1
        for r in cfg["encoder_rates"]:
            self.downsampling_ratio *= r
        self.module = DACCodecModule(**{k: v for k, v in cfg.items() if k != "sample_rate"})
        self.params: tp.Optional[dict] = None

    def init(self, rng):
        x = jnp.zeros((1, self.downsampling_ratio * 2, 1), jnp.float32)
        self.params = jax.jit(self.module.init)(rng, x)["params"]
        return self.params

    def _p(self, params):
        p = params if params is not None else self.params
        assert p is not None, "DACCodec has no params; load a converted checkpoint"
        return {"params": p}

    def encode_nwc(self, x, params=None):
        return self.module.apply(self._p(params), x, method="encode")

    def quantize_nwc(self, latents, n_quantizers=None, params=None):
        return self.module.apply(self._p(params), latents, n_quantizers, method="quantize")[0]

    def tokenize_nwc(self, x, params=None):
        latents = self.encode_nwc(x, params=params)
        p = self._p(params)
        return self.module.apply(p, latents, method="quantize")[1]  # [B, L, Q]

    def decode_nwc(self, z, params=None):
        return self.module.apply(self._p(params), z, method="decode")

    def from_codes_nwc(self, codes, params=None):
        return self.module.apply(self._p(params), codes, method="from_codes")

    def load(self, path: str):
        """Load weights from a descript torch checkpoint (`weights.pth`) or a
        pre-converted JAX safetensors/npz (keys '/'-joined)."""
        from ..models.utils import load_ckpt_state_dict
        from ..utils.common import _unflatten_dict

        sd = load_ckpt_state_dict(path)
        if any(".weight_v" in k or ".parametrizations." in k for k in sd):
            from ..utils.torch_import import convert_dac_codec_state_dict

            self.params = convert_dac_codec_state_dict(
                sd, n_blocks=len(self.module.encoder_rates))
        else:
            self.params = _unflatten_dict(sd)
        self.params = jax.tree_util.tree_map(jnp.asarray, self.params)
        return self
