"""Pretransforms: frozen (or optionally trainable) representation codecs that
sit between raw audio and the trainable model.

Behavioral parity target: reference `models/pretransforms.py:6-254`.

Unlike the reference (nn.Module with buffers), a Pretransform here is a plain
Python object owning its own flax module + params. Keeping it OUT of the
trainable pytree gives the optimizer/sharding machinery exactly the right
parameter set for free; gradient blocking is explicit `stop_gradient`.

Internal layout is channels-last ([B, T, C]); `encode`/`decode` keep the
reference's [B, C, T] public signature, while `encode_nwc`/`decode_nwc` are
the zero-transpose paths used inside jitted training/sampling steps.
"""

from __future__ import annotations

import typing as tp

import jax
import jax.numpy as jnp


class Pretransform:
    def __init__(self, enable_grad: bool, io_channels: int, is_discrete: bool):
        self.is_discrete = is_discrete
        self.io_channels = io_channels
        self.encoded_channels: tp.Optional[int] = None
        self.downsampling_ratio: tp.Optional[int] = None
        self.enable_grad = enable_grad

    # [B, C, T] public API
    def encode(self, x):
        return self.encode_nwc(jnp.asarray(x).transpose(0, 2, 1)).transpose(0, 2, 1)

    def decode(self, z):
        return self.decode_nwc(jnp.asarray(z).transpose(0, 2, 1)).transpose(0, 2, 1)

    def tokenize(self, x):
        raise NotImplementedError

    def decode_tokens(self, tokens):
        raise NotImplementedError

    # channels-last internal API
    def encode_nwc(self, x):
        raise NotImplementedError

    def decode_nwc(self, z):
        raise NotImplementedError

    def _maybe_stop_grad(self, x):
        return x if self.enable_grad else jax.lax.stop_gradient(x)


class AutoencoderPretransform(Pretransform):
    """Frozen AudioAutoencoder + latent scale (reference pretransforms.py:29-91).

    `model_half` maps to bfloat16 on TPU (fp16 has no hardware advantage and
    worse dynamics there). `chunked`/`iterate_batch` route to the scan-based
    streaming paths.
    """

    def __init__(self, model, scale: float = 1.0, model_half: bool = False,
                 iterate_batch: tp.Union[bool, int] = False, chunked: bool = False,
                 enable_grad: bool = False):
        is_discrete = model.module.bottleneck is not None and model.module.bottleneck.is_discrete
        super().__init__(enable_grad=enable_grad, io_channels=model.io_channels, is_discrete=is_discrete)
        self.model = model
        self.scale = scale
        self.downsampling_ratio = model.downsampling_ratio
        self.sample_rate = model.sample_rate
        self.model_half = model_half
        self.iterate_batch = iterate_batch
        self.encoded_channels = model.latent_dim
        self.chunked = chunked
        self.num_quantizers = getattr(model, "num_quantizers", None) if is_discrete else None
        self.codebook_size = getattr(model, "codebook_size", None) if is_discrete else None

    def _dtype(self, x):
        return x.astype(jnp.bfloat16) if self.model_half else x

    def encode_nwc(self, x, **kwargs):
        x = self._dtype(x)
        if self.chunked:
            z = self.model.encode_audio(
                x.transpose(0, 2, 1), chunked=True, **kwargs
            ).transpose(0, 2, 1)
        else:
            z = self.model._encode_nwc(x, **kwargs)[0]
        z = z.astype(jnp.float32) / self.scale
        return self._maybe_stop_grad(z)

    def decode_nwc(self, z, **kwargs):
        z = self._dtype(z * self.scale)
        if self.chunked:
            x = self.model.decode_audio(z.transpose(0, 2, 1), chunked=True, **kwargs).transpose(0, 2, 1)
        else:
            x = self.model._decode_nwc(z, **kwargs)
        return self._maybe_stop_grad(x.astype(jnp.float32))

    def tokenize(self, x, **kwargs):
        """audio [B, C, T] -> tokens [B, K, T'] (uniform public layout across
        pretransform types, matching DAC/audiocraft and the reference LM's
        assumption; the reference's own AE pretransform leaks lucidrains'
        [B, T', K] and is layout-incompatible with its LM — fixed here)."""
        assert self.is_discrete, "Cannot tokenize with a continuous model"
        x_nwc = jnp.asarray(x).transpose(0, 2, 1)
        _, info = self.model._encode_nwc(x_nwc, **kwargs)
        return info[self.model.module.bottleneck.tokens_id].transpose(0, 2, 1)

    def decode_tokens(self, tokens, **kwargs):
        """tokens [B, K, T'] -> audio [B, C, T] (see tokenize)."""
        assert self.is_discrete, "Cannot decode tokens with a continuous model"
        return self.model.decode_tokens(jnp.asarray(tokens).transpose(0, 2, 1), **kwargs)

    def load_params(self, params):
        self.model.params = params


class WaveletPretransform(Pretransform):
    """Multi-level 1-D DWT (reference pretransforms.py:94-111)."""

    def __init__(self, channels: int, levels: int, wavelet: str):
        super().__init__(enable_grad=False, io_channels=channels, is_discrete=False)
        from ..ops.wavelets import WaveletEncode1d, WaveletDecode1d

        self.encoder = WaveletEncode1d(channels, levels, wavelet)
        self.decoder = WaveletDecode1d(channels, levels, wavelet)
        self.downsampling_ratio = 2**levels
        self.encoded_channels = channels * self.downsampling_ratio

    def encode_nwc(self, x):
        return self.encoder(x)

    def decode_nwc(self, z):
        return self.decoder(z)


class PQMFPretransform(Pretransform):
    """Pseudo-QMF polyphase filterbank (reference pretransforms.py:114-133)."""

    def __init__(self, attenuation: int = 100, num_bands: int = 16):
        super().__init__(enable_grad=False, io_channels=1, is_discrete=False)
        from ..ops.pqmf import PQMF

        self.pqmf = PQMF(attenuation, num_bands)
        self.downsampling_ratio = num_bands
        self.encoded_channels = num_bands

    def encode_nwc(self, x):
        # [B, T, C] -> [B, T/bands, C*bands]
        return self.pqmf.forward_nwc(x)

    def decode_nwc(self, z):
        return self.pqmf.inverse_nwc(z)


class PretrainedDACPretransform(Pretransform):
    """Descript Audio Codec as a pretransform (reference pretransforms.py:136-195).

    The reference downloads DAC weights via `dac.utils.download`; here the
    checkpoint path is supplied locally (`local_path`: descript `weights.pth`
    or a pre-converted JAX safetensors) — there is no network access. The DAC
    architecture itself is native (models/dac_codec.py); weight conversion is
    utils/torch_import.convert_dac_codec_state_dict.
    """

    def __init__(self, model_type: str = "44khz", model_bitrate: str = "8kbps",
                 scale: float = 1.0, quantize_on_decode: bool = True, chunked: bool = True,
                 local_path: tp.Optional[str] = None):
        super().__init__(enable_grad=False, io_channels=1, is_discrete=True)
        from .dac_codec import DACCodec

        self.model = DACCodec(model_type, model_bitrate)
        if local_path is not None:
            self.model.load(local_path)
        self.quantize_on_decode = quantize_on_decode
        self.downsampling_ratio = self.model.downsampling_ratio  # 512 / 320
        self.io_channels = 1
        self.scale = scale
        self.chunked = chunked
        self.encoded_channels = self.model.latent_dim
        self.num_quantizers = self.model.n_codebooks
        self.codebook_size = self.model.codebook_size

    def init(self, rng):
        return self.model.init(rng)

    def encode_nwc(self, x):
        latents = self.model.encode_nwc(x)
        out = latents if self.quantize_on_decode else self.model.quantize_nwc(latents)
        if self.scale != 1.0:
            out = out / self.scale
        return self._maybe_stop_grad(out)

    def decode_nwc(self, z):
        if self.scale != 1.0:
            z = z * self.scale
        if self.quantize_on_decode:
            z = self.model.quantize_nwc(z)
        return self._maybe_stop_grad(self.model.decode_nwc(z))

    def tokenize(self, x):
        # [B, C, T] -> codes [B, Q, L] (reference returns model.encode(x)[1])
        x_nwc = jnp.asarray(x).transpose(0, 2, 1)
        return self.model.tokenize_nwc(x_nwc).transpose(0, 2, 1)

    def decode_tokens(self, tokens):
        # tokens [B, Q, L] -> audio [B, C, T]
        codes = jnp.asarray(tokens).transpose(0, 2, 1)
        latents = self.model.from_codes_nwc(codes)
        return self.model.decode_nwc(latents).transpose(0, 2, 1)


class AudiocraftCompressionPretransform(Pretransform):
    """EnCodec (audiocraft / MusicGen) tokenizer pretransform (reference
    pretransforms.py:198-254). Tokenize/decode_tokens only; continuous
    encode/decode assert like the reference. The reference downloads
    `facebook/encodec_32khz` from the hub; here the checkpoint path is
    supplied locally (`local_path`: HF EncodecModel torch weights or a
    pre-converted JAX safetensors)."""

    def __init__(self, model_type: str = "facebook/encodec_32khz", scale: float = 1.0,
                 quantize_on_decode: bool = True, local_path: tp.Optional[str] = None):
        super().__init__(enable_grad=False, io_channels=1, is_discrete=True)
        from .encodec_codec import EncodecCodec

        self.model = EncodecCodec(model_type)
        if local_path is not None:
            self.model.load(local_path)
        self.quantize_on_decode = quantize_on_decode
        self.downsampling_ratio = self.model.downsampling_ratio  # 640 @ 32 kHz
        self.sample_rate = self.model.sample_rate
        self.io_channels = self.model.channels
        self.scale = scale
        self.num_quantizers = self.model.num_quantizers
        self.codebook_size = self.model.codebook_size

    def init(self, rng):
        return self.model.init(rng)

    def encode_nwc(self, x):
        raise AssertionError("Audiocraft compression models do not support continuous encoding")

    def decode_nwc(self, z):
        raise AssertionError("Audiocraft compression models do not support continuous decoding")

    def tokenize(self, x):
        # [B, C, T] -> codes [B, Q, L] (reference returns model.encode(x)[0])
        x_nwc = jnp.asarray(x).transpose(0, 2, 1)
        return self.model.tokenize_nwc(x_nwc).transpose(0, 2, 1)

    def decode_tokens(self, tokens):
        # tokens [B, Q, L] -> audio [B, C, T]
        codes = jnp.asarray(tokens).transpose(0, 2, 1)
        return self.model.decode_tokens_nwc(codes).transpose(0, 2, 1)
