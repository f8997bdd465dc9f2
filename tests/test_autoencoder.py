"""Oobleck VAE: shapes, bottleneck behavior, chunked-streaming consistency."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from friendly_stable_audio_tools_tpu.models.autoencoders import (
    AudioAutoencoder,
    AudioAutoencoderModule,
    OobleckDecoder,
    OobleckEncoder,
)
from friendly_stable_audio_tools_tpu.models.bottleneck import (
    FSQBottleneck,
    L2Bottleneck,
    RVQBottleneck,
    TanhBottleneck,
    VAEBottleneck,
    DACRVQBottleneck,
    WassersteinBottleneck,
)


def tiny_ae(bottleneck=None, latent_dim=8, enc_latent_dim=None):
    enc = OobleckEncoder(
        in_channels=2, channels=8, latent_dim=enc_latent_dim or latent_dim,
        c_mults=(1, 2), strides=(2, 4), use_snake=True,
    )
    dec = OobleckDecoder(
        out_channels=2, channels=8, latent_dim=latent_dim,
        c_mults=(1, 2), strides=(2, 4), use_snake=True,
    )
    module = AudioAutoencoderModule(encoder=enc, decoder=dec, bottleneck=bottleneck)
    ae = AudioAutoencoder(
        module=module, latent_dim=latent_dim, downsampling_ratio=8,
        sample_rate=16000, io_channels=2,
    )
    ae.init(jax.random.PRNGKey(0))
    return ae


@pytest.mark.slow
def test_roundtrip_shapes(rng):
    ae = tiny_ae(VAEBottleneck(), latent_dim=8, enc_latent_dim=16)
    audio = jnp.asarray(rng.standard_normal((2, 2, 256)).astype(np.float32))
    z, info = ae.encode(audio, return_info=True, rng=jax.random.PRNGKey(1))
    assert z.shape == (2, 8, 32)
    assert "kl" in info and np.isfinite(float(info["kl"]))
    rec = ae.decode(z)
    assert rec.shape == (2, 2, 256)
    assert np.all(np.abs(np.asarray(rec)) <= 1.0)  # final tanh


def test_vae_bottleneck_deterministic_without_rng(rng):
    ae = tiny_ae(VAEBottleneck(), latent_dim=8, enc_latent_dim=16)
    audio = jnp.asarray(rng.standard_normal((1, 2, 128)).astype(np.float32))
    z1 = ae.encode(audio)
    z2 = ae.encode(audio)
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2))


@pytest.mark.parametrize(
    "bottleneck,enc_mult",
    [
        (TanhBottleneck(), 1),
        (L2Bottleneck(), 1),
        (WassersteinBottleneck(), 1),
        pytest.param(RVQBottleneck(num_quantizers=2, codebook_size=32, dim=8), 1,
                     marks=pytest.mark.slow),
        pytest.param(DACRVQBottleneck(input_dim=8, n_codebooks=2, codebook_size=32, codebook_dim=4), 1,
                     marks=pytest.mark.slow),
    ],
)
def test_bottlenecks_roundtrip(rng, bottleneck, enc_mult):
    ae = tiny_ae(bottleneck, latent_dim=8, enc_latent_dim=8 * enc_mult)
    audio = jnp.asarray(rng.standard_normal((1, 2, 128)).astype(np.float32))
    z, info = ae.encode(audio, return_info=True, rng=jax.random.PRNGKey(0))
    assert z.shape == (1, 8, 16)
    rec = ae.decode(z)
    assert rec.shape == (1, 2, 128)


def test_discrete_tokens_roundtrip(rng):
    b = DACRVQBottleneck(input_dim=8, n_codebooks=2, codebook_size=32, codebook_dim=4)
    ae = tiny_ae(b, latent_dim=8)
    audio = jnp.asarray(rng.standard_normal((1, 2, 128)).astype(np.float32))
    z, info = ae.encode(audio, return_info=True)
    codes = info["codes"]
    assert codes.shape == (1, 16, 2)
    rec = ae.decode_tokens(codes)
    assert rec.shape == (1, 2, 128)


def test_fsq_bottleneck(rng):
    b = FSQBottleneck(dim=6, levels=5)
    enc = OobleckEncoder(in_channels=2, channels=8, latent_dim=6, c_mults=(1, 2), strides=(2, 4))
    dec = OobleckDecoder(out_channels=2, channels=8, latent_dim=6, c_mults=(1, 2), strides=(2, 4))
    module = AudioAutoencoderModule(encoder=enc, decoder=dec, bottleneck=b)
    ae = AudioAutoencoder(module=module, latent_dim=6, downsampling_ratio=8, sample_rate=16000)
    ae.init(jax.random.PRNGKey(0))
    audio = jnp.asarray(rng.standard_normal((1, 2, 64)).astype(np.float32))
    z, info = ae.encode(audio, return_info=True)
    idx = np.asarray(info["quantizer_indices"])
    assert idx.min() >= 0 and idx.max() < 5**6
    # quantized latents take at most `levels` distinct values per channel
    assert len(np.unique(np.asarray(z))) <= 5 * 6


def test_chunked_encode_matches_unchunked(rng):
    ae = tiny_ae(TanhBottleneck())
    t = 8 * 64
    audio = jnp.asarray((0.1 * rng.standard_normal((1, 2, t))).astype(np.float32))
    z_full = ae.encode_audio(audio, chunked=False)
    z_chunk = ae.encode_audio(audio, chunked=True, chunk_size=16, overlap=8)
    assert z_chunk.shape == z_full.shape
    diff = np.abs(np.asarray(z_full) - np.asarray(z_chunk))
    # interior should agree closely (edges of each chunk are crossfaded)
    assert np.median(diff) < 5e-2


def test_chunked_decode_shape(rng):
    ae = tiny_ae(TanhBottleneck())
    z = jnp.asarray(rng.standard_normal((1, 8, 64)).astype(np.float32))
    x = ae.decode_audio(z, chunked=True, chunk_size=16, overlap=4)
    assert x.shape == (1, 2, 64 * 8)


def test_reconstruct_audio_chunked(rng):
    ae = tiny_ae(TanhBottleneck())
    audio = jnp.asarray((0.1 * rng.standard_normal((1, 2, 8 * 40))).astype(np.float32))
    rec = ae.reconstruct_audio(audio, chunked=True, chunk_size=16, overlap=4)
    assert rec.shape == audio.shape


def test_preprocess_audio_for_encoder():
    ae = tiny_ae(TanhBottleneck())
    mono = np.random.default_rng(0).standard_normal((1, 100)).astype(np.float32)
    batch = ae.preprocess_audio_for_encoder(mono, in_sr=16000)
    assert batch.shape[0] == 1 and batch.shape[1] == 2  # stereo coerced
    assert batch.shape[2] % ae.downsampling_ratio == 0


def test_chunked_decode_applies_soft_clip(rng):
    """Chunked decode must run the same full pipeline as non-chunked decode
    (regression: soft_clip/pretransform were skipped on the chunked path)."""
    ae = tiny_ae(VAEBottleneck(), latent_dim=8, enc_latent_dim=16)
    ae.soft_clip = True
    latents = jnp.asarray(rng.standard_normal((1, 8, 64)).astype(np.float32)) * 3.0
    full = np.asarray(ae.decode(latents))
    chunked = np.asarray(ae.decode_audio(latents, chunked=True, chunk_size=16, overlap=4))
    assert np.abs(full).max() <= 1.0 + 1e-6, "soft_clip missing on plain decode"
    assert np.abs(chunked).max() <= 1.0 + 1e-6, "soft_clip missing on CHUNKED decode"
    # interiors agree (chunk boundaries crossfade)
    assert np.abs(full - chunked).mean() < 0.05


def test_encode_iterate_batch_matches_full(rng):
    """iterate_batch (host micro-batching) must return the same latents and
    infos as the full-batch call (regression: it crashed without return_info
    and silently recomputed the full batch with it)."""
    ae = tiny_ae(VAEBottleneck(), latent_dim=8, enc_latent_dim=16)
    audio = jnp.asarray(rng.standard_normal((4, 2, 128)).astype(np.float32))
    z_full, info_full = ae.encode(audio, return_info=True, rng=jax.random.PRNGKey(0))
    z_it, info_it = ae.encode(audio, return_info=True, iterate_batch=2,
                              rng=jax.random.PRNGKey(0))
    assert z_it.shape == z_full.shape
    assert set(info_it) == set(info_full)
    z_plain = ae.encode(audio, iterate_batch=2, rng=jax.random.PRNGKey(0))
    assert z_plain.shape == z_full.shape


def test_soft_clip_read_from_decoder_config():
    """Factory must read soft_clip from decoder['config'] like the reference
    (regression: it looked at the top-level decoder dict and always got
    False)."""
    from friendly_stable_audio_tools_tpu.models.autoencoders import create_autoencoder_from_config

    cfg = {
        "sample_rate": 16000,
        "model": {
            "encoder": {"type": "oobleck", "config": {
                "in_channels": 2, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
                "latent_dim": 16, "use_snake": True}},
            "decoder": {"type": "oobleck", "config": {
                "out_channels": 2, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
                "latent_dim": 8, "use_snake": True, "soft_clip": True}},
            "bottleneck": {"type": "vae"},
            "latent_dim": 8, "downsampling_ratio": 8, "io_channels": 2,
        },
    }
    ae = create_autoencoder_from_config(cfg)
    assert ae.soft_clip is True
