"""Audio LM: patterns, logits alignment, autoregressive generation."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from friendly_stable_audio_tools_tpu.models.codebook_patterns import (
    DelayedPatternProvider,
    ParallelPatternProvider,
    UnrolledPatternProvider,
    MusicLMPattern,
)
from friendly_stable_audio_tools_tpu.models.factory import create_model_from_config


def test_delayed_pattern_roundtrip():
    prov = DelayedPatternProvider(n_q=3)
    pattern = prov.get_pattern(8)
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 100, (2, 3, 8)), jnp.int32)
    seq, idx, mask = pattern.build_pattern_sequence(codes, special_token=1000)
    assert seq.shape[0] == 2 and seq.shape[1] == 3
    # delayed: sequence longer than T by max delay + special step
    assert seq.shape[2] == 8 + 2 + 1
    rev, _, rev_mask = pattern.revert_pattern_sequence(seq, special_token=-1)
    np.testing.assert_array_equal(np.asarray(rev[:, :, :8]), np.asarray(codes))


def test_delayed_pattern_structure():
    """First row (q=0) delayed by 0, second by 1 etc (reference docstring)."""
    prov = DelayedPatternProvider(n_q=3)
    pattern = prov.get_pattern(4)
    codes = jnp.arange(1, 5, dtype=jnp.int32)[None, None, :].repeat(3, 1)  # [[1..4]]*3
    seq, _, _ = pattern.build_pattern_sequence(codes, special_token=0)
    s = np.asarray(seq)[0]
    np.testing.assert_array_equal(s[0], [0, 1, 2, 3, 4, 0, 0])
    np.testing.assert_array_equal(s[1], [0, 0, 1, 2, 3, 4, 0])
    np.testing.assert_array_equal(s[2], [0, 0, 0, 1, 2, 3, 4])


@pytest.mark.parametrize("provider", [
    ParallelPatternProvider(4),
    DelayedPatternProvider(4),
    UnrolledPatternProvider(4),
    MusicLMPattern(4),
])
def test_pattern_providers_roundtrip(provider):
    pattern = provider.get_pattern(6)
    codes = jnp.asarray(np.random.default_rng(1).integers(0, 50, (1, 4, 6)), jnp.int32)
    seq, _, _ = pattern.build_pattern_sequence(codes, special_token=999)
    rev, _, mask = pattern.revert_pattern_sequence(seq, special_token=-1)
    got = np.asarray(rev)
    m = np.asarray(mask)
    np.testing.assert_array_equal(got[0][m], np.asarray(codes)[0][m])


TINY_LM_CONFIG = {
    "model_type": "lm",
    "sample_size": 512,
    "sample_rate": 16000,
    "audio_channels": 1,
    "model": {
        "pretransform": {
            "type": "autoencoder",
            "config": {
                "encoder": {"type": "oobleck", "config": {
                    "in_channels": 1, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
                    "latent_dim": 8}},
                "decoder": {"type": "oobleck", "config": {
                    "out_channels": 1, "channels": 8, "c_mults": [1, 2], "strides": [2, 4],
                    "latent_dim": 8}},
                "bottleneck": {"type": "dac_rvq", "config": {
                    "input_dim": 8, "n_codebooks": 2, "codebook_size": 32, "codebook_dim": 4}},
                "latent_dim": 8, "downsampling_ratio": 8, "io_channels": 1,
            },
        },
        "conditioning": {
            "configs": [
                {"id": "prompt", "type": "lut", "config": {"tokenizer_name": "t5-base", "max_length": 6}},
            ],
            "cond_dim": 16,
        },
        "lm": {
            "type": "continuous_transformer",
            "codebook_pattern": "delay",
            "cross_attention_cond_ids": ["prompt"],
            "config": {
                "embed_dim": 32, "depth": 2, "num_heads": 4,
                "cross_attn_cond_dim": 16,
            },
        },
    },
}


@pytest.fixture(scope="module")
def lm_model():
    return create_model_from_config(TINY_LM_CONFIG, init_rng=jax.random.PRNGKey(0))


def test_lm_compute_logits(lm_model):
    codes = jnp.asarray(np.random.default_rng(0).integers(0, 32, (2, 2, 16)), jnp.int32)
    cond = lm_model.conditioner([{"prompt": "hello"}, {"prompt": "there"}])
    out = lm_model.compute_logits(lm_model.params, codes, condition_tensors=cond)
    assert out.logits.shape == (2, 2, 16, 32)
    assert out.mask.shape == (2, 2, 16)
    # valid positions have finite logits
    valid = np.asarray(out.mask)
    logits = np.asarray(out.logits)
    assert np.isfinite(logits[valid]).all()


def test_lm_generate_and_decode(lm_model):
    cond = lm_model.conditioner([{"prompt": "beep"}])
    codes = lm_model.generate(
        max_gen_len=12, conditioning_tensors=cond, cfg_scale=1.5,
        rng=jax.random.PRNGKey(0), top_k=8, temp=1.0,
    )
    assert codes.shape == (1, 2, 12)
    assert (np.asarray(codes) >= 0).all() and (np.asarray(codes) < 32).all()

    audio = lm_model.generate_audio(
        max_gen_len=12, conditioning_tensors=cond, cfg_scale=1.0,
        rng=jax.random.PRNGKey(1), top_k=8,
    )
    assert audio.shape == (1, 1, 96)


def test_lm_generate_greedy_deterministic(lm_model):
    cond = lm_model.conditioner([{"prompt": "x"}])
    a = lm_model.generate(max_gen_len=8, conditioning_tensors=cond, temp=0.0, rng=jax.random.PRNGKey(0))
    b = lm_model.generate(max_gen_len=8, conditioning_tensors=cond, temp=0.0, rng=jax.random.PRNGKey(5))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
