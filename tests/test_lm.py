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


def test_lm_generate_prompt_continuation(lm_model):
    """Generation seeded with init_data (prompt continuation) must run and
    preserve the prompt tokens (regression: the scan carried the full
    prefill logits and crashed on carry shape mismatch)."""
    cond = lm_model.conditioner([{"prompt": "beep"}])
    prompt = jnp.asarray(np.random.default_rng(0).integers(0, 32, (1, 2, 4)), jnp.int32)
    codes = lm_model.generate(
        max_gen_len=12, init_data=prompt, conditioning_tensors=cond,
        cfg_scale=1.0, rng=jax.random.PRNGKey(0), top_k=8, temp=1.0,
    )
    assert codes.shape == (1, 2, 12)
    np.testing.assert_array_equal(np.asarray(codes)[:, :, :4], np.asarray(prompt))
    assert (np.asarray(codes) >= 0).all()


def test_lm_generate_callback_fires(lm_model):
    """Reference lm.py:447-450: callback(step, total) per generated token."""
    calls = []
    cond = lm_model.conditioner([{"prompt": "beep"}])
    codes = lm_model.generate(
        max_gen_len=8, conditioning_tensors=cond, cfg_scale=1.0,
        rng=jax.random.PRNGKey(0), top_k=8, temp=1.0,
        callback=lambda i, n: calls.append((i, n)),
    )
    jax.block_until_ready(codes)
    assert len(calls) > 0, "callback never fired"
    steps, totals = zip(*calls)
    assert len(set(totals)) == 1 and totals[0] == len(calls)
    assert list(steps) == sorted(steps)


def test_lm_generate_use_cache_false_is_explicit(lm_model):
    with pytest.raises(NotImplementedError):
        lm_model.generate(max_gen_len=4, use_cache=False)


def test_lm_compute_logits_requires_rng_for_cfg_dropout(lm_model):
    codes = jnp.zeros((1, 2, 8), jnp.int32)
    cond = lm_model.conditioner([{"prompt": "beep"}])
    with pytest.raises(ValueError, match="rng"):
        lm_model.compute_logits(lm_model.params, codes, condition_tensors=cond,
                                cfg_dropout_prob=0.1, rng=None)


@pytest.mark.slow
def test_backbone_cached_decode_respects_prepend_mask():
    """Static-cache decode must mask padded prepend positions exactly like
    the training __call__ (regression: the cache ignored prepend_cond_mask,
    so decode attended to padding embeddings)."""
    from friendly_stable_audio_tools_tpu.models.lm_backbone import (
        ContinuousTransformerAudioLMBackbone,
    )

    bb = ContinuousTransformerAudioLMBackbone(embed_dim=32, prepend_cond_dim=16,
                                              depth=2, num_heads=4)
    rng = np.random.default_rng(0)
    B, T, PL = 2, 4, 3
    x = jnp.asarray(rng.standard_normal((B, T, 32)), jnp.float32) * 0.3
    pc = jnp.asarray(rng.standard_normal((B, PL, 16)), jnp.float32) * 0.3
    # sample 0: full prepend; sample 1: last two prepend positions padded
    pm = jnp.asarray([[1, 1, 1], [1, 0, 0]], jnp.int32)

    params = bb.init(jax.random.PRNGKey(0), x, prepend_cond=pc, prepend_cond_mask=pm)["params"]
    # de-zero residual out-projections so attention actually matters
    leaves, treedef = jax.tree_util.tree_flatten(params)
    keys = jax.random.split(jax.random.PRNGKey(1), len(leaves))
    leaves = [l + 0.05 * jax.random.normal(k, l.shape, l.dtype) for l, k in zip(leaves, keys)]
    params = jax.tree_util.tree_unflatten(treedef, leaves)

    out_train = bb.apply({"params": params}, x, prepend_cond=pc, prepend_cond_mask=pm)

    caches = bb.apply({"params": params}, B, T, PL, method="init_cache")
    out_pre, caches = bb.apply({"params": params}, x[:, :2], caches,
                               prepend_cond=pc, prepend_cond_mask=pm,
                               method="decode_step")
    outs = [out_pre]
    for t in range(2, T):
        o, caches = bb.apply({"params": params}, x[:, t:t + 1], caches,
                             method="decode_step")
        outs.append(o)
    out_dec = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(out_dec), np.asarray(out_train),
                               rtol=2e-4, atol=2e-4)
