"""Golden-parity tests for the native HTSAT/CLAP-audio stack vs HF transformers
(transformers' ClapAudioModel is a faithful port of laion-clap's HTSAT, so it
serves as the executable reference for both numerics and checkpoint layout)."""

import numpy as np
import pytest

jax = pytest.importorskip("jax")
import jax.numpy as jnp  # noqa: E402

torch = pytest.importorskip("torch")

from friendly_stable_audio_tools_tpu.models.htsat import (  # noqa: E402
    CLAPAudioBranch,
    ClapAudioFeatureProcessor,
    HTSATConfig,
    convert_clap_audio_branch,
    log_mel_spectrogram,
    mel_filter_bank,
)


def tiny_cfg(enable_fusion):
    # spec 64, mels 32 -> freq_ratio 2; grid 16x16, last-stage res == window
    return HTSATConfig(
        spec_size=64, patch_size=4, patch_stride=(4, 4), num_mel_bins=32,
        window_size=2, embed_dim=16, depths=(1, 2, 1, 1), num_heads=(1, 2, 2, 4),
        enable_fusion=enable_fusion, projection_dim=24,
        sample_rate=8000, fft_size=256, hop_size=128, fmin=50.0, fmax=3500.0,
        max_length_s=2,
    )


def hf_model(cfg: HTSATConfig):
    from transformers import ClapAudioConfig
    from transformers.models.clap.modeling_clap import ClapAudioModelWithProjection

    hf_cfg = ClapAudioConfig(
        spec_size=cfg.spec_size, patch_size=cfg.patch_size, patch_stride=list(cfg.patch_stride),
        num_mel_bins=cfg.num_mel_bins, window_size=cfg.window_size,
        patch_embeds_hidden_size=cfg.embed_dim, depths=list(cfg.depths),
        num_attention_heads=list(cfg.num_heads), mlp_ratio=cfg.mlp_ratio,
        qkv_bias=cfg.qkv_bias, enable_fusion=cfg.enable_fusion, fusion_type=None,
        hidden_size=cfg.num_features, projection_dim=cfg.projection_dim,
        drop_path_rate=0.0, attention_probs_dropout_prob=0.0, hidden_dropout_prob=0.0,
        aff_block_r=cfg.aff_block_r,
    )
    torch.manual_seed(0)
    model = ClapAudioModelWithProjection(hf_cfg).eval()
    # randomize BN running stats so eval-mode BN conversion is actually tested
    for m in model.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            m.running_mean.normal_(0.0, 0.5)
            m.running_var.uniform_(0.5, 2.0)
    return model


@pytest.mark.parametrize("enable_fusion", [False, True])
@pytest.mark.slow
def test_htsat_matches_hf(enable_fusion):
    cfg = tiny_cfg(enable_fusion)
    model = hf_model(cfg)

    rng = np.random.RandomState(0)
    n_mel_ch = 4 if enable_fusion else 1
    frames = 120  # < spec*freq_ratio=128 -> exercises bicubic time stretch
    feats = rng.randn(2, n_mel_ch, frames, cfg.num_mel_bins).astype(np.float32)
    is_longer = np.array([True, False]) if enable_fusion else np.array([False, False])

    with torch.no_grad():
        ref = model(
            input_features=torch.tensor(feats),
            is_longer=torch.tensor(is_longer.reshape(-1, 1)),
        ).audio_embeds.numpy()

    params = convert_clap_audio_branch(model.state_dict(), cfg)
    branch = CLAPAudioBranch(cfg)
    got = branch.apply(
        {"params": params}, jnp.asarray(feats), jnp.asarray(is_longer),
        method=branch.embed_unnormalized,
    )
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_laion_key_conversion_equivalent():
    """The laion-clap naming path (fused qkv, norm1/mlp.fc names) converts to
    the same params as the HF naming path."""
    cfg = tiny_cfg(True)
    model = hf_model(cfg)
    hf_sd = {k: v for k, v in model.state_dict().items()}

    # synthesize a laion-style state dict by inverse-renaming the HF one
    laion_sd = {}
    for k, v in hf_sd.items():
        if k.startswith("audio_projection."):
            k = (k.replace(".linear1.", ".0.").replace(".linear2.", ".2."))
            laion_sd[k] = v
            continue
        assert k.startswith("audio_model.audio_encoder.")
        k = "audio_branch." + k[len("audio_model.audio_encoder."):]
        k = (k.replace(".layernorm_before.", ".norm1.")
              .replace(".layernorm_after.", ".norm2.")
              .replace(".intermediate.dense.", ".mlp.fc1.")
              .replace(".attention.output.dense.", ".attn.proj.")
              .replace(".attention.self.relative_position_bias_table",
                       ".attn.relative_position_bias_table")
              .replace("audio_branch.batch_norm.", "audio_branch.bn0."))
        if ".blocks." in k:
            k = k.replace(".output.dense.", ".mlp.fc2.")
        laion_sd[k] = v
    # fuse q/k/v back into laion's single qkv tensor
    fused = {}
    for k in list(laion_sd):
        if ".attention.self.query." in k:
            base = k.replace(".attention.self.query.", ".attn.qkv.")
            q = laion_sd.pop(k)
            key = laion_sd.pop(k.replace("query", "key"))
            v = laion_sd.pop(k.replace("query", "value"))
            fused[base] = torch.cat([q, key, v], dim=0)
    laion_sd.update(fused)

    p_hf = convert_clap_audio_branch(hf_sd, cfg)
    p_laion = convert_clap_audio_branch(laion_sd, cfg)
    flat_hf = jax.tree_util.tree_leaves_with_path(p_hf)
    flat_laion = dict(jax.tree_util.tree_leaves_with_path(p_laion))
    assert len(flat_hf) == len(flat_laion)
    for path, leaf in flat_hf:
        np.testing.assert_array_equal(leaf, flat_laion[path])


def test_mel_frontend_matches_hf_extractor():
    from transformers import ClapFeatureExtractor

    fe = ClapFeatureExtractor()  # 48 kHz / 1024 fft / 480 hop / 64 mels
    # filterbanks
    for norm, scale, ref_fb in ((None, "htk", fe.mel_filters), ("slaney", "slaney", fe.mel_filters_slaney)):
        fb = mel_filter_bank(513, 64, 0.0, 14000.0, 48000, norm=norm, mel_scale=scale)
        np.testing.assert_allclose(fb, ref_fb, atol=1e-8)

    rng = np.random.RandomState(1)
    wav = rng.randn(480_000).astype(np.float64) * 0.1
    ref = fe._np_extract_fbank_features(wav, fe.mel_filters)
    got = log_mel_spectrogram(wav, mel_filter_bank(513, 64, 0.0, 14000.0, 48000, None, "htk"))
    assert got.shape == ref.shape == (1001, 64)
    np.testing.assert_allclose(got, np.asarray(ref), atol=1e-4)


@pytest.mark.parametrize("case", ["short_pad", "exact", "long"])
def test_feature_processor_matches_hf_extractor(case):
    from transformers import ClapFeatureExtractor

    cfg = HTSATConfig(enable_fusion=True, fmin=0.0)
    proc = ClapAudioFeatureProcessor(cfg, truncation="fusion", padding="repeatpad")
    fe = ClapFeatureExtractor(truncation="fusion", padding="repeatpad")

    n = {"short_pad": 123_456, "exact": 480_000, "long": 700_000}[case]
    wav = np.random.RandomState(2).randn(n) * 0.05

    np.random.seed(7)
    ref = fe([wav], sampling_rate=48_000, return_tensors="np")
    got_feats, got_longer = proc([wav], rng=np.random.RandomState(7))
    # the random crop indices come from different RNG streams; compare
    # deterministic channels (global shrink) + shapes, and everything when
    # no randomness is involved
    assert got_feats.shape == tuple(ref["input_features"].shape)
    np.testing.assert_array_equal(got_longer, np.asarray(ref["is_longer"]).reshape(-1))
    if case in ("short_pad", "exact"):
        np.testing.assert_allclose(got_feats, np.asarray(ref["input_features"]), atol=1e-4)
    else:
        # global-shrink channel: torch computes bilinear weights in float32;
        # ours are exact float64 -> ~3e-3 dB of torch-side rounding
        np.testing.assert_allclose(got_feats[:, 0], np.asarray(ref["input_features"])[:, 0], atol=5e-3)


def test_rand_trunc_processor():
    cfg = HTSATConfig(enable_fusion=False, fmin=0.0)
    proc = ClapAudioFeatureProcessor(cfg)
    feats, longer = proc([np.random.RandomState(3).randn(500_000)], rng=np.random.RandomState(0))
    assert feats.shape == (1, 1, 1001, 64)
    assert longer[0]


@pytest.mark.slow
def test_clap_audio_conditioner_end_to_end():
    from friendly_stable_audio_tools_tpu.models.conditioners import CLAPAudioConditioner
    import dataclasses

    cfg = dataclasses.replace(tiny_cfg(True), projection_dim=512)
    cond = CLAPAudioConditioner(output_dim=768, enable_fusion=True, htsat_config=cfg)
    cond.init(jax.random.PRNGKey(0))
    # one short (repeatpad), one long (fusion) clip; stereo + mono inputs
    audios = [
        np.random.RandomState(0).randn(2, cfg.sample_rate).astype(np.float32),
        np.random.RandomState(1).randn(cfg.sample_rate * 3).astype(np.float32),
    ]
    emb, mask = cond(audios)
    assert emb.shape == (2, 1, 768)
    assert mask.shape == (2, 1) and bool(mask.all())
    assert np.isfinite(np.asarray(emb)).all()
