"""Data layer: discovery, loading, cropping, metadata, loader batching."""

import json
import os

import numpy as np
import pytest

from friendly_stable_audio_tools_tpu.data.dataset import (
    AudioFolderDataset,
    DataLoader,
    create_dataloader_from_config,
    fast_scandir,
)
from friendly_stable_audio_tools_tpu.data.modification import (
    Mono,
    PadCrop_Normalized_T,
    PhaseFlipper,
    Stereo,
)
from friendly_stable_audio_tools_tpu.utils.audio_utils import is_silence, write_wav


@pytest.fixture(scope="module")
def audio_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("audio")
    rng = np.random.default_rng(0)
    for i in range(3):
        t = np.linspace(0, 1, 16000)
        tone = 0.5 * np.sin(2 * np.pi * (220 * (i + 1)) * t).astype(np.float32)
        write_wav(str(d / f"tone{i}.wav"), 16000, np.stack([tone, tone]))
        with open(d / f"tone{i}.json", "w") as f:
            json.dump({"prompt": f"tone {i}"}, f)
    # a file in a subdirectory
    sub = d / "sub"
    sub.mkdir()
    write_wav(str(sub / "noise.wav"), 16000, rng.standard_normal((1, 8000)).astype(np.float32) * 0.1)
    return str(d)


def test_fast_scandir_finds_files(audio_dir):
    _, files = fast_scandir(audio_dir, [".wav"])
    assert len(files) == 4


def test_dataset_item(audio_dir):
    ds = AudioFolderDataset([audio_dir], sample_size=4096, sample_rate=16000, force_channels="stereo")
    audio, info = ds[0]
    assert audio.shape == (2, 4096)
    assert np.abs(audio).max() <= 1.0
    assert "prompt" in info
    assert "seconds_start" in info and "seconds_total" in info
    assert info["padding_mask"].shape == (4096,)


def test_dataset_sidecar_metadata(audio_dir):
    ds = AudioFolderDataset([audio_dir], sample_size=4096, sample_rate=16000)
    prompts = {ds[i][1]["prompt"] for i in range(len(ds)) for _ in [0]}
    assert any(p.startswith("tone") for p in prompts)


def test_dataloader_batches(audio_dir):
    ds = AudioFolderDataset([audio_dir], sample_size=2048, sample_rate=16000)
    # one epoch per __iter__ (4 samples / batch 2 = 2 batches); epoch_steps
    # is an upper bound, not a wrap-around
    dl = DataLoader(ds, batch_size=2, epoch_steps=3)
    batches = list(iter(dl))
    assert len(batches) == 2
    assert len(dl) == 2
    # a second iteration reshuffles and yields a fresh epoch (no leaked state)
    assert len(list(iter(dl))) == 2
    # epoch_steps below the epoch length truncates
    assert len(list(iter(DataLoader(ds, batch_size=2, epoch_steps=1)))) == 1
    audio, metas = batches[0]
    assert audio.shape == (2, 2, 2048)
    assert len(metas) == 2


def test_create_dataloader_from_config(audio_dir):
    cfg = {"dataset_type": "audio_dir", "datasets": [{"path": audio_dir}], "random_crop": True}
    dl = create_dataloader_from_config(cfg, batch_size=2, sample_size=1024, sample_rate=16000, audio_channels=2)
    audio, metas = next(iter(dl))
    assert audio.shape == (2, 2, 1024)


def test_custom_metadata_reject(audio_dir, tmp_path):
    mod = tmp_path / "custom_md.py"
    mod.write_text(
        "def get_custom_metadata(info, audio):\n"
        "    if 'noise' in info['path']:\n"
        "        return {'__reject__': True}\n"
        "    return {'custom': 'yes'}\n"
    )
    cfg = {
        "dataset_type": "audio_dir",
        "datasets": [{"path": audio_dir}],
        "custom_metadata_module": str(mod),
    }
    dl = create_dataloader_from_config(cfg, batch_size=2, sample_size=1024, sample_rate=16000, audio_channels=2)
    audio, metas = next(iter(dl))
    assert all("noise" not in m["path"] for m in metas)
    assert all(m.get("custom") == "yes" for m in metas)


def test_pad_crop_normalized():
    pc = PadCrop_Normalized_T(n_samples=100, sample_rate=10, randomize=False)
    src = np.ones((2, 250), np.float32)
    chunk, t0, t1, ss, st, mask = pc(src)
    assert chunk.shape == (2, 100)
    assert ss == 0 and st == 25
    assert mask.sum() == 100


def test_channel_ops():
    mono = np.ones((1, 10), np.float32)
    assert Stereo()(mono).shape == (2, 10)
    stereo = np.ones((2, 10), np.float32)
    assert Mono()(stereo).shape == (1, 10)


def test_is_silence():
    assert is_silence(np.zeros((2, 100)) + 1e-6)
    assert not is_silence(np.ones((2, 100)) * 0.5)


# ---------------------------------------------------------------------------
# native tar-shard (WebDataset-format) pipeline
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def tar_shards(tmp_path_factory):
    import io as _io
    import json as _json
    import tarfile

    d = tmp_path_factory.mktemp("shards")
    rng = np.random.default_rng(0)
    for shard in range(2):
        with tarfile.open(d / f"shard-{shard:04d}.tar", "w") as tf:
            for i in range(4):
                key = f"s{shard}_item{i}"
                t = np.linspace(0, 1.0, 16000, endpoint=False)
                tone = (0.3 * np.sin(2 * np.pi * (200 + 100 * i) * t)).astype(np.float32)
                buf = _io.BytesIO()
                from friendly_stable_audio_tools_tpu.utils.audio_utils import write_wav

                import tempfile, os as _os
                with tempfile.NamedTemporaryFile(suffix=".wav", delete=False) as f:
                    write_wav(f.name, 16000, np.stack([tone, tone]))
                    fname = f.name
                tf.add(fname, arcname=f"{key}.wav")
                _os.unlink(fname)
                meta = _json.dumps({"prompt": f"tone {shard}/{i}"}).encode()
                info = tarfile.TarInfo(f"{key}.json")
                info.size = len(meta)
                tf.addfile(info, _io.BytesIO(meta))
    return d


def test_tar_shard_samples_grouping(tar_shards):
    from friendly_stable_audio_tools_tpu.data.dataset import tar_shard_samples

    samples = list(tar_shard_samples(str(tar_shards / "shard-0000.tar")))
    assert len(samples) == 4
    for s in samples:
        assert set(s.keys()) == {"__key__", "__url__", "wav", "json"}


def test_tar_shard_pipe_url(tar_shards):
    from friendly_stable_audio_tools_tpu.data.dataset import tar_shard_samples

    url = f"pipe:cat {tar_shards / 'shard-0001.tar'}"
    samples = list(tar_shard_samples(url))
    assert len(samples) == 4


def test_s3_webdataloader_local(tar_shards):
    from friendly_stable_audio_tools_tpu.data.dataset import S3DatasetConfig, S3WebDataLoader

    loader = S3WebDataLoader(
        [S3DatasetConfig(id="t", s3_path="unused")],
        batch_size=3, sample_size=8000, sample_rate=16000, epoch_steps=4,
        shard_urls=[str(p) for p in sorted(tar_shards.glob("*.tar"))],
    )
    batches = list(loader)
    assert len(batches) == 4 == len(loader)
    audio, metas = batches[0]
    assert audio.shape == (3, 2, 8000)
    assert audio.dtype == np.float32
    assert all("prompt" in m and "padding_mask" in m for m in metas)


def test_s3_webdataloader_reject(tar_shards, tmp_path):
    from friendly_stable_audio_tools_tpu.data.dataset import S3DatasetConfig, S3WebDataLoader

    cfg = S3DatasetConfig(id="t", s3_path="unused")
    seen = []

    def md(info, audio):
        seen.append(info["prompt"])
        return {"__reject__": "item2" in info.get("prompt", "")} if "item2" in info.get("prompt", "") else {}

    cfg.custom_metadata_fn = md
    loader = S3WebDataLoader(
        [cfg], batch_size=2, sample_size=4000, sample_rate=16000, epoch_steps=3,
        shard_urls=[str(p) for p in sorted(tmp_path.parent.glob("shards*/*.tar")) or sorted(tar_shards.glob("*.tar"))],
    )
    for audio, metas in loader:
        assert all("item2" not in m["prompt"] for m in metas)


def test_get_s3_shard_urls_parsing(monkeypatch):
    from friendly_stable_audio_tools_tpu.data import dataset as D

    class FakeResult:
        stdout = (
            "2024-01-01 00:00:00    1234 data/train/shard-0000.tar\n"
            "2024-01-01 00:00:00    1234 data/train/notes.txt\n"
            "2024-01-01 00:00:00    1234 data/train/shard-0001.tar\n"
        )

    import subprocess
    monkeypatch.setattr(subprocess, "run", lambda *a, **k: FakeResult())
    urls = D.get_s3_shard_urls("s3://bucket/data/train/")
    assert urls == [
        "pipe:aws s3 cp s3://bucket/data/train/shard-0000.tar -",
        "pipe:aws s3 cp s3://bucket/data/train/shard-0001.tar -",
    ]


def test_generate_yaml_flatten_and_rank_sharding(tmp_path):
    """generate.py prompt flattening + [rank::world] work sharding
    (reference generate.py:38-50,119-120)."""
    import sys
    sys.path.insert(0, "/root/repo")
    from generate import parse_cond_yaml

    yml = tmp_path / "conds.yaml"
    yml.write_text(
        "techno:\n"
        "  a:\n    prompt: deep techno\n    seconds_total: 30\n"
        "  b:\n    prompt: acid techno\n    seconds_total: 20\n"
        "jazz:\n"
        "  solo:\n    piano:\n      prompt: jazz piano\n      seconds_total: 10\n"
    )
    conds = parse_cond_yaml(str(yml))
    assert set(conds) == {"techno/a", "techno/b", "jazz/solo/piano"}
    assert conds["jazz/solo/piano"]["prompt"] == "jazz piano"

    paths = sorted(conds)
    world = 2
    shards = [paths[r::world] for r in range(world)]
    assert sorted(sum(shards, [])) == paths
    assert all(len(s) >= 1 for s in shards)
