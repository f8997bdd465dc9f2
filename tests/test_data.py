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
    dl = DataLoader(ds, batch_size=2, epoch_steps=3)
    batches = list(iter(dl))
    assert len(batches) == 3
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
