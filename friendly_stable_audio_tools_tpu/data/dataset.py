"""Datasets and data loaders (host-side; feeds numpy batches to the device).

Parity target: reference `data/dataset.py:28-597` — `fast_scandir` recursive
discovery, `AudioFolderDataset` (load/resample/random-crop with timing
metadata, channel coercion, phase-flip augment, sidecar JSON metadata,
pluggable custom-metadata with `__reject__` resampling, failure-retry),
`collation_fn`, and `create_dataloader_from_config` dispatch (audio_dir | s3).

Differences (documented):
  * Audio decode chain: wav via scipy/stdlib, then optional soundfile /
    torchaudio / pedalboard if installed. mp3 decode requires one of the
    optional decoders (the reference hard-depends on pedalboard).
  * The loader is a thread-prefetching iterator (JAX wants pinned numpy
    batches on the host; there is no CUDA pinned-memory machinery to manage).
  * The S3/WebDataset path shells out to `aws s3` exactly like the reference
    but is constructed lazily (requires aws cli + webdataset at runtime).
"""

from __future__ import annotations

import importlib.util
import io
import json
import logging
import os
import queue
import random
import threading
import time
import typing as tp
from pathlib import Path

import numpy as np

from ..utils.common import print_once
from .modification import Mono, PadCrop_Normalized_T, PhaseFlipper, Stereo

AUDIO_KEYS = ("flac", "wav", "mp3", "m4a", "ogg", "opus")


def fast_scandir(dir: str, ext: tp.List[str], keywords: tp.Optional[tp.List[str]] = None):
    """Fast recursive scan (reference :28-75)."""
    subfolders, files = [], []
    keywords = [k.lower() for k in keywords] if keywords else None
    banned_words = ["paxheader", "__macosx"]
    ext = ["." + x if x[0] != "." else x for x in ext]
    try:
        for f in os.scandir(dir):
            try:
                if f.is_dir():
                    subfolders.append(f.path)
                elif f.is_file():
                    is_hidden = os.path.basename(f.path).startswith(".")
                    has_ext = os.path.splitext(f.name)[1].lower() in ext
                    name_lower = f.name.lower()
                    has_keyword = any(k in name_lower for k in keywords) if keywords else True
                    # PaxHeader/__MACOSX junk is excluded regardless of keywords
                    has_banned = any(b in name_lower for b in banned_words)
                    if has_ext and not is_hidden and has_keyword and not has_banned:
                        files.append(f.path)
            except Exception:
                pass
    except Exception:
        pass
    for d in list(subfolders):
        sf, fl = fast_scandir(d, ext, keywords)
        subfolders.extend(sf)
        files.extend(fl)
    return subfolders, files


def get_audio_filenames(paths, keywords=None,
                        exts=[".wav", ".mp3", ".flac", ".ogg", ".aif", ".opus"]):
    """reference :78-94."""
    filenames = []
    if isinstance(paths, str):
        paths = [paths]
    for p in paths:
        _, files = fast_scandir(p, exts, keywords)
        filenames.extend(files)
    return filenames


def load_audio_file(filename: str) -> tp.Tuple[np.ndarray, int]:
    """Decode to (C, T) float32 + sample rate. Decoder chain documented in the
    module docstring."""
    ext = filename.split(".")[-1].lower()
    if ext == "wav":
        try:
            from scipy.io import wavfile

            sr, data = wavfile.read(filename)
            data = np.asarray(data)
            if data.dtype == np.int16:
                data = data.astype(np.float32) / 32768.0
            elif data.dtype == np.int32:
                data = data.astype(np.float32) / 2147483648.0
            elif data.dtype == np.uint8:
                data = (data.astype(np.float32) - 128.0) / 128.0
            else:
                data = data.astype(np.float32)
            audio = data.T if data.ndim == 2 else data[None, :]
            return np.ascontiguousarray(audio), int(sr)
        except Exception:
            pass
    # optional decoders
    try:
        import soundfile as sf  # type: ignore

        data, sr = sf.read(filename, dtype="float32", always_2d=True)
        return np.ascontiguousarray(data.T), int(sr)
    except Exception:
        pass
    try:
        import torchaudio  # type: ignore

        audio, sr = torchaudio.load(filename)
        return audio.numpy(), int(sr)
    except Exception:
        pass
    try:
        from pedalboard.io import AudioFile  # type: ignore

        with AudioFile(filename) as f:
            audio = f.read(f.frames)
            return np.asarray(audio, np.float32), int(f.samplerate)
    except Exception:
        pass
    raise RuntimeError(
        f"Cannot decode {filename}: no decoder for '.{ext}' available "
        "(wav works out of the box; mp3/flac/ogg need soundfile, torchaudio, "
        "or pedalboard installed)"
    )


def resample_audio(audio: np.ndarray, in_sr: int, out_sr: int) -> np.ndarray:
    if in_sr == out_sr:
        return audio
    import math

    from scipy.signal import resample_poly

    g = math.gcd(int(in_sr), int(out_sr))
    return resample_poly(audio, out_sr // g, in_sr // g, axis=-1).astype(np.float32)


class AudioFolderDataset:
    """reference :97-197."""

    def __init__(
        self,
        paths,
        sample_size: int = 65536,
        sample_rate: int = 48000,
        keywords=None,
        relpath: tp.Optional[str] = None,
        random_crop: bool = True,
        force_channels: str = "stereo",
        custom_metadata_fn: tp.Optional[tp.Callable] = None,
        augment_phase: bool = True,
    ):
        assert force_channels in ("mono", "stereo")
        self.relpath = relpath
        self.sr = sample_rate
        self.force_channels = force_channels
        self.custom_metadata_fn = custom_metadata_fn
        self.encoding = Stereo() if force_channels == "stereo" else Mono()
        self.augs = PhaseFlipper() if augment_phase else (lambda x: x)
        self.pad_crop = PadCrop_Normalized_T(sample_size, sample_rate, randomize=random_crop)

        print_once("->-> searching audio files...")
        self.filenames = get_audio_filenames(paths, keywords)
        print_once(f"->-> Found {len(self.filenames)} files.")

    def load_file(self, filename):
        audio, in_sr = load_audio_file(filename)
        return resample_audio(audio, in_sr, self.sr)

    def __len__(self):
        return len(self.filenames)

    def __getitem__(self, idx):
        audio_filename = self.filenames[idx]
        try:
            start_time = time.time()
            audio = self.load_file(audio_filename)
            audio, t_start, t_end, seconds_start, seconds_total, padding_mask = self.pad_crop(audio)
            audio = self.encoding(audio)
            audio = self.augs(audio)
            audio = np.clip(audio, -1, 1)

            info = {"path": audio_filename}
            if self.relpath:
                info["relpath"] = os.path.relpath(audio_filename, self.relpath)
            info["timestamps"] = (t_start, t_end)
            info["seconds_start"] = seconds_start
            info["seconds_total"] = seconds_total
            info["padding_mask"] = padding_mask
            info["load_time"] = time.time() - start_time

            metadata_path = Path(audio_filename).with_suffix(".json")
            if metadata_path.exists():
                with metadata_path.open("r") as f:
                    info.update(json.load(f))

            if self.custom_metadata_fn is not None:
                custom = self.custom_metadata_fn(info, audio)
                info.update(custom)
                if info.get("__reject__"):
                    return self[random.randrange(len(self))]

            info.setdefault("prompt", "This is a dummy prompt")
            return (audio, info)
        except RecursionError:
            raise
        except Exception as e:
            print(f"Couldn't load file {audio_filename}: {e}")
            return self[random.randrange(len(self))]


def collation_fn(samples):
    """Stack tensors / arrays, pass lists through (reference :388-401)."""
    batched = list(zip(*samples))
    result = []
    for b in batched:
        if isinstance(b[0], (int, float)):
            result.append(np.array(b))
        elif isinstance(b[0], np.ndarray):
            result.append(np.stack(b))
        else:
            result.append(list(b))
    return result


def audio_metadata_collation(samples):
    """(audio [B,C,T], list-of-metadata-dicts) — the layout the trainers use."""
    audios = np.stack([s[0] for s in samples])
    metas = [s[1] for s in samples]
    return audios, metas


class _WorkerError:
    """Marker carrying a prefetch-worker exception to the consumer thread."""

    def __init__(self, exc: BaseException):
        self.exc = exc


class DataLoader:
    """Minimal shuffling/batching loader with background thread prefetch;
    `num_workers` decode threads per batch. One epoch per __iter__."""

    def __init__(self, dataset, batch_size: int, shuffle: bool = True, drop_last: bool = True,
                 collate_fn=audio_metadata_collation, num_workers: int = 2, prefetch: int = 4,
                 epoch_steps: tp.Optional[int] = None, seed: int = 0):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.collate_fn = collate_fn
        self.num_workers = max(1, num_workers)
        self.prefetch = prefetch
        self.epoch_steps = epoch_steps
        self._rng = random.Random(seed)

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if n == 0 and self.drop_last and len(self.dataset) > 0:
            n = 1  # small-dataset oversampling still yields full batches
        return min(n, self.epoch_steps) if self.epoch_steps else n

    def _index_stream(self):
        """Index batches for ONE epoch (iteration terminates; callers loop
        epochs — Trainer.fit wraps the loader in its own while loop)."""
        n = len(self.dataset)
        if n == 0:
            raise ValueError(
                "DataLoader: dataset is empty (no decodable samples found)")
        if n < self.batch_size and self.drop_last:
            # A dataset smaller than one batch with drop_last would yield an
            # EMPTY epoch. Tiny smoke datasets (example/dataset has 2 files)
            # instead oversample with replacement; random_crop makes repeated
            # files distinct samples. (drop_last=False loaders keep their
            # deterministic partial-batch epoch.)
            logging.warning(
                "Dataset has %d samples < batch_size %d: sampling with "
                "replacement to fill batches.", n, self.batch_size,
            )
            yield [self._rng.randrange(n) for _ in range(self.batch_size)]
            return
        order = list(range(n))
        if self.shuffle:
            self._rng.shuffle(order)
        tail = len(order) % self.batch_size
        if self.drop_last and tail:
            order = order[: len(order) - tail]
        for i in range(0, len(order), self.batch_size):
            yield order[i : i + self.batch_size]

    def __iter__(self):
        import concurrent.futures

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def safe_put(item) -> bool:
            # bounded put that respects `stop`: a worker stuck forever in
            # q.put on an abandoned iterator would leak the thread + batches
            while not stop.is_set():
                try:
                    q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def worker():
            try:
                with concurrent.futures.ThreadPoolExecutor(self.num_workers) as pool:
                    for idxs in self._index_stream():
                        if stop.is_set():
                            return
                        items = list(pool.map(self.dataset.__getitem__, idxs))
                        if not safe_put(self.collate_fn(items)):
                            return
            except BaseException as e:  # propagate: a dead silent worker hangs q.get
                safe_put(_WorkerError(e))
                return
            safe_put(None)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        steps = 0
        try:
            while True:
                if self.epoch_steps is not None and steps >= self.epoch_steps:
                    break
                batch = q.get()
                if batch is None:
                    break
                if isinstance(batch, _WorkerError):
                    raise batch.exc
                yield batch
                steps += 1
        finally:
            stop.set()


# ---------------------------------------------------------------------------
# S3 WebDataset path (reference :200-512)
# ---------------------------------------------------------------------------


class S3DatasetConfig:
    def __init__(self, id: str, s3_path: str, custom_metadata_fn=None, profile=None):
        self.id = id
        self.s3_path = s3_path
        self.custom_metadata_fn = custom_metadata_fn
        self.profile = profile


def get_s3_shard_urls(s3_path: str, profile: tp.Optional[str] = None):
    """`aws s3 ls` shard discovery -> pipe: urls (reference :234-280)."""
    import subprocess

    cmd = ["aws", "s3", "ls", "--recursive", s3_path]
    if profile:
        cmd += ["--profile", profile]
    out = subprocess.run(cmd, capture_output=True, text=True, check=True).stdout
    urls = []
    bucket = s3_path.replace("s3://", "").split("/")[0]
    for line in out.splitlines():
        key = line.split()[-1]
        if key.endswith(".tar"):
            url = f"pipe:aws s3 cp s3://{bucket}/{key} -"
            if profile:
                url += f" --profile {profile}"
            urls.append(url)
    return urls


def _base_plus_ext(path: str):
    """Split 'dir/name.a.b' -> ('dir/name', 'a.b') (WebDataset key grouping)."""
    import re

    m = re.match(r"^((?:.*/)?.+?)\.([^/]*)$", path)
    if m is None:
        return None, None
    return m.group(1), m.group(2)


def _open_shard(url: str):
    """Open a shard as a binary stream: local path, file: url, or a
    'pipe:<command>' url (the S3 path pipes `aws s3 cp <key> -`, exactly like
    the reference's WebDataset urls, reference :234-335)."""
    import io
    import subprocess

    if url.startswith("pipe:"):
        proc = subprocess.Popen(url[len("pipe:"):], shell=True, stdout=subprocess.PIPE,
                                stderr=subprocess.DEVNULL)
        return proc.stdout
    if url.startswith("file:"):
        url = url[len("file:"):]
    return open(url, "rb")


def tar_shard_samples(url: str):
    """Stream one tar shard into grouped sample dicts
    {'__key__', '__url__', '<ext>': bytes, ...} — a native replacement for
    webdataset's tarfile_to_samples + (patched) group_by_keys
    (reference :200-228: groups strictly by consecutive prefix)."""
    import tarfile

    stream = _open_shard(url)
    current: tp.Optional[dict] = None
    try:
        with tarfile.open(fileobj=stream, mode="r|*") as tf:
            for member in tf:
                if not member.isfile():
                    continue
                prefix, suffix = _base_plus_ext(member.name)
                if prefix is None:
                    continue
                suffix = suffix.lower()
                if current is None or prefix != current["__key__"]:
                    if current is not None and len(current) > 2:
                        yield current
                    current = {"__key__": prefix, "__url__": url}
                f = tf.extractfile(member)
                if f is not None:
                    current[suffix] = f.read()
        if current is not None and len(current) > 2:
            yield current
    finally:
        try:
            stream.close()
        except Exception:
            pass


class S3WebDataLoader:
    """Tar-shard streaming pipeline (reference :404-512), implemented natively
    (tarfile + subprocess pipes) instead of depending on the `webdataset`
    package: infinite resampled shard order, shard streaming with
    warn-and-continue error handling, per-sample decode/crop/augment, silence
    and `__reject__` filtering, full batches only, `epoch_steps` batches per
    epoch. Yields (audio [B, C, T] float32, list-of-metadata-dicts)."""

    def __init__(self, datasets: tp.List[S3DatasetConfig], batch_size, sample_size,
                 sample_rate=48000, num_workers=8, epoch_steps=1000, random_crop=True,
                 force_channels="stereo", augment_phase=True, shard_urls=None, seed=0,
                 shuffle_buffer: int = 256, **kwargs):
        self.datasets = datasets
        self.batch_size = batch_size
        self.sample_size = sample_size
        self.sample_rate = sample_rate
        self.random_crop = random_crop
        self.force_channels = force_channels
        self.augment_phase = augment_phase
        self.epoch_steps = epoch_steps
        self.pad_crop = PadCrop_Normalized_T(sample_size, sample_rate, randomize=random_crop)
        self.encoding = Stereo() if force_channels == "stereo" else Mono()
        self.augs = PhaseFlipper() if augment_phase else (lambda x: x)
        self._rng = random.Random(seed)
        self.shuffle_buffer = max(1, int(shuffle_buffer))

        # shards carry their SOURCE dataset so per-dataset custom_metadata_fn
        # applies only to that dataset's samples (applying every dataset's fn
        # to every sample mislabels or drops cross-dataset samples)
        if shard_urls is None:
            shards = []
            for ds in datasets:
                shards.extend((u, ds) for u in get_s3_shard_urls(ds.s3_path, ds.profile))
        else:  # explicit url list (tests): attribute to the sole dataset if any
            only = datasets[0] if len(datasets) == 1 else None
            shards = [(u, only) for u in shard_urls]
        assert shards, "no .tar shards found"
        self.shards = shards
        self.shard_urls = [u for u, _ in shards]
        self.data_loader = self  # API parity with the wds-based layout

    def preprocess(self, sample, ds: tp.Optional[S3DatasetConfig] = None):
        from ..utils.audio_utils import is_silence

        found_key = None
        for k in sample.keys():
            if k.split(".")[-1] in AUDIO_KEYS:
                found_key = k
                break
        if found_key is None:
            return None
        audio, in_sr = _decode_bytes(sample[found_key], found_key.split(".")[-1])
        audio = resample_audio(audio, in_sr, self.sample_rate)
        if is_silence(audio):
            return None
        audio, t_start, t_end, seconds_start, seconds_total, padding_mask = self.pad_crop(audio)
        audio = self.augs(self.encoding(audio))
        audio = np.clip(audio, -1, 1)
        info = json.loads(sample.get("json", b"{}")) if "json" in sample else {}
        info.update({
            "timestamps": (t_start, t_end),
            "seconds_start": seconds_start,
            "seconds_total": seconds_total,
            "padding_mask": padding_mask,
        })
        fns = ([ds.custom_metadata_fn] if ds is not None
               else [d.custom_metadata_fn for d in self.datasets])
        for fn in fns:
            if fn is not None:
                info.update(fn(info, audio))
        if info.get("__reject__"):
            return None
        info.setdefault("prompt", "This is a dummy prompt")
        return (audio, info)

    def _sample_stream(self):
        """Infinite stream: random shard (with replacement, like
        wds.ResampledShards), warn-and-continue on shard/sample errors, and a
        reservoir shuffle buffer (the wds pipeline's .shuffle — without it
        every batch is batch_size CONSECUTIVE items of one shard)."""
        buf: list = []
        while True:
            url, ds = self._rng.choice(self.shards)
            try:
                for sample in tar_shard_samples(url):
                    try:
                        out = self.preprocess(sample, ds)
                    except Exception as e:  # warn-and-continue (reference :338-341)
                        logging.warning(f"sample error in {url}: {e!r}")
                        continue
                    if out is None:
                        continue
                    if self.shuffle_buffer <= 1:
                        yield out
                        continue
                    buf.append(out)
                    if len(buf) >= self.shuffle_buffer:
                        i = self._rng.randrange(len(buf))
                        buf[i], buf[-1] = buf[-1], buf[i]
                        yield buf.pop()
            except Exception as e:
                logging.warning(f"shard error for {url}: {e!r}")

    def __len__(self):
        return self.epoch_steps

    def __iter__(self):
        stream = self._sample_stream()
        for _ in range(self.epoch_steps):
            batch = [next(stream) for _ in range(self.batch_size)]
            yield audio_metadata_collation(batch)


def _decode_bytes(data: bytes, ext: str):
    import tempfile

    with tempfile.NamedTemporaryFile(suffix=f".{ext}") as f:
        f.write(data)
        f.flush()
        return load_audio_file(f.name)


def create_dataloader_from_config(dataset_config, batch_size: int, sample_size: int,
                                  sample_rate: int, audio_channels: int, num_workers: int = 4):
    """reference :515-597."""
    dataset_type = dataset_config.get("dataset_type", None)
    assert dataset_type, "Dataset type must be specified in dataset config"
    assert audio_channels in (1, 2), f"Audio channel must be 1 or 2 -> found {audio_channels}."
    force_channels = "mono" if audio_channels == 1 else "stereo"

    def load_custom_metadata_fn(cfg):
        path = cfg.get("custom_metadata_module", None)
        if path is None:
            return None
        spec = importlib.util.spec_from_file_location("metadata_module", path)
        module = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(module)
        return module.get_custom_metadata

    if dataset_type == "audio_dir":
        audio_dir_configs = dataset_config.get("datasets", None)
        assert audio_dir_configs is not None, 'Directory configuration must be specified in "dataset".'
        # custom_metadata_module may live at the top level OR per-dataset
        # entry (docs/datasets.md documents the per-entry placement; the s3
        # branch reads it per-entry too). Per-entry wins for its own paths.
        top_fn = load_custom_metadata_fn(dataset_config)
        per_dir = []
        training_dirs = []
        for cfg in audio_dir_configs:
            path = cfg.get("path", None)
            assert path is not None, "Path must be set for local audio directory configuration"
            training_dirs.append(path)
            per_dir.append((path, load_custom_metadata_fn(cfg)))

        custom_metadata_fn = top_fn
        dir_fns = [(p_, f_) for p_, f_ in per_dir if f_ is not None]
        if dir_fns:
            def custom_metadata_fn(info, audio, _fns=dir_fns, _top=top_fn):
                fn = next((f_ for p_, f_ in _fns
                           if str(info.get("path", "")).startswith(str(p_))), _top)
                return fn(info, audio) if fn is not None else {}

        train_set = AudioFolderDataset(
            training_dirs,
            sample_rate=sample_rate,
            sample_size=sample_size,
            random_crop=dataset_config.get("random_crop", True),
            force_channels=force_channels,
            custom_metadata_fn=custom_metadata_fn,
            relpath=training_dirs[0],
        )
        return DataLoader(train_set, batch_size, shuffle=True, num_workers=num_workers, drop_last=True)

    if dataset_type == "s3":
        configs = []
        for s3_config in dataset_config["datasets"]:
            configs.append(
                S3DatasetConfig(
                    id=s3_config["id"],
                    s3_path=s3_config["s3_path"],
                    custom_metadata_fn=load_custom_metadata_fn(s3_config),
                    profile=s3_config.get("profile", None),
                )
            )
        return S3WebDataLoader(
            configs,
            sample_rate=sample_rate,
            sample_size=sample_size,
            batch_size=batch_size,
            random_crop=dataset_config.get("random_crop", True),
            num_workers=num_workers,
            force_channels=force_channels,
            epoch_steps=dataset_config.get("epoch_steps", 2000),
        ).data_loader

    raise ValueError(f"Unknown dataset type: {dataset_type}")
