"""Metrics buffering + experiment logging.

Parity target: reference `training/logging.py:12-35` (`MetricsLogger`
mean-accumulates between `log_every` flushes) plus a wandb adapter that
degrades to console logging when wandb is unavailable (it is an optional
dependency here)."""

from __future__ import annotations

import typing as tp

import numpy as np


class MetricsLogger:
    """reference logging.py:12-35."""

    def __init__(self):
        self._sums: tp.Dict[str, float] = {}
        self._counts: tp.Dict[str, int] = {}

    def add(self, metrics: tp.Dict[str, tp.Any]) -> None:
        for k, v in metrics.items():
            try:
                val = float(v)
            except (TypeError, ValueError):
                continue
            if not np.isfinite(val):
                continue
            self._sums[k] = self._sums.get(k, 0.0) + val
            self._counts[k] = self._counts.get(k, 0) + 1

    def pop(self) -> tp.Dict[str, float]:
        out = {k: self._sums[k] / self._counts[k] for k in self._sums}
        self._sums.clear()
        self._counts.clear()
        return out


class ExperimentLogger:
    """wandb if available+configured, console otherwise."""

    def __init__(self, project: tp.Optional[str] = None, name: tp.Optional[str] = None,
                 config: tp.Optional[dict] = None, save_dir: str = "."):
        self.run = None
        self.save_dir = save_dir
        self.run_id = name or "local"
        try:
            import wandb  # type: ignore

            self.wandb = wandb
            self.run = wandb.init(project=project, name=name, config=config, dir=save_dir)
            self.run_id = self.run.id
        except Exception:
            self.wandb = None

    def log(self, metrics: tp.Dict[str, tp.Any], step: tp.Optional[int] = None) -> None:
        if self.run is not None:
            self.run.log(metrics, step=step)
        else:
            items = " ".join(f"{k}={float(v):.5g}" for k, v in metrics.items()
                             if isinstance(v, (int, float, np.floating)))
            print(f"[step {step}] {items}", flush=True)

    def log_audio(self, key: str, audio, sample_rate: int, step: tp.Optional[int] = None,
                  caption: tp.Optional[str] = None) -> None:
        if self.run is not None:
            self.run.log({key: self.wandb.Audio(np.asarray(audio).T, sample_rate=sample_rate,
                                                caption=caption)}, step=step)

    def log_image(self, key: str, image, step: tp.Optional[int] = None) -> None:
        if self.run is not None:
            self.run.log({key: self.wandb.Image(image)}, step=step)

    def log_object3d(self, key: str, points, step: tp.Optional[int] = None) -> None:
        """(N, 6) xyz+rgb point cloud (reference viz.py:110-221 logs the
        latent PCA as wandb.Object3D)."""
        if self.run is not None:
            self.run.log({key: self.wandb.Object3D(np.asarray(points, np.float32))},
                         step=step)

    def finish(self):
        if self.run is not None:
            self.run.finish()
