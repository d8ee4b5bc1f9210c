"""Loggers (reference: wandb/tensorboard logging through Lightning,
utils/collage.py:67-80, model/base.py:128,219).

All loggers implement ``log_metrics(dict, step)`` and optionally
``log_image(tag, array, step)``. Imports of optional backends (wandb,
tensorboard) are gated — this environment is offline.
"""
from __future__ import annotations

import csv
import os
from pathlib import Path
from typing import Dict, Optional

import jax
import numpy as np

__all__ = ["PrintLogger", "CSVLogger", "WandbLogger", "TensorBoardLogger",
           "MultiLogger"]


class PrintLogger:
    def log_metrics(self, metrics: Dict[str, float], step: int):
        if jax.process_index() != 0:
            return
        msg = "  ".join(f"{k}={float(v):.4g}" for k, v in metrics.items())
        print(f"[step {step}] {msg}", flush=True)


class CSVLogger:
    """Append-only metrics.csv + PNG image dumps — the dependency-free
    observability baseline."""

    def __init__(self, log_dir: str = "logs"):
        self.log_dir = Path(log_dir)

    def log_metrics(self, metrics: Dict[str, float], step: int):
        if jax.process_index() != 0:
            return
        os.makedirs(self.log_dir, exist_ok=True)
        path = self.log_dir / "metrics.csv"
        new = not path.exists()
        with open(path, "a", newline="") as f:
            w = csv.writer(f)
            if new:
                w.writerow(["step", "metric", "value"])
            for k, v in metrics.items():
                w.writerow([step, k, float(v)])

    def log_image(self, tag: str, image: np.ndarray, step: int):
        if jax.process_index() != 0:
            return
        os.makedirs(self.log_dir / "images", exist_ok=True)
        arr = (np.clip(np.asarray(image), 0, 1) * 255).astype(np.uint8)
        if arr.ndim == 3 and arr.shape[-1] == 1:
            arr = arr[..., 0]
        name = tag.replace("/", "_") + f"_{step}.png"
        try:
            from PIL import Image

            Image.fromarray(arr).save(self.log_dir / "images" / name)
        except Exception:
            np.save(self.log_dir / "images" / (name + ".npy"), arr)


class WandbLogger:
    """wandb logger (reference primary logger, configs/dad/sweep.yaml);
    degrades to CSV when wandb is unavailable/offline."""

    def __init__(self, project: str = "ot-vae-tpu", name: Optional[str] = None,
                 **init_kwargs):
        self._fallback = None
        try:
            import wandb

            self._run = wandb.init(project=project, name=name, **init_kwargs)
            self._wandb = wandb
        except Exception:
            self._run = None
            self._fallback = CSVLogger()

    def log_metrics(self, metrics, step):
        if self._run is None:
            return self._fallback.log_metrics(metrics, step)
        self._run.log({k: float(v) for k, v in metrics.items()}, step=step)

    def log_image(self, tag, image, step):
        if self._run is None:
            return self._fallback.log_image(tag, image, step)
        self._run.log({tag: self._wandb.Image(np.asarray(image))}, step=step)


class TensorBoardLogger:
    """TensorBoard event files via flax's summary writer when available."""

    def __init__(self, log_dir: str = "tb_logs"):
        self._fallback = None
        try:
            from flax.metrics import tensorboard

            self._writer = tensorboard.SummaryWriter(log_dir)
        except Exception:
            self._writer = None
            self._fallback = CSVLogger(log_dir)

    def log_metrics(self, metrics, step):
        if self._writer is None:
            return self._fallback.log_metrics(metrics, step)
        for k, v in metrics.items():
            self._writer.scalar(k, float(v), step)

    def log_image(self, tag, image, step):
        if self._writer is None:
            return self._fallback.log_image(tag, image, step)
        self._writer.image(tag, np.asarray(image), step)


class MultiLogger:
    def __init__(self, *loggers):
        self.loggers = loggers

    def log_metrics(self, metrics, step):
        for lg in self.loggers:
            lg.log_metrics(metrics, step)

    def log_image(self, tag, image, step):
        for lg in self.loggers:
            if hasattr(lg, "log_image"):
                lg.log_image(tag, image, step)
