"""Datamodule protocol + loader (reference: ot_vae_lightning/data/base.py:26-149).

A datamodule owns per-split arrays + transforms + batch sizes and yields numpy
NHWC batches as ``(images, labels)``. Design points vs the reference:

* Batches are fixed-shape (``drop_last`` always on) — XLA recompiles on shape
  changes, so ragged final batches are dropped rather than padded.
* Shuffling is seeded and derives a fresh permutation per epoch.
* ``inference_preprocess``/``inference_postprocess`` are serializable
  :mod:`ot_vae_tpu.data.transforms` so they can be persisted into checkpoints
  (reference: model/base.py:231-241).
* There is no worker-process pool: batches are small images and host work is
  one slice + transform per step; heavy decode pipelines belong in the
  C++ loader (future native component), not Python threads.
"""
from __future__ import annotations

import dataclasses
from typing import Callable, Iterator, Optional, Tuple

import numpy as np

from ot_vae_tpu.data.transforms import Identity, Transform

__all__ = ["ArrayDataset", "BaseDatamodule", "dataset_split"]


@dataclasses.dataclass
class ArrayDataset:
    """In-memory dataset: images [N, H, W, C] float32 + labels [N] int32."""

    images: np.ndarray
    labels: np.ndarray
    transform: Transform = Identity()

    def __len__(self) -> int:
        return len(self.images)

    def _native_batcher(
        self, batch_size: int, seed: Optional[int], shuffle: bool
    ):
        """The C++ prefetching batcher (ot_vae_tpu/data/native/batcher.cpp)
        when the transform is fusable (Identity or per-channel Normalize).

        Routing (``OT_VAE_NATIVE_LOADER``): unset → native for UNSHUFFLED
        iteration only (val/test/predict), where its batch stream is
        bit-identical to the NumPy path (sequential slices; the fused C++
        normalize performs the same two IEEE float32 ops); ``1`` → native for
        shuffled training too (its seeded shuffle is deterministic but a
        different permutation stream than NumPy's, which shifts seeded e2e
        floors); ``0`` → never."""
        import os

        env = os.environ.get("OT_VAE_NATIVE_LOADER", "")
        if env == "0" or (shuffle and env != "1"):
            return None
        from ot_vae_tpu.data import native_loader
        from ot_vae_tpu.data.transforms import Compose, Normalize, Pad

        # Fusable chains: Identity | Normalize | Pad | Normalize→Pad
        # (Compose-wrapped or bare). Anything else falls back to NumPy.
        chain = (list(self.transform.transforms)
                 if isinstance(self.transform, Compose) else [self.transform])
        chain = [t for t in chain if not isinstance(t, Identity)]
        mean = std = None
        pad = 0
        if chain and isinstance(chain[0], Normalize):
            mean, std = chain[0].mean, chain[0].std
            chain = chain[1:]
        if chain and isinstance(chain[0], Pad):
            pad = chain[0].padding
            chain = chain[1:]
        if chain:
            return None
        if not native_loader.available():
            return None
        cache = getattr(self, "_native_cache", None)
        if cache is None:
            cache = self._native_cache = {}
        key = (batch_size, seed)
        if key not in cache:  # one worker thread per (dataset, batch size)
            cache[key] = native_loader.NativeBatcher(
                self.images, self.labels, batch_size, seed or 0, mean, std,
                pad,
            )
        return cache[key]

    def batches(
        self, batch_size: int, shuffle: bool, seed: Optional[int], epoch: int = 0
    ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        native = self._native_batcher(batch_size, seed, shuffle)
        if native is not None:
            yield from native.epoch(epoch, shuffle)
            return
        n = len(self.images)
        idx = np.arange(n)
        if shuffle:
            rng = np.random.default_rng(None if seed is None else seed + epoch)
            rng.shuffle(idx)
        for start in range(0, n - batch_size + 1, batch_size):
            sel = idx[start : start + batch_size]
            imgs = self.transform(self.images[sel])
            yield np.asarray(imgs, np.float32), self.labels[sel]


def dataset_split(
    images: np.ndarray, labels: np.ndarray, split: float, seed: Optional[int] = None
):
    """Seeded non-overlapping split (reference: data/base.py:114-149)."""
    if not 0.0 <= split <= 1.0:
        raise ValueError(f"split must be in [0, 1], got {split}")
    n = len(images)
    size = int(n * split)
    rng = np.random.default_rng(seed)
    idx = rng.permutation(n)
    a, b = idx[:size], idx[size:]
    return (images[a], labels[a]), (images[b], labels[b])


@dataclasses.dataclass
class BaseDatamodule:
    """Per-split datasets + transforms + batch sizes
    (reference: data/base.py:26-110)."""

    train_batch_size: int = 32
    val_batch_size: int = 256
    test_batch_size: int = 256
    predict_batch_size: int = 256
    seed: Optional[int] = None
    img_size: Optional[Tuple[int, int]] = None
    inference_preprocess: Transform = Identity()
    inference_postprocess: Transform = Identity()

    train_dataset: Optional[ArrayDataset] = None
    val_dataset: Optional[ArrayDataset] = None
    test_dataset: Optional[ArrayDataset] = None
    predict_dataset: Optional[ArrayDataset] = None

    def setup(self) -> None:
        """Materialize the datasets; override in subclasses."""

    def _loader(self, mode: str, epoch: int = 0):
        ds = getattr(self, f"{mode}_dataset")
        if ds is None:
            self.setup()
            ds = getattr(self, f"{mode}_dataset")
        if ds is None:
            raise ValueError(f"no {mode} dataset")
        bs = getattr(self, f"{mode}_batch_size")
        return ds.batches(min(bs, len(ds)), mode == "train", self.seed, epoch)

    def train_batches(self, epoch: int = 0):
        return self._loader("train", epoch)

    def val_batches(self):
        return self._loader("val")

    def test_batches(self):
        return self._loader("test")

    def predict_batches(self):
        return self._loader("predict")

    def steps_per_epoch(self, mode: str = "train") -> int:
        ds = getattr(self, f"{mode}_dataset")
        if ds is None:
            self.setup()
            ds = getattr(self, f"{mode}_dataset")
        bs = getattr(self, f"{mode}_batch_size")
        return len(ds) // min(bs, len(ds))
