"""Named datamodules (reference: ot_vae_lightning/data/__init__.py:7-151).

Each datamodule bakes in the normalization/denormalization pair of the
reference (MNIST mean/std 0.1307/0.3081, CIFAR10 stats, ImageNet stats,
FFHQ stats) and its inference pre/post transforms. Real data is loaded from
disk when present (MNIST IDX files under ``~/.cache/MNIST/raw``, CIFAR-10
pickled batches, image folders via PIL); otherwise the seeded synthetic
generators in :mod:`ot_vae_tpu.data.synthetic` stand in (this environment has
no network egress — see synthetic.py docstring).
"""
from __future__ import annotations

import dataclasses
import gzip
import os
import pickle
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

from ot_vae_tpu.data.base import ArrayDataset, BaseDatamodule, dataset_split
from ot_vae_tpu.data.synthetic import synthetic_digits, synthetic_textures
from ot_vae_tpu.data.transforms import (
    CenterCrop,
    Compose,
    Identity,
    Normalize,
    Pad,
    RandomHorizontalFlip,
    UnNormalize,
)

__all__ = ["MNIST", "MNIST32", "CIFAR10", "GenericDatamodule", "ImageFolderData", "ImageNet224", "ImageNet256", "FFHQ64", "FFHQ128"]

def _cache_dir() -> Path:
    """Dataset cache root: ``$OT_VAE_DATA_CACHE`` or ``~/.cache`` — read
    lazily so dropping real MNIST/CIFAR files (or pointing the env var at
    them) re-activates the disk loaders without a process restart."""
    return Path(os.environ.get("OT_VAE_DATA_CACHE",
                               os.path.expanduser("~/.cache")))


def _load_idx(path: Path) -> Optional[np.ndarray]:
    """Parse an (optionally gzipped) IDX file (the MNIST wire format)."""
    opener = gzip.open if path.suffix == ".gz" else open
    try:
        with opener(path, "rb") as f:
            data = f.read()
    except OSError:
        return None
    magic = int.from_bytes(data[0:4], "big")
    ndim = magic & 0xFF
    dims = [int.from_bytes(data[4 + 4 * i : 8 + 4 * i], "big") for i in range(ndim)]
    return np.frombuffer(data, np.uint8, offset=4 + 4 * ndim).reshape(dims)


def _load_mnist_raw(train: bool) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    base = _cache_dir() / "MNIST" / "raw"
    prefix = "train" if train else "t10k"
    for suffix in ("", ".gz"):
        imgs = _load_idx(base / f"{prefix}-images-idx3-ubyte{suffix}")
        labs = _load_idx(base / f"{prefix}-labels-idx1-ubyte{suffix}")
        if imgs is not None and labs is not None:
            return (imgs.astype(np.float32)[..., None] / 255.0, labs.astype(np.int32))
    return None


def _load_cifar10_raw(train: bool) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    base = _cache_dir() / "cifar-10-batches-py"
    names = [f"data_batch_{i}" for i in range(1, 6)] if train else ["test_batch"]
    imgs, labs = [], []
    for name in names:
        p = base / name
        if not p.exists():
            return None
        with open(p, "rb") as f:
            d = pickle.load(f, encoding="bytes")
        imgs.append(d[b"data"].reshape(-1, 3, 32, 32).transpose(0, 2, 3, 1))
        labs.extend(d[b"labels"])
    return (
        np.concatenate(imgs).astype(np.float32) / 255.0,
        np.asarray(labs, np.int32),
    )


@dataclasses.dataclass
class MNIST(BaseDatamodule):
    """28×28 grayscale digits, normalized with the reference's stats
    (reference: data/__init__.py:7-22)."""

    MEAN: Tuple[float, ...] = (0.1307,)
    STD: Tuple[float, ...] = (0.3081,)
    pad: int = 0
    synthetic_train: int = 6000
    synthetic_test: int = 1000
    test_val_split: float = 0.9

    def __post_init__(self):
        norm = [Normalize(self.MEAN, self.STD)]
        denorm = [UnNormalize(self.MEAN, self.STD)]
        if self.pad:
            norm.append(Pad(self.pad))
            denorm.insert(0, CenterCrop(28))
        self.img_size = (28 + 2 * self.pad, 28 + 2 * self.pad)
        self.inference_preprocess = Compose(norm)
        self.inference_postprocess = Compose(denorm)
        self._transform = Compose(norm)

    def setup(self) -> None:
        if self.train_dataset is not None:
            return
        train = _load_mnist_raw(True)
        test = _load_mnist_raw(False)
        if train is None or test is None:
            train = synthetic_digits(self.synthetic_train, seed=1)
            test = synthetic_digits(self.synthetic_test, seed=2)
        self.train_dataset = ArrayDataset(*train, self._transform)
        (vi, vl), (ti, tl) = dataset_split(*test, self.test_val_split, self.seed)
        self.val_dataset = ArrayDataset(vi, vl, self._transform)
        self.test_dataset = ArrayDataset(ti, tl, self._transform)
        self.predict_dataset = ArrayDataset(*test, Identity())


@dataclasses.dataclass
class MNIST32(MNIST):
    """MNIST padded to 32×32 (power-of-two resolution for the CNN schedule)
    (reference: data/__init__.py:25-40)."""

    pad: int = 2


@dataclasses.dataclass
class CIFAR10(BaseDatamodule):
    """32×32 RGB (reference: data/__init__.py:43-58)."""

    MEAN: Tuple[float, ...] = (0.4914, 0.4822, 0.4465)
    STD: Tuple[float, ...] = (0.247, 0.243, 0.261)
    synthetic_train: int = 6000
    synthetic_test: int = 1000
    test_val_split: float = 0.9
    random_flip: bool = True

    def __post_init__(self):
        self.img_size = (32, 32)
        norm = Normalize(self.MEAN, self.STD)
        self.inference_preprocess = norm
        self.inference_postprocess = UnNormalize(self.MEAN, self.STD)
        train_t = [RandomHorizontalFlip()] if self.random_flip else []
        self._train_transform = Compose([*train_t, norm])
        self._eval_transform = norm

    def setup(self) -> None:
        if self.train_dataset is not None:
            return
        train = _load_cifar10_raw(True)
        test = _load_cifar10_raw(False)
        if train is None or test is None:
            train = synthetic_textures(self.synthetic_train, seed=1)
            test = synthetic_textures(self.synthetic_test, seed=2)
        self.train_dataset = ArrayDataset(*train, self._train_transform)
        (vi, vl), (ti, tl) = dataset_split(*test, self.test_val_split, self.seed)
        self.val_dataset = ArrayDataset(vi, vl, self._eval_transform)
        self.test_dataset = ArrayDataset(ti, tl, self._eval_transform)
        self.predict_dataset = ArrayDataset(*test, Identity())


@dataclasses.dataclass
class ImageFolderData(BaseDatamodule):
    """Folder-of-images datamodule (PIL decode) — the FFHQ/ImageNet path
    (reference: data/__init__.py:61-151). Images are resized to ``size``.

    ``synthetic_train``/``synthetic_test`` > 0 arm a seeded synthetic-texture
    fallback at the module's resolution when the folder is missing (same
    armed-activation pattern as MNIST/CIFAR: drop real data on disk and the
    identical config trains on it); 0 (default) keeps the loud
    FileNotFoundError."""

    root: Tuple[str, str] = ("", "")
    size: int = 64
    MEAN: Tuple[float, ...] = (0.5, 0.5, 0.5)
    STD: Tuple[float, ...] = (0.25, 0.25, 0.25)
    test_val_split: float = 0.9
    max_images: Optional[int] = None
    synthetic_train: int = 0
    synthetic_test: int = 0

    def __post_init__(self):
        self.img_size = (self.size, self.size)
        self.inference_preprocess = Normalize(self.MEAN, self.STD)
        self.inference_postprocess = UnNormalize(self.MEAN, self.STD)
        self._transform = Normalize(self.MEAN, self.STD)

    def _load_folder(self, root: str) -> Tuple[np.ndarray, np.ndarray]:
        from PIL import Image

        paths = sorted(
            p for p in Path(os.path.expanduser(root)).rglob("*")
            if p.suffix.lower() in (".png", ".jpg", ".jpeg", ".bmp")
        )
        if self.max_images:
            paths = paths[: self.max_images]
        if not paths:
            raise FileNotFoundError(f"no images under {root}")
        classes = sorted({p.parent.name for p in paths})
        cls_idx = {c: i for i, c in enumerate(classes)}
        imgs = np.stack([
            np.asarray(
                Image.open(p).convert("RGB").resize((self.size, self.size)),
                np.float32,
            ) / 255.0
            for p in paths
        ])
        labels = np.asarray([cls_idx[p.parent.name] for p in paths], np.int32)
        return imgs, labels

    def setup(self) -> None:
        if self.train_dataset is not None:
            return
        try:
            train = self._load_folder(self.root[0])
            test = self._load_folder(self.root[1])
        except FileNotFoundError:
            if not (self.synthetic_train and self.synthetic_test):
                raise
            train = synthetic_textures(self.synthetic_train, seed=1,
                                       size=self.size)
            test = synthetic_textures(self.synthetic_test, seed=2,
                                      size=self.size)
        self.train_dataset = ArrayDataset(*train, self._transform)
        (vi, vl), (ti, tl) = dataset_split(*test, self.test_val_split, self.seed)
        self.val_dataset = ArrayDataset(vi, vl, self._transform)
        self.test_dataset = ArrayDataset(ti, tl, self._transform)
        self.predict_dataset = ArrayDataset(*test, Identity())


@dataclasses.dataclass
class ImageNet224(ImageFolderData):
    """(reference: data/__init__.py:93-110 — center-crop/resize 224 with the
    ImageNet normalization stats; expects an image folder on disk)"""

    size: int = 224
    MEAN: Tuple[float, ...] = (0.485, 0.456, 0.406)
    STD: Tuple[float, ...] = (0.229, 0.224, 0.225)
    root: Tuple[str, str] = ("~/data/ImageNet/train", "~/data/ImageNet/val")


@dataclasses.dataclass
class ImageNet256(ImageFolderData):
    """(reference: data/__init__.py:73-90)"""

    size: int = 256
    MEAN: Tuple[float, ...] = (0.485, 0.456, 0.406)
    STD: Tuple[float, ...] = (0.229, 0.224, 0.225)
    root: Tuple[str, str] = ("~/data/ImageNet/train", "~/data/ImageNet/val")


@dataclasses.dataclass
class FFHQ64(ImageFolderData):
    size: int = 64
    MEAN: Tuple[float, ...] = (0.5207, 0.4254, 0.3805)
    STD: Tuple[float, ...] = (0.1164, 0.1110, 0.1162)
    root: Tuple[str, str] = ("~/data/ffhq_128_train", "~/data/ffhq_128_test")


@dataclasses.dataclass
class FFHQ128(ImageFolderData):
    size: int = 128
    MEAN: Tuple[float, ...] = (0.5207, 0.4254, 0.3805)
    STD: Tuple[float, ...] = (0.1164, 0.1110, 0.1162)
    root: Tuple[str, str] = ("~/data/ffhq_128_train", "~/data/ffhq_128_test")


def _as_nhwc(img) -> np.ndarray:
    """Coerce one dataset item image to float32 NHWC-compatible HWC.

    Integer-dtype sources (uint8 PIL/array images) are scaled by 1/255 —
    decided from the SOURCE DTYPE, not the value range, so an all-dark
    uint8 image (max value 0 or 1) scales consistently with its siblings
    (round-2 advisor finding: a per-item ``max() > 1.5`` test produced
    inconsistently scaled samples within one dataset)."""
    raw = np.asarray(img)
    integer_source = raw.dtype != object and np.issubdtype(raw.dtype, np.integer)
    arr = raw.astype(np.float32)
    if arr.ndim == 2:
        arr = arr[..., None]
    elif arr.ndim == 3 and arr.shape[0] in (1, 3, 4) and arr.shape[-1] not in (1, 3, 4):
        arr = np.transpose(arr, (1, 2, 0))  # CHW (torch) -> HWC
    if integer_source:
        arr = arr / 255.0
    return arr


@dataclasses.dataclass
class GenericDatamodule(BaseDatamodule):
    """Wrap ANY map-style dataset class in a datamodule — the reference's
    ``TorchvisionDatamodule`` extension point (reference:
    data/torchvision_datamodule.py:28-122, esp. the train/split kwarg
    sniffing at :86-96).

    :param dataset: a dataset class/factory (or its dotted import path).
        Instances must be map-style: ``__len__`` + ``__getitem__`` returning
        ``(image, label)`` (torch/torchvision datasets qualify; images may be
        HWC/CHW arrays, PIL images, or torch tensors).
    :param dataset_kwargs: kwargs forwarded to every instantiation.
    :param val_split: fraction of the eval-side data used for validation.

    Split selection mirrors the reference's signature sniffing: if the
    factory accepts ``train``, it is called with ``train=True/False``; else if
    it accepts ``split``, with ``split='train'/'test'``; otherwise one
    instance serves all splits (divided by ``val_split``).
    """

    dataset: object = None
    dataset_kwargs: dict = dataclasses.field(default_factory=dict)
    val_split: float = 0.5
    transform: Optional[object] = None  # a Transform applied per batch

    def _factory(self):
        ds = self.dataset
        if isinstance(ds, str):
            import importlib

            module, _, name = ds.rpartition(".")
            ds = getattr(importlib.import_module(module), name)
        if ds is None:
            raise ValueError("GenericDatamodule requires `dataset`")
        return ds

    def _instantiate(self, train: bool):
        import inspect

        factory = self._factory()
        try:
            params = set(inspect.signature(factory).parameters)
        except (TypeError, ValueError):
            params = set()
        kwargs = dict(self.dataset_kwargs)
        if "train" in params:
            kwargs["train"] = train
        elif "split" in params:
            kwargs["split"] = "train" if train else "test"
        elif not train:
            return None  # single-instance dataset: eval side split from train
        return factory(**kwargs)

    @staticmethod
    def _materialize(ds) -> Tuple[np.ndarray, np.ndarray]:
        images, labels = [], []
        for i in range(len(ds)):
            item = ds[i]
            img, lab = item if isinstance(item, tuple) else (item, 0)
            images.append(_as_nhwc(img))
            labels.append(int(lab))
        return np.stack(images), np.asarray(labels, np.int32)

    def setup(self) -> None:
        if self.train_dataset is not None:
            return
        transform = self.transform if self.transform is not None else Identity()
        train_ds = self._instantiate(train=True)
        eval_ds = self._instantiate(train=False)
        train = self._materialize(train_ds)
        if eval_ds is None:
            # no train/split kwarg: carve eval data out of the single instance
            train, evals = dataset_split(*train, 0.8, self.seed)
        else:
            evals = self._materialize(eval_ds)
        self.img_size = train[0].shape[1:3]
        self.train_dataset = ArrayDataset(*train, transform)
        (vi, vl), (ti, tl) = dataset_split(*evals, self.val_split, self.seed)
        self.val_dataset = ArrayDataset(vi, vl, transform)
        self.test_dataset = ArrayDataset(ti, tl, transform)
        self.predict_dataset = ArrayDataset(*evals, Identity())
