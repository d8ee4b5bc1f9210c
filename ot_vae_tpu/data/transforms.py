"""Image transforms, NHWC, dual-backend.

Replaces the torchvision transform pipeline the reference composes
(reference: ot_vae_lightning/data/__init__.py:7-151, utils/__init__.py:49-75).
Each transform is a small callable that works on both numpy (host-side data
loading) and jnp arrays (device-side, jit-safe — e.g. the degradation
transformations the LatentTransport callback applies on device,
reference ot/transport_callback.py:574). Transforms operate on [*, H, W, C]
and are serializable via ``to_spec``/``from_spec`` so inference transforms can
be stored inside checkpoints (reference: model/base.py:231-241).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "Transform",
    "Compose",
    "Identity",
    "Normalize",
    "UnNormalize",
    "Pad",
    "CenterCrop",
    "RandomHorizontalFlip",
    "GaussianBlur",
    "GaussianNoise",
    "to_spec",
    "from_spec",
]


def _xp(x):
    return jnp if isinstance(x, jax.Array) else np


@dataclasses.dataclass(frozen=True)
class Transform:
    def __call__(self, x, key: Optional[jax.Array] = None):
        raise NotImplementedError


@dataclasses.dataclass(frozen=True)
class Identity(Transform):
    def __call__(self, x, key=None):
        return x


@dataclasses.dataclass(frozen=True)
class Compose(Transform):
    transforms: Tuple[Transform, ...]

    def __init__(self, transforms: Sequence[Transform]):
        object.__setattr__(self, "transforms", tuple(transforms))

    def __call__(self, x, key=None):
        for i, t in enumerate(self.transforms):
            k = None if key is None else jax.random.fold_in(key, i)
            x = t(x, k)
        return x


@dataclasses.dataclass(frozen=True)
class Normalize(Transform):
    """(x - mean) / std per channel (channels-last)."""

    mean: Tuple[float, ...]
    std: Tuple[float, ...]

    def __call__(self, x, key=None):
        xp = _xp(x)
        mean = xp.asarray(self.mean, dtype=x.dtype)
        std = xp.asarray(self.std, dtype=x.dtype)
        return (x - mean) / std


@dataclasses.dataclass(frozen=True)
class UnNormalize(Transform):
    """x * std + mean — inverse of :class:`Normalize`
    (reference: utils/__init__.py:55-75)."""

    mean: Tuple[float, ...]
    std: Tuple[float, ...]

    def __call__(self, x, key=None):
        xp = _xp(x)
        mean = xp.asarray(self.mean, dtype=x.dtype)
        std = xp.asarray(self.std, dtype=x.dtype)
        return x * std + mean


@dataclasses.dataclass(frozen=True)
class Pad(Transform):
    """Zero-pad H and W by ``padding`` on each side (torchvision T.Pad)."""

    padding: int

    def __call__(self, x, key=None):
        xp = _xp(x)
        p = self.padding
        pad = [(0, 0)] * (x.ndim - 3) + [(p, p), (p, p), (0, 0)]
        return xp.pad(x, pad)


@dataclasses.dataclass(frozen=True)
class CenterCrop(Transform):
    """Center-crop H and W to ``size`` (torchvision T.CenterCrop)."""

    size: int

    def __call__(self, x, key=None):
        h, w = x.shape[-3], x.shape[-2]
        top, left = (h - self.size) // 2, (w - self.size) // 2
        return x[..., top : top + self.size, left : left + self.size, :]


@dataclasses.dataclass(frozen=True)
class RandomHorizontalFlip(Transform):
    """Flip W with probability p (per batch element when batched)."""

    p: float = 0.5

    def __call__(self, x, key=None):
        if key is None:  # host-side numpy path
            flip = np.random.random(x.shape[0] if x.ndim == 4 else ()) < self.p
            flipped = x[..., ::-1, :]
            if x.ndim == 4:
                return np.where(flip[:, None, None, None], flipped, x)
            return flipped if flip else x
        shape = (x.shape[0],) if x.ndim == 4 else ()
        flip = jax.random.bernoulli(key, self.p, shape)
        flipped = x[..., ::-1, :]
        if x.ndim == 4:
            return jnp.where(flip[:, None, None, None], flipped, x)
        return jnp.where(flip, flipped, x)


@dataclasses.dataclass(frozen=True)
class GaussianBlur(Transform):
    """Depthwise Gaussian blur, jit-safe (torchvision T.GaussianBlur with a
    fixed sigma — the degradation used by the transport experiments,
    reference tests/test_latent_transport.py:40)."""

    kernel_size: int
    sigma: float

    def _kernel(self) -> np.ndarray:
        k = self.kernel_size
        ax = np.arange(k) - (k - 1) / 2.0
        g = np.exp(-0.5 * (ax / self.sigma) ** 2)
        g /= g.sum()
        return np.outer(g, g).astype(np.float32)

    def __call__(self, x, key=None):
        squeeze = x.ndim == 3
        if squeeze:
            x = x[None]
        c = x.shape[-1]
        kern = jnp.asarray(self._kernel(), dtype=x.dtype)
        kern = jnp.tile(kern[:, :, None, None], (1, 1, 1, c))  # HWIO, depthwise
        pad = (self.kernel_size - 1) // 2
        out = jax.lax.conv_general_dilated(
            jnp.asarray(x), kern, (1, 1),
            [(pad, self.kernel_size - 1 - pad)] * 2,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
        )
        out = out[0] if squeeze else out
        return np.asarray(out) if not isinstance(x, jax.Array) else out


@dataclasses.dataclass(frozen=True)
class GaussianNoise(Transform):
    """Additive white noise — an alternative degradation for transport tests."""

    std: float

    def __call__(self, x, key=None):
        if key is None:
            return x + np.random.standard_normal(x.shape).astype(np.float32) * self.std
        return x + jax.random.normal(key, x.shape, x.dtype) * self.std


_REGISTRY = {
    cls.__name__: cls
    for cls in [Identity, Normalize, UnNormalize, Pad, CenterCrop,
                RandomHorizontalFlip, GaussianBlur, GaussianNoise]
}


def to_spec(t: Transform):
    """Serialize a transform (tree) into a JSON-able spec — used to persist
    inference transforms inside checkpoints (reference: model/base.py:231-241)."""
    if isinstance(t, Compose):
        return {"kind": "Compose", "transforms": [to_spec(s) for s in t.transforms]}
    spec = {"kind": type(t).__name__}
    spec.update({f.name: getattr(t, f.name) for f in dataclasses.fields(t)})
    return spec


def from_spec(spec) -> Transform:
    spec = dict(spec)
    kind = spec.pop("kind")
    if kind == "Compose":
        return Compose([from_spec(s) for s in spec["transforms"]])
    cls = _REGISTRY[kind]
    # JSON round-trips tuples as lists
    kwargs = {
        k: tuple(v) if isinstance(v, list) else v for k, v in spec.items()
    }
    return cls(**kwargs)
