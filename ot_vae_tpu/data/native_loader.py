"""ctypes bindings + lazy build of the native C++ batcher
(ot_vae_tpu/data/native/batcher.cpp — the threaded, double-buffered batch
assembler replacing the reference's DataLoader worker-process pool,
reference: ot_vae_lightning/data/base.py:88-99).

The shared library is compiled on first use with the system ``g++`` (no
pybind11 dependency — plain C ABI via ctypes) and cached next to the source.
Everything degrades gracefully: ``available()`` returns False when no
compiler/toolchain exists and callers fall back to the NumPy path.
"""
from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from pathlib import Path
from typing import Iterator, Optional, Tuple

import numpy as np

__all__ = ["available", "NativeBatcher"]

_DIR = Path(__file__).parent / "native"
_SO = _DIR / "_batcher.so"
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False


def _build() -> Optional[ctypes.CDLL]:
    global _BUILD_FAILED
    src = _DIR / "batcher.cpp"
    if not _SO.exists() or _SO.stat().st_mtime < src.stat().st_mtime:
        # Compile to a process-unique temp path and os.replace() into place:
        # rename is atomic on POSIX, so concurrent processes (2-process
        # jax.distributed tests, parallel pytest) can never dlopen a
        # partially written .so or clobber each other's build — last writer
        # wins with a complete file either way.
        tmp = _DIR / f"_batcher.{os.getpid()}.tmp.so"
        cmd = ["g++", "-O3", "-std=c++17", "-shared", "-fPIC",
               "-o", str(tmp), str(src), "-lpthread"]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=120)
            os.replace(tmp, _SO)
        except Exception:
            _BUILD_FAILED = True
            return None
        finally:
            if tmp.exists():
                try:
                    tmp.unlink()
                except OSError:
                    pass
    try:
        lib = ctypes.CDLL(str(_SO))
    except OSError:
        _BUILD_FAILED = True
        return None
    lib.ot_batcher_create.restype = ctypes.c_void_p
    lib.ot_batcher_create.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_uint64,
    ]
    lib.ot_batcher_start_epoch.argtypes = [
        ctypes.c_void_p, ctypes.c_int64, ctypes.c_int]
    lib.ot_batcher_next.restype = ctypes.c_int
    lib.ot_batcher_next.argtypes = [
        ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p]
    lib.ot_batcher_destroy.argtypes = [ctypes.c_void_p]
    return lib


def _lib() -> Optional[ctypes.CDLL]:
    global _LIB
    with _LOCK:
        if _LIB is None and not _BUILD_FAILED:
            _LIB = _build()
    return _LIB


def available() -> bool:
    return _lib() is not None


class NativeBatcher:
    """Threaded prefetching batch iterator over an in-memory dataset.

    :param images: [N, H, W, C] float32 (C-contiguous)
    :param labels: [N] int32
    :param mean/std: optional per-channel stats — normalization is fused into
        the native gather (the hot path of Normalize transforms) using the
        same IEEE float32 (x - mean) / std as the Python transform
        (bit-identical)
    :param pad: zero-pad H and W by ``pad`` per side after normalization —
        the fused form of Compose([Normalize, Pad(pad)]) (MNIST32's eval
        transform); the border is exact zeros like ``np.pad``

    Shuffling is deterministic for a given (seed, epoch) via splitmix64 +
    Fisher–Yates (platform-independent; intentionally NOT the NumPy stream).
    """

    def __init__(self, images: np.ndarray, labels: np.ndarray,
                 batch_size: int, seed: int = 0,
                 mean: Optional[Tuple[float, ...]] = None,
                 std: Optional[Tuple[float, ...]] = None,
                 pad: int = 0):
        lib = _lib()
        if lib is None:
            raise RuntimeError("native batcher unavailable (no g++?)")
        self._lib = lib
        self.images = np.ascontiguousarray(images, np.float32)
        self.labels = np.ascontiguousarray(labels, np.int32)
        n, h, w, c = self.images.shape
        self.batch_size = int(min(batch_size, n))
        self.item_shape = (h + 2 * pad, w + 2 * pad, c)
        self._mean = (np.ascontiguousarray(mean, np.float32)
                      if mean is not None else None)
        self._std = (np.ascontiguousarray(std, np.float32)
                     if std is not None else None)
        self._handle = lib.ot_batcher_create(
            self.images.ctypes.data, self.labels.ctypes.data,
            n, h, w, c, self.batch_size,
            self._mean.ctypes.data if self._mean is not None else None,
            self._std.ctypes.data if self._std is not None else None,
            int(pad), np.uint64(seed),
        )

    def epoch(self, epoch: int = 0, shuffle: bool = True
              ) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
        """Yield (images, labels) batches; the NEXT batch is always being
        assembled on the worker thread while the caller consumes this one."""
        self._lib.ot_batcher_start_epoch(self._handle, epoch, int(shuffle))
        while True:
            out = np.empty((self.batch_size, *self.item_shape), np.float32)
            lab = np.empty((self.batch_size,), np.int32)
            if not self._lib.ot_batcher_next(
                self._handle, out.ctypes.data, lab.ctypes.data
            ):
                return
            yield out, lab

    def __del__(self):
        handle = getattr(self, "_handle", None)
        if handle:
            self._lib.ot_batcher_destroy(handle)
            self._handle = None
