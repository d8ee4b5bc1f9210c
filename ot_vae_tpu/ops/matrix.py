"""Batched matrix utilities for the OT core (JAX/XLA).

TPU-first re-design of the reference matrix helpers
(reference: ot_vae_lightning/ot/matrix_utils.py:33-158). Differences from the
reference, by design:

* Everything is a pure ``jnp`` function; safe under ``jit``/``vmap``/``grad``.
* ``sqrtm``/``invsqrtm`` clamp eigenvalues at a stability floor instead of
  raising on PSD violations (no data-dependent control flow under jit).
* A Newton–Schulz iteration (``sqrtm_ns``/``invsqrtm_ns``) is provided as the
  MXU-friendly alternative to ``eigh`` — it is matmul-only, so it maps onto the
  systolic array and vectorizes over large batches of small matrices far better
  than the eigendecomposition pipeline.
"""
from __future__ import annotations

from functools import partial
from typing import Tuple, Union

import jax
import jax.numpy as jnp
from jax import lax

__all__ = [
    "STABILITY_CONST",
    "eye_like",
    "sqrtm",
    "invsqrtm",
    "sqrtm_and_invsqrtm",
    "sqrtm_ns",
    "invsqrtm_ns",
    "is_symmetric",
    "min_eig",
    "is_pd",
    "is_spd",
    "make_psd",
    "mean_cov",
    "symmetrize",
]

STABILITY_CONST = 1e-8


def eye_like(matrices: jax.Array) -> jax.Array:
    """Identity matrix broadcast to the shape/dtype of ``matrices`` [*, D, D]."""
    d1, d2 = matrices.shape[-2], matrices.shape[-1]
    return jnp.broadcast_to(jnp.eye(d1, d2, dtype=matrices.dtype), matrices.shape)


def symmetrize(matrices: jax.Array) -> jax.Array:
    """0.5 * (M + Mᵀ) — cheap projection onto the symmetric cone."""
    return 0.5 * (matrices + jnp.swapaxes(matrices, -1, -2))


def _f32_eigh(matrices: jax.Array):
    """eigh with sub-f32 inputs upcast: bf16/fp16 have no LAPACK kernels on
    CPU and no precision headroom for the spectral pipeline on TPU — compute
    the decomposition in f32 and let callers cast results back."""
    dtype = matrices.dtype
    if jnp.finfo(dtype).bits < 32:
        matrices = matrices.astype(jnp.float32)
    return jnp.linalg.eigh(matrices), dtype


def _eigh_apply(matrices: jax.Array, fn) -> jax.Array:
    """Apply a scalar function to the eigenvalues of a batch of symmetric
    matrices (reference: ot_vae_lightning/ot/matrix_utils.py:37-46)."""
    (w, v), dtype = _f32_eigh(matrices)
    w = fn(w)
    return jnp.einsum("...ij,...j,...kj->...ik", v, w, v).astype(dtype)


def _use_ns(matrices: jax.Array, method: str) -> bool:
    """Resolve the ``method`` knob of the sqrtm family.

    ``"ns"`` / ``"auto"``-on-TPU picks Newton–Schulz — measured **24× faster**
    than the eigh pipeline at 64×(128×128) f32 with full-precision matmuls
    (1.5 ms vs 36 ms, BENCH_DETAIL.md): TPU eigh lowers to sequential
    QR-style iterations that never touch the MXU, while NS is pure batched
    matmuls.

    **Why the library DEFAULT is eigh anyway** (measured, this round): the
    f32 NS iteration handles true covariances fine (~1e-6 rel error at
    κ=1e2, ~4e-6 at κ=1e4), but the Gelbrich-W2 hot path takes square roots
    of PRODUCT matrices (√Ct·Cs·√Ct), which arrive numerically indefinite at
    the ~0.5% level once any upstream factor carries NS error — eigh clamps
    those eigenvalues, NS diverges to inf. ``"auto"`` therefore remains an
    explicit caller opt-in meaning "my input is a genuine (near-)PSD
    covariance": it uses NS on TPU and eigh elsewhere.
    """
    if method == "auto":
        return jax.default_backend() == "tpu" and matrices.shape[-1] >= 16
    if method not in ("eigh", "ns"):
        raise ValueError(f"unknown sqrtm method {method!r}")
    return method == "ns"


def sqrtm(matrices: jax.Array, method: str = "eigh") -> jax.Array:
    """Principal square root of a batch of SPSD matrices [*, D, D].

    Eigenvalues are clamped at zero so SPSD inputs with tiny negative
    numerical eigenvalues are handled without branching. ``method``:
    ``"eigh"`` (default — robust to the indefinite product matrices of the
    W2 paths) | ``"ns"`` (Newton–Schulz, MXU, 24× faster on TPU) |
    ``"auto"`` (ns on TPU, eigh elsewhere) — see :func:`_use_ns` for the
    measured trade-off.
    """
    if _use_ns(matrices, method):
        return _ns_iterations(matrices, 30)[0]
    return _eigh_apply(matrices, lambda w: jnp.sqrt(jnp.clip(w, 0.0, None)))


def invsqrtm(matrices: jax.Array, method: str = "eigh") -> jax.Array:
    """Inverse square root of a batch of SPD matrices [*, D, D].

    ``method`` as in :func:`sqrtm`; note the inverse root additionally
    amplifies small-eigenvalue error under the NS spectrum floor (~0.7% at
    κ=1e4).
    """
    if _use_ns(matrices, method):
        return _ns_iterations(matrices, 30)[1]
    return _eigh_apply(
        matrices, lambda w: lax.rsqrt(jnp.clip(w, STABILITY_CONST, None))
    )


def sqrtm_and_invsqrtm(
    matrices: jax.Array, method: str = "eigh"
) -> Tuple[jax.Array, jax.Array]:
    """Square root and inverse square root sharing one decomposition.

    ``method`` as in :func:`sqrtm`."""
    if _use_ns(matrices, method):
        return _ns_iterations(matrices, 30)
    (w, v), dtype = _f32_eigh(matrices)
    w_sqrt = jnp.sqrt(jnp.clip(w, 0.0, None))
    w_isqrt = lax.rsqrt(jnp.clip(w, STABILITY_CONST, None))
    sqrt = jnp.einsum("...ij,...j,...kj->...ik", v, w_sqrt, v).astype(dtype)
    isqrt = jnp.einsum("...ij,...j,...kj->...ik", v, w_isqrt, v).astype(dtype)
    return sqrt, isqrt


def _ns_iterations(matrices: jax.Array, num_iters: int) -> Tuple[jax.Array, jax.Array]:
    """Coupled Newton–Schulz iteration returning (sqrt(A), invsqrt(A)).

    Matmul-only — runs on the MXU. Converges quadratically for matrices with
    spectrum in (0, 2); inputs are pre-scaled by the Frobenius norm to satisfy
    this (see "Towards Faster Training of Global Covariance Pooling Networks",
    arXiv:1712.01034, for the normalization trick).
    """
    eye = eye_like(matrices)
    norm = jnp.sqrt(jnp.sum(matrices**2, axis=(-2, -1), keepdims=True))
    norm = jnp.maximum(norm, STABILITY_CONST)
    # Relative spectrum floor — the NS analog of the eigh paths' eigenvalue
    # clamp. Without it, near-singular inputs (e.g. the product matrix
    # sqrt(Ct)·Cs·sqrt(Ct) inside w2_gaussian, whose condition number is the
    # PRODUCT of the factors') sit outside the f32 convergence basin and the
    # iteration emits NaN.
    a = matrices / norm + 1e-6 * eye

    # HIGHEST precision is load-bearing: TPU matmuls default to bf16 inputs
    # and the quadratically-converging NS iteration amplifies bf16 rounding
    # into divergence (observed: NaN on a kappa~6e4 SPD input). Full-f32
    # MXU passes keep the iteration contractive and are still ~10x faster
    # than the eigh pipeline (BENCH_DETAIL.md).
    mm = partial(jnp.matmul, precision=lax.Precision.HIGHEST)

    def body(_, yz):
        y, z = yz
        t = 0.5 * (3.0 * eye - mm(z, y))
        return mm(y, t), mm(t, z)

    y, z = lax.fori_loop(0, num_iters, body, (a, eye))
    sqrt_norm = jnp.sqrt(norm)
    return y * sqrt_norm, z / sqrt_norm


def sqrtm_ns(matrices: jax.Array, num_iters: int = 20) -> jax.Array:
    """MXU-friendly matrix square root via Newton–Schulz iteration."""
    return _ns_iterations(matrices, num_iters)[0]


def invsqrtm_ns(matrices: jax.Array, num_iters: int = 20) -> jax.Array:
    """MXU-friendly inverse matrix square root via Newton–Schulz iteration."""
    return _ns_iterations(matrices, num_iters)[1]


def is_symmetric(matrices: jax.Array) -> jax.Array:
    """Boolean [*] — whether each matrix is symmetric
    (reference: ot_vae_lightning/ot/matrix_utils.py:79-88)."""
    if matrices.shape[-1] != matrices.shape[-2]:
        return jnp.zeros(matrices.shape[:-2], dtype=bool)
    sq_diff = jnp.sum((matrices - jnp.swapaxes(matrices, -1, -2)) ** 2, axis=(-2, -1))
    return sq_diff < STABILITY_CONST


def min_eig(matrices: jax.Array) -> jax.Array:
    """Minimum (signed) eigenvalue of each matrix in the batch [*]."""
    if jnp.finfo(matrices.dtype).bits < 32:  # no bf16/fp16 LAPACK kernels
        matrices = matrices.astype(jnp.float32)
    return jnp.min(jnp.linalg.eigvalsh(matrices), axis=-1)


def is_pd(matrices: jax.Array, strict: bool = True) -> jax.Array:
    me = min_eig(matrices)
    return me > 0 if strict else me >= 0


def is_spd(matrices: jax.Array, strict: bool = True) -> jax.Array:
    return jnp.logical_and(is_symmetric(matrices), is_pd(matrices, strict=strict))


def make_psd(
    matrices: jax.Array,
    strict: bool = False,
    return_correction: bool = False,
    diag: bool = False,
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Shift the diagonal by |min eigenvalue| where needed to make each matrix
    PSD (PD if ``strict``) — reference: ot_vae_lightning/ot/matrix_utils.py:123-142.

    Unlike the reference this never warns or branches on data: the correction
    is computed and applied unconditionally (it is zero for matrices that are
    already PSD), which keeps the function jit-compatible.
    """
    smallest = jnp.min(matrices, axis=-1) if diag else min_eig(matrices)
    correction = jnp.abs(jnp.clip(smallest, None, 0.0))
    if strict:
        correction = correction + STABILITY_CONST
    correction = correction.astype(matrices.dtype)  # no silent f32 promotion
    if diag:
        res = matrices + correction[..., None]
    else:
        res = matrices + eye_like(matrices) * correction[..., None, None]
    if return_correction:
        return res, correction
    return res


def mean_cov(
    sum_: jax.Array,
    sum_corr: jax.Array,
    num_obs: Union[jax.Array, float, int],
    diag: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Mean and covariance from streaming sums (Σx, Σxxᵀ, n)
    (reference: ot_vae_lightning/ot/matrix_utils.py:145-158).

    :param sum_: Σx of shape [*, D]
    :param sum_corr: Σxxᵀ of shape [*, D, D] (or Σx² [*, D] when ``diag``)
    :param num_obs: observation count, broadcastable to the leading dims
    :return: (mean [*, D], cov [*, D, D] or [*, D])
    """
    n = jnp.asarray(num_obs, dtype=sum_.dtype)
    n_vec = jnp.expand_dims(n, tuple(range(n.ndim, sum_.ndim)))
    mean = sum_ / n_vec
    n_mat = jnp.expand_dims(n, tuple(range(n.ndim, sum_corr.ndim)))
    cov = sum_corr / n_mat
    if diag:
        cov = cov - mean**2
    else:
        cov = cov - mean[..., :, None] * mean[..., None, :]
    return mean, cov
