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
    "polar",
    "psd_projection",
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

    **Why the sqrtm DEFAULT is eigh anyway** (measured): the f32 NS
    iteration handles true covariances fine (~1e-6 rel error at κ=1e2,
    ~4e-6 at κ=1e4), but it diverges to inf on numerically indefinite
    input — e.g. the W2 PRODUCT matrices (√Ct·Cs·√Ct), which arrive
    indefinite at the ~0.5% level once any upstream factor carries NS
    error; eigh clamps those eigenvalues instead. ``"auto"`` therefore
    remains an explicit caller opt-in meaning "my input is a genuine
    (near-)PSD covariance": it uses NS on TPU and eigh elsewhere.

    NOTE: the W2/Monge layer no longer hits this case at all — its
    ``method="auto"`` default routes TPU through the POLAR reformulation
    (ops/w2.py:_polar_path), which only ever roots genuine covariances and
    is both faster and more accurate than the f32 eigh pipeline
    (BENCH_DETAIL.md "OT core").
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


def _ns_iterations(
    matrices: jax.Array, num_iters: int, refine: int = 2
) -> Tuple[jax.Array, jax.Array]:
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
    a0 = matrices / norm
    a = a0 + 1e-6 * eye

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

    # The ridge biases eigenvalues near it: z → (λ+r)^-½ instead of λ^-½,
    # a ~δ/2 relative error with δ = r/(λ+r) (measured 2.8% on a κ=2e4
    # covariance, where the inverse root is the accuracy-critical factor of
    # the Monge operators). Newton-refine z against the UNRIDGED input — δ
    # drops quadratically (δ → 3δ²/4: 2 steps take 2.5e-2 → 1.6e-7) and
    # exact-zero eigenvalues stay bounded (z grows 1.5×/step there, matching
    # the eigh clamp's 1/√ε scale). y keeps the ridged iterate: its bias is
    # an ABSOLUTE √r ≈ 1e-3·√‖A‖ error confined to near-null eigenvalues
    # (measured 8e-5 relative) — recovering y as A·z would trade that for a
    # larger error from the λ·z product in those same directions.
    for _ in range(refine):
        z = 0.5 * mm(z, 3.0 * eye - mm(a0, mm(z, z)))
    sqrt_norm = jnp.sqrt(norm)
    return y * sqrt_norm, z / sqrt_norm


def polar(
    matrices: jax.Array, num_iters_lift: int = 12, num_iters_refine: int = 8
) -> jax.Array:
    """Orthogonal polar factor U of a batch of square matrices [*, D, D].

    ``M = U @ H`` with ``H = (MᵀM)^½`` symmetric PSD; equivalently U is the
    nearest (semi-)orthogonal matrix to M. Matmul-only — runs on the MXU, no
    eigh/SVD. Key properties (each is load-bearing for the W2 paths built on
    top, see ops/w2.py):

    * **Scale-invariant**: polar(cM) = polar(M), so the Frobenius pre-scaling
      needs no undo.
    * **Stable for ARBITRARY matrices** — unlike the Newton–Schulz *sqrtm*
      iteration, which diverges on numerically indefinite inputs (the reason
      eigh stays the sqrtm default, see :func:`_use_ns`), the polar iteration
      only acts on singular values, which are nonnegative by definition.
    * **Exact-zero singular values stay exactly zero** (every iterate is an
      odd polynomial in M: ``X = M·q(MᵀM)``), giving pseudo-polar semantics
      on rank-deficient input — the polar analog of the eigh paths'
      eigenvalue clamp.

    Iteration schedule: ``num_iters_lift`` quintic steps
    ``X ← aX + b·X(XᵀX) + c·X(XᵀX)²`` with the globally-stable tuned
    coefficients (3.4445, −4.7750, 2.0315) used for Newton–Schulz
    orthogonalization in the Muon-optimizer literature (slope a≈3.44 at 0
    lifts tiny singular values fast; the map keeps [0, 1.3] within itself),
    then ``num_iters_refine`` cubic steps ``X ← 1.5X − 0.5·X(XᵀX)`` whose
    quadratic convergence polishes to f32 round-off. Defaults resolve
    singular-value ratios down to ~1e-6·σmax.
    """
    if matrices.shape[-1] != matrices.shape[-2]:
        raise ValueError(f"polar expects square matrices, got {matrices.shape}")
    norm = jnp.sqrt(jnp.sum(matrices**2, axis=(-2, -1), keepdims=True))
    x0 = matrices / jnp.maximum(norm, STABILITY_CONST)

    # bf16 rounding compounds over the polynomial recursion — keep f32 MXU
    # passes (same rule as _ns_iterations).
    mm = partial(jnp.matmul, precision=lax.Precision.HIGHEST)
    a, b, c = 3.4445, -4.7750, 2.0315

    def lift(_, x):
        xtx = mm(jnp.swapaxes(x, -1, -2), x)
        x_xtx = mm(x, xtx)
        return a * x + b * x_xtx + c * mm(x_xtx, xtx)

    def refine(_, x):
        return 1.5 * x - 0.5 * mm(x, mm(jnp.swapaxes(x, -1, -2), x))

    x = lax.fori_loop(0, num_iters_lift, lift, x0)
    x = lax.fori_loop(0, num_iters_refine, refine, x)
    return x


def psd_projection(matrices: jax.Array) -> jax.Array:
    """Nearest PSD matrix (Frobenius) to each symmetric matrix in the batch:
    negative eigenvalues clamp to zero, ``(A + |A|)/2`` with ``|A| = UᵀA``
    and ``U = polar(A)``.

    Matmul-only — the MXU-path alternative to :func:`make_psd` (which needs
    ``eigvalsh``). Semantics differ slightly by design: ``make_psd`` shifts
    the whole diagonal by |min eig| (the reference's correction,
    ot_vae_lightning/ot/matrix_utils.py:123-142), this clamps only the
    negative eigenvalues — strictly closer to the input, identical purpose
    (both are no-ops on PSD input up to iteration round-off).
    """
    u = polar(matrices)
    return symmetrize(0.5 * (matrices + jnp.swapaxes(u, -1, -2) @ matrices))


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


def _neg_part_norm(matrices: jax.Array) -> jax.Array:
    """‖(|A|−A)/2‖F for symmetric A — the Frobenius norm of the negative
    eigenvalue part, an upper bound on |λmin⁻| within √k of it (k = number of
    negative eigenvalues; exactly |λmin| when k ≤ 1). Matmul-only via the
    polar factor: |A| = polar(A)ᵀ·A."""
    mm = partial(jnp.matmul, precision=lax.Precision.HIGHEST)
    habs = symmetrize(mm(jnp.swapaxes(polar(matrices), -1, -2), matrices))
    neg = 0.5 * (habs - matrices)
    return jnp.sqrt(jnp.sum(neg**2, axis=(-2, -1)))


def make_psd(
    matrices: jax.Array,
    strict: bool = False,
    return_correction: bool = False,
    diag: bool = False,
    method: str = "eigh",
) -> Union[jax.Array, Tuple[jax.Array, jax.Array]]:
    """Shift the diagonal by |min eigenvalue| where needed to make each matrix
    PSD (PD if ``strict``) — reference: ot_vae_lightning/ot/matrix_utils.py:123-142.

    Unlike the reference this never warns or branches on data: the correction
    is computed and applied unconditionally (it is zero for matrices that are
    already PSD), which keeps the function jit-compatible.

    ``method`` (full matrices only): ``"eigh"`` measures |λmin| exactly via
    ``eigvalsh``; ``"polar"`` upper-bounds it by the negative-part Frobenius
    norm (:func:`_neg_part_norm`) — matmul-only, so streaming fit/update
    paths that re-PSD-ize covariances every batch stay off the TPU's slow
    eigendecomposition; ``"auto"`` picks polar on TPU, eigh elsewhere. On
    PSD input the polar correction is ~iteration round-off (≲1e-6·‖A‖F)
    instead of exactly 0.
    """
    if method == "auto":
        method = "polar" if (jax.default_backend() == "tpu" and not diag) else "eigh"
    if method not in ("eigh", "polar"):
        raise ValueError(f"unknown make_psd method {method!r}")
    if method == "polar" and not diag:
        smallest = -_neg_part_norm(symmetrize(matrices))
    else:
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
