"""Numerical argument validation / sanitization for the OT core.

jit-compatible re-design of the reference's ``_validate_args`` runtime checker
(reference: ot_vae_lightning/ot/w2_utils.py:605-708): instead of raising /
warning from inside the computation (host syncs), shapes are checked at trace
time, and value-level conditions (symmetry, positive-definiteness, valid
probability vectors) are returned as a diagnostics pytree the caller can log
outside the hot path. ``sanitize_*`` variants apply the corrections
unconditionally (no data-dependent branching).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ot_vae_tpu.ops.matrix import (
    STABILITY_CONST,
    is_pd,
    is_symmetric,
    make_psd,
    min_eig,
    symmetrize,
)

__all__ = ["Diagnostics", "check_spd", "check_prob", "sanitize_spd", "sanitize_prob"]


class Diagnostics(NamedTuple):
    """Value-level findings, returned (not raised) — log them host-side."""

    all_symmetric: jax.Array  # bool
    all_pd: jax.Array  # bool
    min_eigenvalue: jax.Array  # float
    max_correction: jax.Array  # float — diag shift applied by sanitize_spd


def check_spd(matrices: jax.Array, strict: bool = True) -> Diagnostics:
    """Diagnose a batch of matrices expected to be SPD
    (the reference raises/warns here, w2_utils.py:661-679)."""
    me = min_eig(symmetrize(matrices))
    correction = jnp.abs(jnp.clip(jnp.min(me), None, 0.0))
    return Diagnostics(
        all_symmetric=jnp.all(is_symmetric(matrices)),
        all_pd=jnp.all(is_pd(matrices, strict=strict)),
        min_eigenvalue=jnp.min(me),
        max_correction=correction,
    )


def sanitize_spd(matrices: jax.Array, strict: bool = True) -> Tuple[jax.Array, Diagnostics]:
    """Symmetrize + eigenvalue-shift to SPD, returning what was corrected
    (the jit-safe analog of ``make_pd=True, verbose=True``)."""
    diags = check_spd(matrices, strict)
    fixed = make_psd(symmetrize(matrices), strict=strict)
    return fixed, diags


def check_prob(p: jax.Array, tol: float = 1e-5) -> jax.Array:
    """True where each vector is a valid probability vector
    (reference: w2_utils.py:641-653)."""
    nonneg = jnp.all(p >= -tol, axis=-1)
    sums = jnp.sum(p, axis=-1)
    return jnp.logical_and(nonneg, jnp.abs(sums - 1.0) <= tol)


def sanitize_prob(p: jax.Array) -> jax.Array:
    """Clip to non-negative and renormalize."""
    p = jnp.clip(p, 0.0, None)
    return p / jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), STABILITY_CONST)
