"""Multivariate Gaussian distribution model with streaming moments.

Functional, pytree-state re-design of the reference ``GaussianModel``
(reference: ot_vae_lightning/ot/distribution_models/gaussian_model.py:29-229).
The reference keeps running sums in ``nn.Module`` buffers mutated in-place and
guards SPD-ness with parametrization hooks; here:

* state is an immutable :class:`GaussianState` pytree threaded through pure
  ``update``/``fit`` functions — jit/donate-friendly, checkpointable as-is;
* SPD safety is applied at read time (``fit``) via symmetrize + eigenvalue
  clamp — strictly simpler than torch parametrizations;
* cross-device reduction goes through the :mod:`ot_vae_tpu.parallel` comm
  seam (``reduce_on_update`` semantics, reference base.py:45,56);
* the SGD-fitting mode (``update_with_autograd`` + ``ExpScaleTril``,
  reference gaussian_model.py:186-202) becomes an unconstrained trainable
  parametrization (``init_trainable``/``constrain``/``nll``).
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from ot_vae_tpu.ops.matrix import STABILITY_CONST, make_psd, mean_cov, symmetrize
from ot_vae_tpu.ops.w2 import w2_gaussian
from ot_vae_tpu.parallel.comm import NO_COMM, Comm
from ot_vae_tpu.utils import ema

__all__ = ["GaussianState", "GaussianParams", "GaussianModel"]


class GaussianState(struct.PyTreeNode):
    """Streaming sufficient statistics (n, Σx, Σxxᵀ), with optional Kahan
    compensation buffers (c1, c2) for float32 accumulation over long streams
    (SURVEY §7 hard part: the reference accumulates in float64,
    gaussian_model.py:60-62 — TPUs have no fast f64, compensated f32 summation
    recovers the precision)."""

    n: jax.Array  # [*L]
    s1: jax.Array  # [*L, D]
    s2: jax.Array  # [*L, D, D]  ([*L, D] when diag)
    c1: Optional[jax.Array] = None  # Kahan compensation for s1
    c2: Optional[jax.Array] = None  # Kahan compensation for s2


def _kahan_add(total, comp, add):
    """One compensated-summation step; carries the rounding error forward."""
    y = add - comp
    t = total + y
    comp_new = (t - total) - y
    return t, comp_new


class GaussianParams(NamedTuple):
    mean: jax.Array  # [*L, D]
    cov: jax.Array  # [*L, D, D]  ([*L, D] when diag)


@dataclasses.dataclass(frozen=True)
class GaussianModel:
    """Static configuration + pure state-transformation functions.

    :param leading_shape: number of independent operators fit in parallel [*L]
    :param dim: feature dimensionality D
    :param diag: diagonal-covariance mode
    :param update_decay: EMA decay for streaming stats (None = plain sums)
    :param reduce_on_update: psum stats across the data axis on every update
                             (else only at fit time)
    """

    leading_shape: Tuple[int, ...] = ()
    dim: int = 1
    diag: bool = False
    update_decay: Optional[float] = None
    reduce_on_update: bool = True
    compensated: bool = False  # Kahan-compensated f32 accumulation
    dtype: jnp.dtype = jnp.float32

    # ------------------------------------------------------------- streaming

    def init(self) -> GaussianState:
        L, D = self.leading_shape, self.dim
        cov_shape = (*L, D) if self.diag else (*L, D, D)
        z1 = jnp.zeros((*L, D), self.dtype)
        z2 = jnp.zeros(cov_shape, self.dtype)
        return GaussianState(
            n=jnp.zeros(L, self.dtype),
            s1=z1,
            s2=z2,
            c1=jnp.zeros_like(z1) if self.compensated else None,
            c2=jnp.zeros_like(z2) if self.compensated else None,
        )

    def _batch_stats(self, samples: jax.Array, sample_weights=None):
        samples = samples.astype(self.dtype)
        if sample_weights is None:
            n = jnp.full(self.leading_shape, samples.shape[-2], self.dtype)
            weighted = samples
        else:
            # per-sample weights [*L, B] — zero weight excludes a sample
            # (jit-safe class filtering; the reference filters host-side,
            # ot/transport_callback.py:691-694)
            w = sample_weights.astype(self.dtype)
            n = jnp.broadcast_to(jnp.sum(w, axis=-1), self.leading_shape)
            weighted = samples * w[..., None]
        s1 = jnp.sum(weighted, axis=-2)
        if self.diag:
            s2 = jnp.sum(weighted * samples, axis=-2)
        else:
            s2 = jnp.einsum("...bi,...bj->...ij", weighted, samples)
        return n, s1, s2

    def update(
        self, state: GaussianState, samples: jax.Array, comm: Comm = NO_COMM,
        sample_weights=None,
    ) -> GaussianState:
        """Accumulate a batch [*L, B, D] into the streaming stats
        (reference: gaussian_model.py:100-108)."""
        n, s1, s2 = self._batch_stats(samples, sample_weights)
        if self.reduce_on_update:
            n, s1, s2 = comm.psum(n), comm.psum(s1), comm.psum(s2)
        d = self.update_decay
        if self.compensated and d is None:
            # Kahan summation: y = add - c; t = s + y; c = (t - s) - y
            new_s1, new_c1 = _kahan_add(state.s1, state.c1, s1)
            new_s2, new_c2 = _kahan_add(state.s2, state.c2, s2)
            return GaussianState(
                n=state.n + n, s1=new_s1, s2=new_s2, c1=new_c1, c2=new_c2
            )
        return state.replace(
            n=ema(state.n, n, d), s1=ema(state.s1, s1, d), s2=ema(state.s2, s2, d)
        )

    def fit(
        self,
        state: GaussianState,
        samples: Optional[jax.Array] = None,
        comm: Comm = NO_COMM,
    ) -> GaussianParams:
        """Finalize (mean, cov) from the streaming stats
        (reference: gaussian_model.py:110-126). Optionally folds one last batch
        in. When ``reduce_on_update`` is off, stats are psum'd here once."""
        if samples is not None:
            state = self.update(state, samples, comm=comm)
        n, s1, s2 = state.n, state.s1, state.s2
        if not self.reduce_on_update:
            n, s1, s2 = comm.psum(n), comm.psum(s1), comm.psum(s2)
        n = jnp.maximum(n, STABILITY_CONST)
        mean, cov = mean_cov(s1, s2, n, diag=self.diag)
        if self.diag:
            cov = jnp.clip(cov, STABILITY_CONST, None)
        else:
            cov = make_psd(symmetrize(cov), strict=True, method="auto")
        return GaussianParams(mean, cov)

    # ------------------------------------------------------------- evaluation

    def log_prob(self, params: GaussianParams, samples: jax.Array) -> jax.Array:
        """log N(x | μ, Σ) for a batch [*L, B, D] → [*L, B]
        (reference ``predict``: gaussian_model.py:128-131)."""
        mean, cov = params
        x = samples - mean[..., None, :]
        D = self.dim
        if self.diag:
            var = cov[..., None, :]
            logdet = jnp.sum(jnp.log(cov), axis=-1)[..., None]
            maha = jnp.sum(x**2 / var, axis=-1)
        else:
            chol = jnp.linalg.cholesky(cov)
            # solve L Y = Xᵀ in matrix form: one triangular solve per leading
            # element over all B samples at once — never materializes a
            # per-sample D×D factor
            y = jax.scipy.linalg.solve_triangular(
                chol, jnp.swapaxes(x, -1, -2), lower=True
            )  # [*L, D, B]
            logdet = 2.0 * jnp.sum(
                jnp.log(jnp.diagonal(chol, axis1=-2, axis2=-1)), axis=-1
            )[..., None]
            maha = jnp.sum(y**2, axis=-2)  # [*L, B]
        return -0.5 * (maha + logdet + D * float(np.log(2.0 * np.pi)))

    def sample(
        self, params: GaussianParams, key: jax.Array, batch_size: int
    ) -> jax.Array:
        """Draw [*L, B, D] samples."""
        mean, cov = params
        eps = jax.random.normal(
            key, (*self.leading_shape, batch_size, self.dim), self.dtype
        )
        if self.diag:
            return mean[..., None, :] + eps * jnp.sqrt(cov)[..., None, :]
        chol = jnp.linalg.cholesky(make_psd(symmetrize(cov), strict=True, method="auto"))
        return mean[..., None, :] + jnp.einsum("...ij,...bj->...bi", chol, eps)

    def w2(self, params: GaussianParams, other: GaussianParams) -> jax.Array:
        """Squared W2 to another Gaussian (reference: gaussian_model.py:133-139)."""
        cov_a = jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(params.cov) if self.diag else params.cov
        cov_b = jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(other.cov) if other.cov.shape == other.mean.shape else other.cov
        return w2_gaussian(params.mean, other.mean, cov_a, cov_b, make_pd=True)

    # ------------------------------------------------------------- autograd fit

    def init_trainable(self, key: jax.Array) -> dict:
        """Unconstrained parametrization for SGD fitting: mean + either
        log-variance (diag) or a free matrix whose exp-diag lower triangle is
        the Cholesky factor (the reference's ``ExpScaleTril``,
        gaussian_model.py:186-202)."""
        k1, k2 = jax.random.split(key)
        L, D = self.leading_shape, self.dim
        mean = jax.random.normal(k1, (*L, D), self.dtype)
        if self.diag:
            scale_raw = jnp.zeros((*L, D), self.dtype)
        else:
            scale_raw = jnp.zeros((*L, D, D), self.dtype)
        return {"mean": mean, "scale_raw": scale_raw}

    def constrain(self, trainable: dict) -> GaussianParams:
        mean, raw = trainable["mean"], trainable["scale_raw"]
        if self.diag:
            return GaussianParams(mean, jnp.exp(raw))
        tril = jnp.tril(raw, -1) + jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(
            jnp.exp(jnp.diagonal(raw, axis1=-2, axis2=-1))
        )
        cov = tril @ jnp.swapaxes(tril, -1, -2)
        return GaussianParams(mean, cov)

    def nll(self, trainable: dict, samples: jax.Array) -> jax.Array:
        """Mean negative log-likelihood — the SGD fitting loss."""
        return -jnp.mean(self.log_prob(self.constrain(trainable), samples))
