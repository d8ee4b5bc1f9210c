"""Gaussian (Monge-map) transport operator
(reference: ot_vae_lightning/ot/transport/gaussian_transport.py:23-98).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from ot_vae_tpu.distributions.gaussian import GaussianModel, GaussianParams, GaussianState
from ot_vae_tpu.ops.w2 import apply_transport, compute_transport_operators, w2_gaussian
from ot_vae_tpu.parallel.comm import NO_COMM, Comm
from ot_vae_tpu.transport.base import TransportOperator

__all__ = ["GaussianTransport", "GaussianTransportState"]


def _shrink(cov: jax.Array, shrinkage: float, diag: bool) -> jax.Array:
    """(1-λ)Σ + λ·(tr Σ / D)·I — Ledoit-Wolf-style target shrinkage."""
    if diag:
        mean_var = jnp.mean(cov, axis=-1, keepdims=True)
        return (1.0 - shrinkage) * cov + shrinkage * mean_var
    d = cov.shape[-1]
    mean_var = jnp.trace(cov, axis1=-2, axis2=-1)[..., None, None] / d
    eye = jnp.eye(d, dtype=cov.dtype)
    return (1.0 - shrinkage) * cov + shrinkage * mean_var * eye


class GaussianTransportState(struct.PyTreeNode):
    source: GaussianState
    target: GaussianState
    mean_source: jax.Array
    mean_target: jax.Array
    T: jax.Array
    Cw: jax.Array
    fitted: jax.Array  # bool scalar


@dataclasses.dataclass(frozen=True)
class GaussianTransport(TransportOperator):
    """Affine map T(x-μs)+μt between two streaming-fit Gaussians; operators
    from eq. 17/19 of the distortion-perception paper
    (reference: gaussian_transport.py:64-95)."""

    diag: bool = False
    stochastic: bool = False
    pg_star: float = 0.0
    make_pd: bool = True
    update_decay: Optional[float] = None
    shrinkage: float = 1e-3
    # Kahan-compensated f32 accumulation ON by default: validated against the
    # float64 oracle at dims 64-512 / 1e5 samples (tests/test_empirical_cov.py,
    # reference parity: tests/test_empirical_cov.py:24-77). Only active for
    # plain sums (update_decay=None).
    compensated: bool = True
    dtype: jnp.dtype = jnp.float32
    # Spectral-pipeline selector for the W2/Monge math: "eigh" | "polar" |
    # "auto" (polar-NS on TPU — matmul-only, MXU-resident; eigh elsewhere).
    # See ot_vae_tpu/ops/w2.py:_polar_path for the measured trade-off.
    method: str = "auto"

    @property
    def source_model(self) -> GaussianModel:
        return GaussianModel(self.leading_shape, self.dim, diag=self.diag,
                             update_decay=self.update_decay, dtype=self.dtype,
                             compensated=self.compensated and
                             self.update_decay is None)

    target_model = source_model

    def init(self, key: jax.Array = None) -> GaussianTransportState:
        m = self.source_model
        L, D = self.leading_shape, self.dim
        op_shape = (*L, D) if self.diag else (*L, D, D)
        return GaussianTransportState(
            source=m.init(), target=m.init(),
            mean_source=jnp.zeros((*L, D), self.dtype),
            mean_target=jnp.zeros((*L, D), self.dtype),
            T=jnp.zeros(op_shape, self.dtype),
            Cw=jnp.zeros(op_shape, self.dtype),
            fitted=jnp.asarray(False),
        )

    def update(self, state, source_samples=None, target_samples=None,
               key=None, comm: Comm = NO_COMM, sample_weights=None):
        m = self.source_model
        if source_samples is not None:
            state = state.replace(source=m.update(
                state.source, source_samples, comm, sample_weights=sample_weights))
        if target_samples is not None:
            state = state.replace(target=m.update(
                state.target, target_samples, comm, sample_weights=sample_weights))
        return state

    def compute(self, state, source_samples=None, target_samples=None,
                key=None, comm: Comm = NO_COMM):
        """Fit both Gaussians, compute W2 + (T, Σw)
        (reference: gaussian_transport.py:64-78)."""
        m = self.source_model
        ps: GaussianParams = m.fit(state.source, source_samples, comm)
        pt: GaussianParams = m.fit(state.target, target_samples, comm)
        if self.shrinkage > 0:
            # trace-scaled diagonal loading: with fewer samples than
            # dimensions the empirical covariance is rank-deficient and the
            # Monge map amplifies its null space catastrophically (a latent
            # failure mode the reference shares — its STABILITY_CONST=1e-8
            # load gives ~1e4 amplification on dead directions)
            ps = GaussianParams(ps.mean, _shrink(ps.cov, self.shrinkage, self.diag))
            pt = GaussianParams(pt.mean, _shrink(pt.cov, self.shrinkage, self.diag))
        if self.diag:
            cov_s = jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(ps.cov)
            cov_t = jnp.vectorize(jnp.diag, signature="(d)->(d,d)")(pt.cov)
        else:
            cov_s, cov_t = ps.cov, pt.cov
        w2 = w2_gaussian(ps.mean, pt.mean, cov_s, cov_t, make_pd=self.make_pd,
                         method=self.method)
        T, Cw = compute_transport_operators(
            ps.cov, pt.cov, stochastic=self.stochastic, diag=self.diag,
            pg_star=self.pg_star, make_pd=self.make_pd, method=self.method,
        )
        state = state.replace(
            mean_source=ps.mean, mean_target=pt.mean, T=T, Cw=Cw,
            fitted=jnp.asarray(True),
        )
        return state, w2

    def transport(self, state, inputs: jax.Array, key=None):
        """(reference: gaussian_transport.py:80-95 — supports an extra
        trailing batch dim broadcast over the leading operator dims)"""
        is_batched = inputs.ndim == len(self.leading_shape) + 2
        bdim = -2 if is_batched else None

        def maybe_expand(x, mat=False):
            if bdim is None:
                return x
            return jnp.expand_dims(x, bdim - (0 if self.diag or not mat else 1))

        return apply_transport(
            inputs,
            maybe_expand(state.mean_source),
            maybe_expand(state.mean_target),
            maybe_expand(state.T, mat=True),
            maybe_expand(state.Cw, mat=True) if self.stochastic else None,
            diag=self.diag,
            key=key,
            method=self.method,
        )

    def sample(self, state, key: jax.Array, batch_size: int, source: bool = True):
        m = self.source_model
        st = state.source if source else state.target
        params = m.fit(st)
        if self.shrinkage > 0:
            params = GaussianParams(
                params.mean, _shrink(params.cov, self.shrinkage, self.diag)
            )
        return m.sample(params, key, batch_size)
