"""GMM (mixture-coupling) transport
(reference: ot_vae_lightning/ot/transport/gmm_transport.py:28-124).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ot_vae_tpu.distributions.gmm import GMMModel, GMMState
from ot_vae_tpu.ops.w2 import apply_transport, batch_ot_gmm, compute_transport_operators
from ot_vae_tpu.parallel.comm import NO_COMM, Comm
from ot_vae_tpu.transport.base import TransportOperator

__all__ = ["GMMTransport", "GMMTransportState"]

_EPS = 1e-8


class GMMTransportState(struct.PyTreeNode):
    source: GMMState
    target: GMMState
    plan: jax.Array  # [*L, K, K]
    fitted: jax.Array


@dataclasses.dataclass(frozen=True)
class GMMTransport(TransportOperator):
    """Sinkhorn coupling between GMM components (MW2 upper bound); samples
    are routed through the coupling to a target component by
    sample/argmax/barycenter and transported with the per-pair Gaussian
    operators (reference: gmm_transport.py:65-121)."""

    n_components: int = 16
    transport_type: str = "argmax"  # 'sample' | 'argmax' | 'barycenter'
    diag: bool = True
    stochastic: bool = False
    pg_star: float = 0.0
    make_pd: bool = True
    temperature: float = 1.0
    topk: Optional[int] = None
    training_mode: str = "argmax"
    inference_mode: str = "argmax"
    kmeans_iter: int = 100
    update_decay: Optional[float] = None
    sinkhorn_max_iter: int = 100
    dtype: jnp.dtype = jnp.float32
    # W2 spectral-pipeline selector ("eigh" | "polar" | "auto") — see
    # ot_vae_tpu/ops/w2.py:_polar_path. Only full-covariance paths use it.
    method: str = "auto"

    @property
    def source_model(self) -> GMMModel:
        return GMMModel(
            leading_shape=self.leading_shape, dim=self.dim,
            n_components=self.n_components, diag=self.diag, topk=self.topk,
            temperature=self.temperature, training_mode=self.training_mode,
            inference_mode=self.inference_mode, kmeans_iter=self.kmeans_iter,
            update_decay=self.update_decay, dtype=self.dtype,
        )

    target_model = source_model

    def init(self, key: jax.Array) -> GMMTransportState:
        k1, k2 = jax.random.split(key)
        m = self.source_model
        K = self.n_components
        return GMMTransportState(
            source=m.init(k1), target=m.init(k2),
            plan=jnp.zeros((*self.leading_shape, K, K), self.dtype),
            fitted=jnp.asarray(False),
        )

    def update(self, state, source_samples=None, target_samples=None,
               key=None, comm: Comm = NO_COMM, sample_weights=None):
        m = self.source_model
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        if source_samples is not None:
            state = state.replace(source=m.update(
                state.source, source_samples, k1, comm, sample_weights=sample_weights))
        if target_samples is not None:
            state = state.replace(target=m.update(
                state.target, target_samples, k2, comm, sample_weights=sample_weights))
        return state

    def compute(self, state, source_samples=None, target_samples=None,
                key=None, comm: Comm = NO_COMM):
        """Sinkhorn coupling between the fitted components
        (reference: gmm_transport.py:65-79)."""
        m = self.source_model
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        source = m.fit(state.source, source_samples, k1, comm)
        target = m.fit(state.target, target_samples, k2, comm)
        ps, pt = m.params(source), m.params(target)
        total_cost, coupling = batch_ot_gmm(
            ps.mean, pt.mean, ps.cov, pt.cov, self.diag,
            ps.weights, pt.weights, method=self.method,
            max_iter=self.sinkhorn_max_iter,
        )
        state = state.replace(
            source=source, target=target, plan=coupling.astype(self.dtype),
            fitted=jnp.asarray(True),
        )
        return state, total_cost

    def transport(self, state, inputs: jax.Array, key=None):
        """(reference: gmm_transport.py:81-121)"""
        m = self.source_model
        ps, pt = m.params(state.source), m.params(state.target)
        k_assign, k_route, k_noise = (
            jax.random.split(key, 3) if key is not None else (None, None, None)
        )
        assignments = m.assign(ps, inputs, k_assign, training=False).weights
        source_means, source_vars = m.predict_mean_var(ps, assignments)

        target_assignments = assignments @ state.plan  # [*L, B, K]

        if self.transport_type in ("sample", "argmax"):
            if self.transport_type == "argmax":
                idx = jnp.argmax(target_assignments, axis=-1)
            else:
                if k_route is None:
                    raise ValueError("transport_type='sample' requires a PRNG key")
                idx = jax.random.categorical(
                    k_route, jnp.log(target_assignments + _EPS), axis=-1
                )
            one_hot = jax.nn.one_hot(
                idx, self.n_components, dtype=target_assignments.dtype
            )
            target_means, target_vars = m.predict_mean_var(pt, one_hot)
        elif self.transport_type == "barycenter":
            w = target_assignments / jnp.maximum(
                jnp.sum(target_assignments, axis=-1, keepdims=True), _EPS
            )
            target_means, target_vars = m.barycenter(pt, w, n_iter=100)
        else:
            raise NotImplementedError(self.transport_type)

        T, Cw = compute_transport_operators(
            source_vars, target_vars, stochastic=self.stochastic, diag=self.diag,
            pg_star=self.pg_star, make_pd=self.make_pd, method=self.method,
        )
        return apply_transport(
            inputs, source_means, target_means, T,
            Cw if self.stochastic else None, diag=self.diag, key=k_noise,
            method=self.method,
        ).astype(inputs.dtype)

    def sample(self, state, key: jax.Array, batch_size: int, source: bool = True):
        m = self.source_model
        st = state.source if source else state.target
        return m.sample(m.params(st), key, batch_size)
