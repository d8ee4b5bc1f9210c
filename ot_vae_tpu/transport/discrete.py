"""Discrete (codebook↔codebook) Sinkhorn transport
(reference: ot_vae_lightning/ot/transport/discrete_transport.py:28-99).
"""
from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from ot_vae_tpu.distributions.codebook import CodebookModel, CodebookState
from ot_vae_tpu.ops.sinkhorn_pallas import sinkhorn_log_auto as sinkhorn_log
from ot_vae_tpu.parallel.comm import NO_COMM, Comm
from ot_vae_tpu.transport.base import TransportOperator

__all__ = ["DiscreteTransport", "DiscreteTransportState"]

_EPS = 1e-8


class DiscreteTransportState(struct.PyTreeNode):
    source: CodebookState
    target: CodebookState
    plan: jax.Array  # [*L, K, K]
    fitted: jax.Array


@dataclasses.dataclass(frozen=True)
class DiscreteTransport(TransportOperator):
    """Sinkhorn plan between two streaming-fit codebooks; samples are routed
    through assignment × plan × target codebook
    (reference: discrete_transport.py:55-95)."""

    n_components: int = 256
    transport_type: str = "mean"  # 'mean' | 'argmax' | 'sample'
    metric: str = "euclidean"
    p: float = 2.0
    temperature: float = 1.0
    training_mode: str = "argmax"
    inference_mode: str = "argmax"
    topk: Optional[int] = None
    kmeans_iter: int = 100
    update_decay: Optional[float] = None
    sinkhorn_reg: float = 1e-5
    sinkhorn_max_iter: int = 1000
    sinkhorn_threshold: float = 1e-6
    dtype: jnp.dtype = jnp.float32

    @property
    def source_model(self) -> CodebookModel:
        return CodebookModel(
            leading_shape=self.leading_shape, dim=self.dim,
            n_components=self.n_components, metric=self.metric, p=self.p,
            topk=self.topk, temperature=self.temperature,
            training_mode=self.training_mode, inference_mode=self.inference_mode,
            kmeans_iter=self.kmeans_iter, update_decay=self.update_decay,
            dtype=self.dtype,
        )

    target_model = source_model

    def init(self, key: jax.Array) -> DiscreteTransportState:
        k1, k2 = jax.random.split(key)
        m = self.source_model
        K = self.n_components
        return DiscreteTransportState(
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
        """(reference: discrete_transport.py:55-68)"""
        m = self.source_model
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        source = m.fit(state.source, source_samples, k1, comm)
        target = m.fit(state.target, target_samples, k2, comm)
        # cost[i, j] between source atom i and target atom j
        cost = 1.0 / (m.energy(target.codebook, source.codebook) + _EPS)
        plan = sinkhorn_log(
            m.weights(source), m.weights(target), cost,
            reg=self.sinkhorn_reg, max_iter=self.sinkhorn_max_iter,
            threshold=self.sinkhorn_threshold,
        )
        total_cost = jnp.sum(cost * plan, axis=(-2, -1))
        state = state.replace(
            source=source, target=target, plan=plan.astype(self.dtype),
            fitted=jnp.asarray(True),
        )
        return state, total_cost

    def transport(self, state, inputs: jax.Array, key=None):
        """(reference: discrete_transport.py:70-95 — eval-mode assignment)"""
        m = self.source_model
        assignment = m.assign(state.source.codebook, inputs, key, training=False)
        target_assignments = assignment.weights @ state.plan  # [*L, B, K]
        if self.transport_type == "mean":
            pass
        elif self.transport_type == "argmax":
            idx = jnp.argmax(target_assignments, axis=-1)
            target_assignments = jax.nn.one_hot(
                idx, self.n_components, dtype=target_assignments.dtype
            )
        elif self.transport_type == "sample":
            if key is None:
                raise ValueError("transport_type='sample' requires a PRNG key")
            idx = jax.random.categorical(
                key, jnp.log(target_assignments + _EPS), axis=-1
            )
            target_assignments = jax.nn.one_hot(
                idx, self.n_components, dtype=target_assignments.dtype
            )
        else:
            raise NotImplementedError(self.transport_type)
        # row-normalize the plan mass routed to targets
        target_assignments = target_assignments / jnp.maximum(
            jnp.sum(target_assignments, axis=-1, keepdims=True), _EPS
        )
        return (target_assignments @ state.target.codebook).astype(inputs.dtype)

    def sample(self, state, key: jax.Array, batch_size: int, source: bool = True):
        m = self.source_model
        return m.sample(state.source if source else state.target, key, batch_size)
