"""Gaussian Mixture Model fit by streaming mini-batch k-means.

Functional re-design of the reference ``GaussianMixtureModel``
(reference: ot_vae_lightning/ot/distribution_models/gassian_mixture_model.py:28-189
— the filename typo is the reference's). Per-component streaming
(weight-sum, weighted Σx, weighted Σxxᵀ) with EMA + laplace smoothing;
soft/hard assignment by posterior energy; weights via normalized counts
(the reference's ``NormSum`` parametrization) with an SGD/softmax trainable
variant.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ot_vae_tpu.distributions.codebook import Assignment, _EPS, assign_from_energy
from ot_vae_tpu.distributions.gaussian import GaussianModel, GaussianParams
from ot_vae_tpu.ops.matrix import STABILITY_CONST, make_psd, mean_cov, symmetrize
from ot_vae_tpu.ops.w2 import batch_ot_gmm, gaussian_barycenter
from ot_vae_tpu.parallel.comm import NO_COMM, Comm
from ot_vae_tpu.utils import ema, laplace_smoothing

__all__ = ["GMMState", "GMMParams", "GMMModel"]


class GMMState(struct.PyTreeNode):
    mean: jax.Array  # [*L, K, D]
    cov: jax.Array  # [*L, K, D, D] ([*L, K, D] when diag)
    n_obs: jax.Array  # [*L, K]
    s1: jax.Array  # [*L, K, D]
    s2: jax.Array  # [*L, K, D, D] ([*L, K, D] when diag)
    initialized: jax.Array  # bool scalar


class GMMParams(NamedTuple):
    mean: jax.Array
    cov: jax.Array
    weights: jax.Array  # [*L, K]


@dataclasses.dataclass(frozen=True)
class GMMModel:
    leading_shape: Tuple[int, ...] = ()
    dim: int = 1
    n_components: int = 16
    diag: bool = False
    topk: Optional[int] = None
    temperature: float = 1.0
    training_mode: str = "argmax"
    inference_mode: str = "argmax"
    kmeans_iter: int = 100
    laplace_eps: Optional[float] = 1e-5
    update_decay: Optional[float] = None
    reduce_on_update: bool = True
    dtype: jnp.dtype = jnp.float32

    @property
    def _component_gaussian(self) -> GaussianModel:
        """Per-component Gaussian with the components folded into the leading
        shape — reuses log_prob/sample from the single-Gaussian model."""
        return GaussianModel(
            leading_shape=(*self.leading_shape, self.n_components),
            dim=self.dim,
            diag=self.diag,
            dtype=self.dtype,
        )

    # ------------------------------------------------------------- state

    def init(self, key: jax.Array) -> GMMState:
        L, K, D = self.leading_shape, self.n_components, self.dim
        cov_shape = (*L, K, D) if self.diag else (*L, K, D, D)
        cov0 = jnp.ones(cov_shape, self.dtype) if self.diag else jnp.broadcast_to(
            jnp.eye(D, dtype=self.dtype), cov_shape
        )
        return GMMState(
            mean=jax.random.normal(key, (*L, K, D), self.dtype),
            cov=cov0,
            n_obs=jnp.zeros((*L, K), self.dtype),
            s1=jnp.zeros((*L, K, D), self.dtype),
            s2=jnp.zeros(cov_shape, self.dtype),
            initialized=jnp.asarray(False),
        )

    def params(self, state: GMMState) -> GMMParams:
        total = jnp.sum(state.n_obs, axis=-1, keepdims=True)
        uniform = jnp.full_like(state.n_obs, 1.0 / self.n_components)
        weights = jnp.where(total > _EPS, state.n_obs / jnp.maximum(total, _EPS), uniform)
        return GMMParams(state.mean, state.cov, weights)

    # ------------------------------------------------------------- energy/assign

    def energy(self, params: GMMParams, samples: jax.Array) -> jax.Array:
        """Posterior energy: component log-prob + log mixture weight
        (reference: gassian_mixture_model.py:94-102). [*L, B, D] → [*L, B, K]."""
        lp = self._component_gaussian.log_prob(
            GaussianParams(params.mean, params.cov), samples[..., None, :, :]
        )  # [*L, K, B]
        lp = jnp.swapaxes(lp, -1, -2)  # [*L, B, K]
        return lp + jnp.log(params.weights + _EPS)[..., None, :]

    def assign(
        self,
        params: GMMParams,
        samples: jax.Array,
        key: Optional[jax.Array] = None,
        training: bool = True,
    ) -> Assignment:
        """Mode-resolved assignment on the posterior energy
        (reference: base.py:206-239) — shares mode semantics with the
        codebook model."""
        mode = self.training_mode if training else self.inference_mode
        return assign_from_energy(
            self.energy(params, samples), mode, self.n_components,
            self.temperature, self.topk, key,
        )

    # ------------------------------------------------------------- k-means

    def _sums(self, assignment: Assignment, samples: jax.Array):
        """Weighted (count, Σx, Σxxᵀ) per component
        (reference: gassian_mixture_model.py:112-124)."""
        w = assignment.weights  # [*L, B, K]
        x = samples.astype(w.dtype)
        w_sum = jnp.sum(w, axis=-2)
        wt = jnp.swapaxes(w, -1, -2)  # [*L, K, B]
        s1 = wt @ x
        if self.diag:
            s2 = wt @ (x**2)
        else:
            # flatten the per-sample outer product so the weighted reduction is
            # a single [K,B]×[B,D²] matmul on the MXU (a 3-operand einsum here
            # tempts XLA into materializing a B·K·D·D intermediate)
            d = x.shape[-1]
            xx = (x[..., :, None] * x[..., None, :]).reshape(*x.shape[:-1], d * d)
            s2 = (wt @ xx).reshape(*w_sum.shape, d, d)
        return w_sum, s1, s2

    def _params_from_sums(self, state: GMMState, w_sum, s1, s2, decay_buffers: bool):
        hit = w_sum > _EPS
        d = self.update_decay if decay_buffers else None
        if decay_buffers:
            n_obs = jnp.where(hit, ema(state.n_obs, w_sum, d), state.n_obs)
            s1_b = jnp.where(hit[..., None], ema(state.s1, s1, d), state.s1)
            mask2 = hit[..., None] if self.diag else hit[..., None, None]
            s2_b = jnp.where(mask2, ema(state.s2, s2, d), state.s2)
        else:
            n_obs = jnp.where(hit, w_sum, state.n_obs)
            s1_b = jnp.where(hit[..., None], s1, state.s1)
            mask2 = hit[..., None] if self.diag else hit[..., None, None]
            s2_b = jnp.where(mask2, s2, state.s2)

        n_smooth = laplace_smoothing(n_obs, self.n_components, self.laplace_eps)
        mean, cov = mean_cov(s1_b, s2_b, jnp.maximum(n_smooth, _EPS), diag=self.diag)
        if self.diag:
            cov = jnp.clip(cov, STABILITY_CONST, None)
        else:
            cov = make_psd(symmetrize(cov), strict=True, method="auto")
        mean = jnp.where(hit[..., None], mean, state.mean)
        mask2 = hit[..., None] if self.diag else hit[..., None, None]
        cov = jnp.where(mask2, cov, state.cov)
        return state.replace(mean=mean, cov=cov, n_obs=n_obs, s1=s1_b, s2=s2_b)

    def _maybe_init(self, state: GMMState, samples: jax.Array, key: jax.Array):
        """Seed means on first contact with k-means++ (the reference draws
        uniformly random batch samples, gassian_mixture_model.py:173-177)."""
        from ot_vae_tpu.distributions.codebook import kmeanspp_init

        def do_init(_):
            mean = kmeanspp_init(
                jnp.broadcast_to(
                    samples.astype(self.dtype),
                    (*self.leading_shape, *samples.shape[-2:]),
                ),
                self.n_components, key,
            )
            return state.replace(
                mean=mean, n_obs=state.n_obs + 1.0, initialized=jnp.asarray(True)
            )

        return lax.cond(state.initialized, lambda _: state, do_init, None)

    def update(
        self,
        state: GMMState,
        samples: jax.Array,
        key: Optional[jax.Array] = None,
        comm: Comm = NO_COMM,
        sample_weights=None,
    ) -> GMMState:
        """One streaming mini-batch k-means step [*L, B, D]
        (reference: gassian_mixture_model.py:88-89 via codebook_model.py:122-132).
        ``sample_weights`` [*L, B] optionally down-weights/excludes samples."""
        if key is None:
            key = jax.random.PRNGKey(0)
        k_init, k_assign = jax.random.split(key)
        state = self._maybe_init(state, samples, k_init)
        assignment = self.assign(self.params(state), samples, k_assign, training=True)
        if sample_weights is not None:
            assignment = assignment._replace(
                weights=assignment.weights * sample_weights[..., None]
            )
        w_sum, s1, s2 = self._sums(assignment, samples)
        if self.reduce_on_update:
            w_sum, s1, s2 = comm.psum(w_sum), comm.psum(s1), comm.psum(s2)
        return self._params_from_sums(state, w_sum, s1, s2, decay_buffers=True)

    def fit(
        self,
        state: GMMState,
        samples: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        comm: Comm = NO_COMM,
    ) -> GMMState:
        """Full k-means (``kmeans_iter`` Lloyd iterations) on a sample set, or
        finalize from buffers (reference: codebook_model.py:134-148)."""
        if samples is None:
            return self._params_from_sums(
                state, state.n_obs, state.s1, state.s2, decay_buffers=False
            )
        if key is None:
            key = jax.random.PRNGKey(0)
        k_init, k_loop = jax.random.split(key)
        state = self._maybe_init(state, samples, k_init)

        def body(i, carry):
            st, k = carry
            k, k_assign = jax.random.split(k)
            assignment = self.assign(self.params(st), samples, k_assign, training=True)
            w_sum, s1, s2 = self._sums(assignment, samples)
            w_sum, s1, s2 = comm.psum(w_sum), comm.psum(s1), comm.psum(s2)
            return self._params_from_sums(st, w_sum, s1, s2, decay_buffers=False), k

        state, _ = lax.fori_loop(0, max(self.kmeans_iter, 1), body, (state, k_loop))
        return state

    # ------------------------------------------------------------- evaluation

    def predict_mean_var(
        self, params: GMMParams, assignments: jax.Array
    ) -> Tuple[jax.Array, jax.Array]:
        """Assignment-weighted component mean/cov per sample
        (reference: gassian_mixture_model.py:104-110)."""
        mean = assignments @ params.mean  # [*L, B, D]
        if self.diag:
            var = assignments @ params.cov
        else:
            var = jnp.einsum("...bk,...kij->...bij", assignments, params.cov)
        return mean, var

    def log_prob(self, params: GMMParams, samples: jax.Array) -> jax.Array:
        """Mixture log-likelihood log Σ_k w_k N(x | μ_k, Σ_k) → [*L, B]."""
        return jax.nn.logsumexp(self.energy(params, samples), axis=-1)

    def sample(self, params: GMMParams, key: jax.Array, batch_size: int) -> jax.Array:
        k_comp, k_gauss = jax.random.split(key)
        logits = jnp.log(params.weights + _EPS)
        idx = jax.random.categorical(
            k_comp, logits[..., None, :], axis=-1,
            shape=(*self.leading_shape, batch_size),
        )  # [*L, B]
        comp_samples = self._component_gaussian.sample(
            GaussianParams(params.mean, params.cov), k_gauss, batch_size
        )  # [*L, K, B, D]
        one_hot = jax.nn.one_hot(idx, self.n_components, dtype=comp_samples.dtype)
        return jnp.einsum("...bk,...kbd->...bd", one_hot, comp_samples)

    def barycenter(
        self, params: GMMParams, assignments: jax.Array, n_iter: int = 100
    ) -> Tuple[jax.Array, jax.Array]:
        """Per-sample W2 barycenter of the components under assignment weights
        (used by barycentric GMM transport, reference gmm_transport.py:107-114)."""
        mean = jnp.broadcast_to(
            params.mean[..., None, :, :],
            (*assignments.shape[:-1], self.n_components, self.dim),
        )
        cov_shape = (
            (*assignments.shape[:-1], self.n_components, self.dim)
            if self.diag
            else (*assignments.shape[:-1], self.n_components, self.dim, self.dim)
        )
        cov = jnp.broadcast_to(params.cov[..., None, :, :] if self.diag
                               else params.cov[..., None, :, :, :], cov_shape)
        return gaussian_barycenter(mean, cov, assignments, diag=self.diag, n_iter=n_iter)

    def w2(self, params: GMMParams, other: GMMParams, **sinkhorn_kwargs) -> jax.Array:
        """Entropic MW2 to another GMM (reference: gassian_mixture_model.py:126-136)."""
        cost, _ = batch_ot_gmm(
            params.mean, other.mean, params.cov, other.cov, self.diag,
            params.weights, other.weights,
            **{"max_iter": 100, **sinkhorn_kwargs},
        )
        return cost

    # ------------------------------------------------------------- autograd fit

    def init_trainable(self, key: jax.Array) -> dict:
        """SGD-fit parametrization: per-component Gaussian trainables + weight
        logits (the reference's softmax-parametrized ``_weights``,
        gassian_mixture_model.py:55-57)."""
        t = self._component_gaussian.init_trainable(key)
        t["weight_logits"] = jnp.zeros(
            (*self.leading_shape, self.n_components), self.dtype
        )
        return t

    def constrain(self, trainable: dict) -> GMMParams:
        g = self._component_gaussian.constrain(
            {k: trainable[k] for k in ("mean", "scale_raw")}
        )
        return GMMParams(g.mean, g.cov, jax.nn.softmax(trainable["weight_logits"], -1))

    def nll(self, trainable: dict, samples: jax.Array) -> jax.Array:
        return -jnp.mean(self.log_prob(self.constrain(trainable), samples))
