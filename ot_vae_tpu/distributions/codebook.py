"""Discrete codebook (VQ dictionary) model fit by streaming k-means.

Functional re-design of the reference ``CodebookModel`` /
``CategoricalEmbeddings``
(reference: ot_vae_lightning/ot/distribution_models/codebook_model.py:27-214,
mixture machinery in base.py:165-265). State is an immutable pytree; the
data-dependent first-batch initialization (codebook_model.py:210-214) is a
``lax.cond`` on an ``initialized`` flag; assignment modes use explicit PRNG
keys.
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from ot_vae_tpu.ops.w2 import sinkhorn_log
from ot_vae_tpu.parallel.comm import NO_COMM, Comm
from ot_vae_tpu.utils import ema, laplace_smoothing

__all__ = ["CodebookState", "CodebookModel", "Assignment"]

_EPS = 1e-8


class CodebookState(struct.PyTreeNode):
    codebook: jax.Array  # [*L, K, D]
    n_obs: jax.Array  # [*L, K]
    s1: jax.Array  # [*L, K, D]
    initialized: jax.Array  # bool scalar


class Assignment(NamedTuple):
    weights: jax.Array  # [*L, B, K] — mode-resolved assignment weights
    indices: jax.Array  # [*L, B] — sampled/argmax indices
    probs: jax.Array  # [*L, B, K] — softmax assignment distribution


def assign_from_energy(
    energy: jax.Array,
    mode: str,
    n_components: int,
    temperature: float = 1.0,
    topk: Optional[int] = None,
    key: Optional[jax.Array] = None,
) -> Assignment:
    """Resolve assignment weights from an energy matrix under the given mode
    (reference: ot_vae_lightning/ot/distribution_models/base.py:206-239).
    Shared by the codebook and GMM models."""
    if topk is not None and topk > 0:
        kth = jnp.sort(energy, axis=-1)[..., -topk][..., None]
        energy = jnp.where(energy >= kth, energy, -jnp.inf)

    probs = jax.nn.softmax(energy / temperature, axis=-1)
    if key is not None:
        k_ind, k_mode = jax.random.split(key)
        indices = jax.random.categorical(k_ind, jnp.log(probs + _EPS), axis=-1)
    else:
        k_mode = None
        indices = jnp.argmax(probs, axis=-1)

    if mode == "mean" or topk == 1:
        weights = probs
    elif mode == "sample":
        weights = jax.nn.one_hot(indices, n_components, dtype=probs.dtype)
    elif mode == "argmax":
        weights = jax.nn.one_hot(jnp.argmax(probs, -1), n_components, dtype=probs.dtype)
    elif "gumbel" in mode:
        if k_mode is None:
            raise ValueError("gumbel assignment modes require a PRNG key")
        g = jax.random.gumbel(k_mode, energy.shape, dtype=probs.dtype)
        soft = jax.nn.softmax((energy + g) / temperature, axis=-1)
        if "hard" in mode:
            hard = jax.nn.one_hot(jnp.argmax(soft, -1), n_components, dtype=probs.dtype)
            # straight-through: hard forward, soft gradient
            weights = soft + lax.stop_gradient(hard - soft)
        else:
            weights = soft
    else:
        raise NotImplementedError(f"assignment mode={mode}")

    return Assignment(weights, indices, probs)


def kmeanspp_init(samples: jax.Array, k: int, key: jax.Array) -> jax.Array:
    """Farthest-point (maxmin) seeding: the first center is a random sample,
    each subsequent center the sample farthest from the chosen set.

    :param samples: [*L, B, D]
    :return: centers [*L, k, D]

    The reference seeds k-means with uniformly random batch samples
    (codebook_model.py:210-214), which frequently merges nearby clusters.
    Farthest-point seeding guarantees cluster coverage for separated data
    (pure kmeans++ D²-sampling still duplicates ~20% of picks here) and is a
    K-step ``lax.fori_loop`` of batched distance matmuls — MXU-friendly.
    """
    *L, B, D = samples.shape
    centers0 = jnp.zeros((*L, k, D), samples.dtype)

    def body(i, carry):
        centers, key = carry
        key, sk = jax.random.split(key)
        # squared distance to each chosen slot; +inf for not-yet-chosen slots
        d2 = jnp.sum(
            (samples[..., :, None, :] - centers[..., None, :, :]) ** 2, axis=-1
        )  # [*L, B, k]
        slot_ids = jax.lax.broadcasted_iota(jnp.int32, d2.shape, d2.ndim - 1)
        d2 = jnp.where(slot_ids < i, d2, jnp.inf)
        min_d2 = jnp.min(d2, axis=-1)  # [*L, B] — distance to chosen set
        rand_idx = jax.random.randint(sk, L or (), 0, B)
        far_idx = jnp.argmax(min_d2, axis=-1)
        idx = jnp.where(i == 0, rand_idx, far_idx)  # [*L]
        new_center = jnp.take_along_axis(
            samples, idx[..., None, None], axis=-2
        )  # [*L, 1, D]
        centers = centers.at[..., i, :].set(new_center[..., 0, :].astype(centers.dtype))
        return centers, key

    centers, _ = lax.fori_loop(0, k, body, (centers0, key))
    return centers


@dataclasses.dataclass(frozen=True)
class CodebookModel:
    """Static config + pure state transforms for a discrete codebook.

    Mirrors the reference mixture config surface
    (reference: ot_vae_lightning/ot/distribution_models/base.py:168-190):
    metric euclidean/cosine with power ``p``, optional top-k masking,
    temperature, per-phase assignment modes, mini-batch k-means with EMA +
    laplace smoothing.
    """

    leading_shape: Tuple[int, ...] = ()
    dim: int = 1
    n_components: int = 16
    metric: str = "euclidean"
    p: float = 2.0
    topk: Optional[int] = None
    temperature: float = 1.0
    training_mode: str = "argmax"
    inference_mode: str = "argmax"
    kmeans_iter: int = 100
    laplace_eps: Optional[float] = 1e-5
    update_decay: Optional[float] = None
    reduce_on_update: bool = True
    dtype: jnp.dtype = jnp.float32

    # ------------------------------------------------------------- state

    def init(self, key: jax.Array) -> CodebookState:
        L, K, D = self.leading_shape, self.n_components, self.dim
        return CodebookState(
            codebook=jax.random.normal(key, (*L, K, D), self.dtype),
            n_obs=jnp.zeros((*L, K), self.dtype),
            s1=jnp.zeros((*L, K, D), self.dtype),
            initialized=jnp.asarray(False),
        )

    def weights(self, state: CodebookState) -> jax.Array:
        """Mixture weights from observation counts; uniform before any data
        (reference: codebook_model.py:95-100)."""
        total = jnp.sum(state.n_obs, axis=-1, keepdims=True)
        uniform = jnp.full_like(state.n_obs, 1.0 / self.n_components)
        return jnp.where(total > _EPS, state.n_obs / jnp.maximum(total, _EPS), uniform)

    # ------------------------------------------------------------- energy/assign

    def energy(self, codebook: jax.Array, samples: jax.Array) -> jax.Array:
        """Similarity of samples [*L, B, D] to components → [*L, B, K]
        (reference: codebook_model.py:155-168)."""
        x = samples.astype(codebook.dtype)
        if self.metric == "euclidean":
            if self.p == 2.0:
                sq = (
                    jnp.sum(x**2, axis=-1, keepdims=True)
                    + jnp.sum(codebook**2, axis=-1)[..., None, :]
                    - 2.0 * x @ jnp.swapaxes(codebook, -1, -2)
                )
                cdist = jnp.sqrt(jnp.clip(sq, 0.0, None))
            else:
                diff = jnp.abs(x[..., :, None, :] - codebook[..., None, :, :])
                cdist = jnp.sum(diff**self.p, axis=-1) ** (1.0 / self.p)
            return 1.0 / (cdist + _EPS)
        if self.metric == "cosine":
            norm_x = jnp.sum(jnp.abs(x) ** self.p, axis=-1, keepdims=True)
            norm_c = jnp.sum(jnp.abs(codebook) ** self.p, axis=-1)[..., None, :]
            dot = jnp.abs(x @ jnp.swapaxes(codebook, -1, -2))
            return dot / (norm_x * norm_c + _EPS) ** (1.0 / self.p)
        raise NotImplementedError(f"metric={self.metric}")

    def assign(
        self,
        codebook: jax.Array,
        samples: jax.Array,
        key: Optional[jax.Array] = None,
        training: bool = True,
        temperature=None,
    ) -> Assignment:
        """Assign samples to components under the configured mode
        (reference: base.py:206-239). ``key`` is required for the stochastic
        modes ('sample', gumbel); 'argmax'/'mean' are deterministic.
        ``temperature`` may be a traced array to override the static config
        (used by the prior's temperature annealing, reference
        prior/codebook.py:114-117)."""
        mode = self.training_mode if training else self.inference_mode
        return assign_from_energy(
            self.energy(codebook, samples), mode, self.n_components,
            self.temperature if temperature is None else temperature,
            self.topk, key,
        )

    # ------------------------------------------------------------- k-means

    def _kmeans_sums(self, assignment: Assignment, samples: jax.Array):
        """Per-component weight sum and weighted sample sum
        (reference: base.py:241-253)."""
        w = assignment.weights
        w_sum = jnp.sum(w, axis=-2)  # [*L, K]
        s1 = jnp.swapaxes(w, -1, -2) @ samples.astype(w.dtype)  # [*L, K, D]
        return w_sum, s1

    def _maybe_init(
        self, state: CodebookState, samples: jax.Array, key: jax.Array
    ) -> CodebookState:
        """Data-dependent init on first contact: k-means++ seeding (the
        reference uses uniformly random batch samples,
        codebook_model.py:210-214 — k-means++ recovers clusters far more
        reliably)."""

        def do_init(_):
            cb = kmeanspp_init(
                jnp.broadcast_to(
                    samples.astype(self.dtype),
                    (*self.leading_shape, *samples.shape[-2:]),
                ),
                self.n_components, key,
            )
            return state.replace(
                codebook=cb,
                n_obs=state.n_obs + 1.0,
                initialized=jnp.asarray(True),
            )

        return lax.cond(state.initialized, lambda _: state, do_init, None)

    def update(
        self,
        state: CodebookState,
        samples: jax.Array,
        key: Optional[jax.Array] = None,
        comm: Comm = NO_COMM,
        sample_weights=None,
    ) -> CodebookState:
        """One streaming k-means step on a batch [*L, B, D]
        (reference: codebook_model.py:122-132). ``sample_weights`` [*L, B]
        optionally down-weights/excludes samples (jit-safe class filtering)."""
        if key is None:
            key = jax.random.PRNGKey(0)
        k_init, k_assign = jax.random.split(key)
        state = self._maybe_init(state, samples, k_init)

        assignment = self.assign(state.codebook, samples, k_assign, training=True)
        if sample_weights is not None:
            assignment = assignment._replace(
                weights=assignment.weights * sample_weights[..., None]
            )
        w_sum, s1 = self._kmeans_sums(assignment, samples)
        if self.reduce_on_update:
            w_sum, s1 = comm.psum(w_sum), comm.psum(s1)

        hit = w_sum > _EPS
        d = self.update_decay
        n_obs = jnp.where(hit, ema(state.n_obs, w_sum, d), state.n_obs)
        s1_new = jnp.where(hit[..., None], ema(state.s1, s1, d), state.s1)

        denom = laplace_smoothing(n_obs, self.n_components, self.laplace_eps)
        codebook = jnp.where(
            hit[..., None], s1_new / denom[..., None], state.codebook
        )
        return state.replace(codebook=codebook, n_obs=n_obs, s1=s1_new)

    def fit(
        self,
        state: CodebookState,
        samples: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        comm: Comm = NO_COMM,
    ) -> CodebookState:
        """Full k-means on a sample set (``kmeans_iter`` Lloyd iterations), or
        finalize from the streaming buffers when ``samples`` is None
        (reference: codebook_model.py:134-148)."""
        if samples is None:
            hit = state.n_obs > _EPS
            denom = laplace_smoothing(state.n_obs, self.n_components, self.laplace_eps)
            codebook = jnp.where(
                hit[..., None], state.s1 / denom[..., None], state.codebook
            )
            return state.replace(codebook=codebook)

        if key is None:
            key = jax.random.PRNGKey(0)
        k_init, k_loop = jax.random.split(key)
        state = self._maybe_init(state, samples, k_init)

        def body(i, carry):
            st, k = carry
            k, k_assign = jax.random.split(k)
            assignment = self.assign(st.codebook, samples, k_assign, training=True)
            w_sum, s1 = self._kmeans_sums(assignment, samples)
            w_sum, s1 = comm.psum(w_sum), comm.psum(s1)
            hit = w_sum > _EPS
            denom = laplace_smoothing(w_sum, self.n_components, self.laplace_eps)
            codebook = jnp.where(hit[..., None], s1 / denom[..., None], st.codebook)
            return st.replace(codebook=codebook, n_obs=jnp.where(hit, w_sum, st.n_obs),
                              s1=jnp.where(hit[..., None], s1, st.s1)), k

        state, _ = lax.fori_loop(0, max(self.kmeans_iter, 1), body, (state, k_loop))
        return state

    # ------------------------------------------------------------- evaluation

    def predict(
        self,
        state: CodebookState,
        samples: jax.Array,
        key: Optional[jax.Array] = None,
        training: bool = True,
        temperature=None,
    ) -> Tuple[jax.Array, Assignment]:
        """Quantize samples: (assignment-weighted codebook vectors, assignment)
        (reference: codebook_model.py:150-153)."""
        assignment = self.assign(state.codebook, samples, key, training, temperature)
        preds = assignment.weights @ state.codebook
        return preds, assignment

    def sample(
        self, state: CodebookState, key: jax.Array, batch_size: int
    ) -> jax.Array:
        """Draw codebook vectors [*L, B, D] according to the mixture weights
        (reference ``CategoricalEmbeddings.sample``: codebook_model.py:60-64)."""
        logits = jnp.log(self.weights(state) + _EPS)
        idx = jax.random.categorical(
            key, logits[..., None, :], axis=-1,
            shape=(*self.leading_shape, batch_size),
        )
        return jnp.take_along_axis(state.codebook, idx[..., None], axis=-2)

    def w2(self, state: CodebookState, other: CodebookState) -> jax.Array:
        """Sinkhorn OT cost between two codebooks
        (reference: codebook_model.py:177-184)."""
        # energy(codebook=other, samples=own atoms) → rows index own atoms,
        # columns index the other codebook's atoms: cost [*L, K_self, K_other]
        cost = 1.0 / (self.energy(other.codebook, state.codebook) + _EPS)
        plan = sinkhorn_log(
            self.weights(state), self.weights(other), cost,
            reg=1e-5, max_iter=100, threshold=1e-3,
        )
        return jnp.sum(cost * plan, axis=(-2, -1))
