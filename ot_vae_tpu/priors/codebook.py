"""VQ-VAE-style codebook prior
(reference: ot_vae_lightning/prior/codebook.py:20-117).

``embed_dims`` selects which tensor dims are embedded via permute/flatten
(pixel / channel / whole-tensor), exactly as the reference — but indices refer
to NHWC layout (reference examples translate as: embed each pixel's channel
vector = last dim; embed each channel's spatial map = middle dims).

The codebook itself is a :class:`~ot_vae_tpu.distributions.CodebookModel`
state stored in the ``prior_stats`` mutable collection and fit online by
streaming k-means during the training forward pass; the encoder receives
gradients through the straight-through estimator
(reference: prior/codebook.py:95-96).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax

from ot_vae_tpu.distributions.codebook import CodebookModel
from ot_vae_tpu.parallel.comm import NO_COMM, Comm
from ot_vae_tpu.priors.base import PriorModule, annealing_coeff
from ot_vae_tpu.utils import permute_and_flatten, unflatten_and_unpermute

__all__ = ["CodebookPrior"]


class CodebookPrior(PriorModule):
    """Discrete codebook prior over permute-flattened latent needles.

    :param latent_size: latent tensor size WITHOUT batch, e.g. (H, W, C)
    :param embed_dims: 1-based dims (as in the reference) to embed together;
                       e.g. (3,) embeds each pixel's channel vector (NHWC),
                       (1, 2, 3) embeds the whole tensor.
    :param loss: None | 'l2' | 'kl' | 'first_kl' (reference: codebook.py:77-87)
    :param temperature_annealing: cosine temperature schedule period (steps)
    """

    latent_size: Tuple[int, ...] = ()
    embed_dims: Tuple[int, ...] = ()
    loss: Optional[str] = None
    temperature_annealing: Optional[int] = None
    n_components: int = 256
    metric: str = "euclidean"
    p: float = 2.0
    topk: Optional[int] = None
    temperature: float = 1.0
    training_mode: str = "argmax"
    inference_mode: str = "argmax"
    kmeans_decay: Optional[float] = 0.99
    laplace_eps: Optional[float] = 1e-5
    update_with_autograd: bool = False
    # Reference parity: ONE codebook shared across token positions
    # (reference: prior/codebook.py:66 — ``CodebookModel(1, dimensionality)``
    # with the leading dim broadcasting over ``prod(batch_shape)``).
    # ``True`` keeps the round-≤4 behavior (an independent codebook per
    # token position) — K·D·n_tokens parameters instead of K·D; at the
    # production DAD scale that deviation was 33.5M extra f32 params whose
    # grad+Adam traffic alone was the top op of the profiled train step.
    per_token_codebook: bool = False

    @property
    def _dims(self):
        all_dims = list(range(1, len(self.latent_size) + 1))
        if not set(self.embed_dims).issubset(all_dims):
            raise ValueError(
                f"`embed_dims` must be a subset of {all_dims}, got {self.embed_dims}"
            )
        batch_dims = sorted(set(all_dims).difference(self.embed_dims))
        event_shape = tuple(self.latent_size[i - 1] for i in self.embed_dims)
        batch_shape = tuple(self.latent_size[i - 1] for i in batch_dims)
        return batch_dims, event_shape, batch_shape

    @property
    def event_shape(self):
        return self._dims[1]

    @property
    def batch_shape(self):
        return self._dims[2]

    @property
    def dimensionality(self) -> int:
        return int(np.prod(self.event_shape))

    @property
    def num_embeddings(self) -> int:
        return self.n_components

    @property
    def n_tokens(self) -> int:
        return int(np.prod(self.batch_shape))

    @property
    def _codebook_leading(self) -> Tuple[int, ...]:
        if self.per_token_codebook and self.n_tokens > 1:
            return (self.n_tokens,)
        return (1,)

    @property
    def codebook_model(self) -> CodebookModel:
        return CodebookModel(
            leading_shape=self._codebook_leading,
            dim=self.dimensionality,
            n_components=self.n_components,
            metric=self.metric, p=self.p, topk=self.topk,
            temperature=self.temperature,
            training_mode=self.training_mode, inference_mode=self.inference_mode,
            update_decay=self.kmeans_decay, laplace_eps=self.laplace_eps,
        )

    @property
    def commitment_cost(self) -> float:
        # reference: prior/codebook.py:67 — no commitment for hard modes
        return 0.0 if self.training_mode in ("sample", "argmax") else 0.1

    def out_size(self, size):
        return tuple(size)

    def _flatten(self, x):
        """[B, *latent_size] → [n_tokens, B, dimensionality]
        (reference: prior/codebook.py:51-63, batch_first=False)."""
        return permute_and_flatten(
            x, self.embed_dims, batch_first=False, flatten_batch=False
        )

    def _unflatten(self, xr):
        return unflatten_and_unpermute(
            xr, (-1, *self.latent_size), self.embed_dims,
            batch_first=False, flatten_batch=False,
        )

    def setup(self):
        model = self.codebook_model
        if self.update_with_autograd:
            # codebook learned by SGD (through gumbel/soft assignments) —
            # the reference's `update_with_autograd` mode
            # (ot/distribution_models/codebook_model.py:89)
            self._cb_param = self.param(
                "codebook", nn.initializers.normal(1.0),
                (*self._codebook_leading, self.n_components,
                 self.dimensionality),
            )
        else:
            self._cb_state = self.variable(
                "prior_stats", "codebook",
                lambda: model.init(self.make_rng("params")),
            )

    def _current_state(self):
        if self.update_with_autograd:
            from ot_vae_tpu.distributions.codebook import CodebookState

            return CodebookState(
                codebook=self._cb_param,
                n_obs=jnp.ones((*self._codebook_leading, self.n_components),
                               self._cb_param.dtype),
                s1=jnp.zeros_like(self._cb_param),
                initialized=jnp.asarray(True),
            )
        return self._cb_state.value

    def _compute_loss(self, x, encodings, probs):
        """Prior loss per batch element (reference: prior/codebook.py:77-87).
        x/encodings: [n_tokens, B, D]; probs: [n_tokens, B, K]."""
        if self.loss is None:
            prior_loss = jnp.zeros(x.shape[-2], x.dtype)
        elif self.loss.lower() == "l2":
            prior_loss = jnp.mean(
                (x - lax.stop_gradient(encodings)) ** 2, axis=-1
            ).sum(0)
        elif self.loss.lower() in ("kl", "first_kl"):
            entropy = -jnp.sum(probs * jnp.log(probs + 1e-8), axis=-1)  # [T, B]
            kl = float(np.log(self.num_embeddings)) - entropy
            prior_loss = kl[0] if self.loss.lower() == "first_kl" else kl.sum(0)
        else:
            raise NotImplementedError(f"loss={self.loss}")
        if self.commitment_cost > 0:
            embed_loss = jnp.mean(
                (encodings - lax.stop_gradient(x)) ** 2, axis=-1
            ).sum(0)
            prior_loss = prior_loss + self.commitment_cost * embed_loss
        return prior_loss

    def __call__(
        self,
        x: jax.Array,
        step: jax.Array,
        key: jax.Array,
        train: bool = True,
        comm: Comm = NO_COMM,
        **_,
    ):
        model = self.codebook_model
        xf = self._flatten(x)  # [n_tokens, B, D]
        state = self._current_state()

        temp = None
        if self.temperature_annealing is not None:
            # reference: prior/codebook.py:114-117
            s = jnp.asarray(step, jnp.float32)
            temp = self.temperature * 0.5 * jnp.cos(
                np.pi * s / self.temperature_annealing
            ) + 0.5

        k_update, k_assign = jax.random.split(key)
        if train and not self.update_with_autograd and not self.is_initializing():
            xu = lax.stop_gradient(xf)
            if self._codebook_leading == (1,) and xu.shape[0] != 1:
                # shared codebook: every token position's vectors update the
                # ONE codebook (reference: CodebookModel(1, dim) broadcast)
                xu = xu.reshape(1, -1, xu.shape[-1])
            state = model.update(state, xu, k_update, comm=comm)
            self._cb_state.value = state

        encodings, assignment = model.predict(
            state, xf, k_assign, training=train, temperature=temp
        )
        prior_loss = self._compute_loss(xf, encodings, assignment.probs)
        prior_loss = self.scale_loss(prior_loss, step)

        if self.training_mode in ("sample", "argmax"):
            # straight-through estimator (reference: prior/codebook.py:95-96)
            encodings = xf + lax.stop_gradient(encodings - xf)

        z = self._unflatten(encodings)
        artifacts = {
            # [B, n_tokens, K] / [B, n_tokens] — token-major for the AR decoder
            "distribution": jnp.swapaxes(assignment.probs, 0, 1),
            "indices": jnp.swapaxes(assignment.indices, 0, 1),
        }
        return z, prior_loss, artifacts

    def sample(self, key: jax.Array, shape, **_) -> jax.Array:
        """Draw codebook atoms per token position and reassemble the latent
        (reference: prior/codebook.py:107-112 — indices are drawn
        INDEPENDENTLY for every (token, batch) slot, from the one shared
        categorical when the codebook is shared)."""
        from ot_vae_tpu.distributions.codebook import _EPS

        model = self.codebook_model
        state = self._current_state()
        batch_size = shape[0]
        T = max(self.n_tokens, 1)
        if self._codebook_leading == (1,) and T > 1:
            logits = jnp.log(model.weights(state) + _EPS)[0]  # [K]
            idx = jax.random.categorical(key, logits, shape=(T, batch_size))
            draws = state.codebook[0][idx]  # [T, B, D]
        else:
            draws = model.sample(state, key, batch_size)  # [T, B, D]
        return self._unflatten(draws)

    def codebook(self) -> jax.Array:
        return self._current_state().codebook
