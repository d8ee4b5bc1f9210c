"""Per-class learnable Gaussian prior N(μ_y, σ_y²)
(reference: ot_vae_lightning/prior/conditional_gaussian.py:30-123).

Two fitting modes, as in the reference:

* SGD mode (``ema_decay`` None): μ/log σ tables are trainable parameters.
* EMA mode: tables live in the ``prior_stats`` mutable collection and are
  updated from one-hot-scattered per-class sums of the posterior statistics,
  psum'd across the data axis through the comm seam
  (reference: conditional_gaussian.py:106-120 — the DDP all-reduce call site).
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ot_vae_tpu.parallel.comm import NO_COMM, Comm
from ot_vae_tpu.priors.gaussian import GaussianPrior
from ot_vae_tpu.utils import laplace_smoothing

__all__ = ["ConditionalGaussianPrior"]


class ConditionalGaussianPrior(GaussianPrior):
    """q(z|x,y) = N(μ(x), σ(x)²), p(z|y) = N(μ_y, σ_y²)."""

    dim: Tuple[int, ...] = ()  # latent size AFTER reparametrization, e.g. (H, W, C)
    num_classes: int = 10
    ema_decay: Optional[float] = None
    eps: float = 1e-5

    @property
    def _flat(self) -> int:
        return int(np.prod(self.dim))

    def setup(self):
        init = lambda key, shape, dtype: -jax.random.uniform(key, shape, dtype)
        if self.ema_decay is None or self.ema_decay <= 0:
            self._mu = self.param("mu", init, (self.num_classes, self._flat), jnp.float32)
            self._log_std = self.param(
                "log_std", init, (self.num_classes, self._flat), jnp.float32
            )
        else:
            self._mu = self.variable(
                "prior_stats", "mu",
                lambda: -jax.random.uniform(
                    self.make_rng("params"), (self.num_classes, self._flat)
                ),
            )
            self._log_std = self.variable(
                "prior_stats", "log_std",
                lambda: -jax.random.uniform(
                    self.make_rng("params"), (self.num_classes, self._flat)
                ),
            )
            self._size = self.variable(
                "prior_stats", "size", lambda: jnp.zeros((self.num_classes,))
            )
            self._mu_avg = self.variable(
                "prior_stats", "mu_avg",
                lambda: jnp.zeros((self.num_classes, self._flat)),
            )
            self._log_std_avg = self.variable(
                "prior_stats", "log_std_avg",
                lambda: jnp.zeros((self.num_classes, self._flat)),
            )

    def _tables(self):
        if self.ema_decay is None or self.ema_decay <= 0:
            return self._mu, self._log_std
        return self._mu.value, self._log_std.value

    def p(self, labels: jax.Array) -> Tuple[jax.Array, jax.Array]:
        """Per-class prior (mean, scale) shaped [B, *dim]
        (reference: conditional_gaussian.py:103-104)."""
        mu, log_std = self._tables()
        mean = jnp.take(mu, labels, axis=0).reshape(labels.shape[0], *self.dim)
        scale = jnp.exp(jnp.take(log_std, labels, axis=0)).reshape(
            labels.shape[0], *self.dim
        )
        return mean, scale

    def _ema_update(self, q_mean, q_scale, labels, comm: Comm):
        """One-hot-scattered per-class EMA of posterior stats, psum'd
        (reference: conditional_gaussian.py:106-120)."""
        one_hot = jax.nn.one_hot(labels, self.num_classes, dtype=q_mean.dtype)
        sizes = comm.psum(jnp.sum(one_hot, axis=0))
        mu_sum = comm.psum(one_hot.T @ q_mean.reshape(q_mean.shape[0], -1))
        log_std_sum = comm.psum(
            one_hot.T @ jnp.log(q_scale).reshape(q_scale.shape[0], -1)
        )
        d = self.ema_decay
        self._size.value = self._size.value * d + sizes * (1 - d)
        self._mu_avg.value = self._mu_avg.value * d + mu_sum * (1 - d)
        self._log_std_avg.value = self._log_std_avg.value * d + log_std_sum * (1 - d)
        denom = laplace_smoothing(self._size.value, self.num_classes, self.eps)
        self._mu.value = self._mu_avg.value / denom[:, None]
        self._log_std.value = self._log_std_avg.value / denom[:, None]

    def __call__(  # noqa: D102 — contract in PriorModule
        self,
        x: jax.Array,
        step: jax.Array,
        key: jax.Array,
        train: bool = True,
        labels: Optional[jax.Array] = None,
        comm: Comm = NO_COMM,
        **_,
    ):
        if labels is None:
            raise ValueError("ConditionalGaussianPrior requires `labels`")
        q_mean, q_scale = self.reparametrization(x)
        p_mean, p_scale = self.p(labels)
        z = q_mean + q_scale * jax.random.normal(key, q_mean.shape, q_mean.dtype)
        loss = self.closed_form_reverse_kl(
            q_mean, q_scale**2, p_mean, p_scale**2
        )
        loss = self.scale_loss(loss, step)
        if train and self.ema_decay is not None and self.ema_decay > 0:
            self._ema_update(q_mean, q_scale, labels, comm)
        artifacts = {"prior": (p_mean, p_scale), "distribution": (q_mean, q_scale)}
        return z, loss, artifacts

    def sample(self, key: jax.Array, shape, labels: Optional[jax.Array] = None, **_):
        if labels is None:
            raise ValueError("ConditionalGaussianPrior.sample requires `labels`")
        p_mean, p_scale = self.p(labels)
        return p_mean + p_scale * jax.random.normal(key, p_mean.shape, p_mean.dtype)
