"""Gaussian prior with the reparametrization trick
(reference: ot_vae_lightning/prior/gaussian.py:25-102).

Layout note: the reference chunks (μ, log σ²) on the channel dim (NCHW dim 1);
here the default is the last (channel) dim of NHWC — the TPU lane dimension,
so the chunk is a free reshape.
"""
from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ot_vae_tpu.priors.base import PriorModule, empirical_reverse_kl
from ot_vae_tpu.utils import unsqueeze_like

__all__ = ["GaussianPrior"]


def _normal_log_prob(x, mean, var):
    return -0.5 * (jnp.log(2.0 * jnp.pi * var) + (x - mean) ** 2 / var)


class GaussianPrior(PriorModule):
    """q(z|x) = N(μ(x), σ(x)²), p(z) = N(0, I)
    (reference: prior/gaussian.py:25-102).

    :param reparam_dim: axis carrying the stacked (μ, log σ²); default -1
                        (channels-last).
    :param fixed_var: unit variance; with an optional ``time`` input the
                      variance is scaled by the time temperature.
    :param empirical_kl: Monte-Carlo KL instead of closed form.
    """

    empirical_kl: bool = False
    reparam_dim: int = -1
    fixed_var: bool = False

    def reparametrization(
        self, z: jax.Array, temperature: Optional[jax.Array] = None
    ) -> Tuple[jax.Array, jax.Array]:
        """Split into (mean, var) (reference: prior/gaussian.py:73-81)."""
        if self.fixed_var:
            mu, var = z, jnp.ones_like(z)
            if temperature is not None:
                var = var * unsqueeze_like(temperature, var) + 1e-8
        else:
            mu, log_var = jnp.split(z, 2, axis=self.reparam_dim)
            var = jnp.exp(log_var / 2.0)  # NOTE: matches reference semantics
        return mu, var

    @staticmethod
    def closed_form_reverse_kl(q_mean, q_var, p_mean, p_var) -> jax.Array:
        """KL(q, p) for Gaussians, reduced over non-batch dims
        (reference: prior/gaussian.py:63-71)."""
        kl = 0.5 * (
            (q_mean - p_mean) ** 2 / p_var
            + jnp.log(p_var) - jnp.log(q_var)
            + q_var / p_var - 1.0
        )
        return jnp.sum(kl.reshape(kl.shape[0], -1), axis=-1)

    def out_size(self, size) -> Tuple[int, ...]:
        if self.fixed_var:
            return tuple(size)
        out = list(size)
        out[self.reparam_dim] //= 2
        return tuple(out)

    def __call__(
        self,
        x: jax.Array,
        step: jax.Array,
        key: jax.Array,
        train: bool = True,
        time: Optional[jax.Array] = None,
        **_,
    ):
        q_mean, q_var = self.reparametrization(x, temperature=time)
        p_mean, p_var = self.reparametrization(jnp.zeros_like(x))
        # q_var here is the scale σ (the reference's `(log_var/2).exp()`,
        # prior/gaussian.py:80); squared into a variance for the KL below.
        z = q_mean + q_var * jax.random.normal(key, q_mean.shape, q_mean.dtype)
        if self.empirical_kl:
            loss = empirical_reverse_kl(
                _normal_log_prob(z, p_mean, p_var**2),
                _normal_log_prob(z, q_mean, q_var**2),
                z,
            )
        else:
            loss = self.closed_form_reverse_kl(q_mean, q_var**2, p_mean, p_var**2)
        loss = self.scale_loss(loss, step)
        artifacts = {"prior": (p_mean, p_var), "distribution": (q_mean, q_var)}
        return z, loss, artifacts

    def sample(self, key: jax.Array, shape, **_) -> jax.Array:
        return jax.random.normal(key, tuple(shape))
