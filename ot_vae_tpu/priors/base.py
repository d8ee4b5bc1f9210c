"""Prior abstraction (reference: ot_vae_lightning/prior/base.py:26-78).

A prior is a flax module implementing::

    __call__(x, step, key, train, **cond) -> (z, loss [B], artifacts dict)
    sample(key, shape, **cond) -> z
    out_size(size) -> size

``step`` is a traced scalar; the cosine warm-up of the loss coefficient
(reference base.py:74-78) is computed on device with ``jnp.where`` — no
Python branching on step.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

__all__ = ["annealing_coeff", "empirical_reverse_kl", "PriorModule"]


def annealing_coeff(step: jax.Array, annealing_steps: int) -> jax.Array:
    """Cosine warm-up in [0, 1]; 1 once past ``annealing_steps``
    (reference: prior/base.py:76)."""
    if annealing_steps <= 0:
        return jnp.asarray(1.0)
    s = jnp.asarray(step, jnp.float32)
    warm = 0.5 * jnp.cos(np.pi * (s / annealing_steps + 1.0)) + 0.5
    return jnp.where(s < annealing_steps, warm, 1.0)


def empirical_reverse_kl(log_prob_p, log_prob_q, z: jax.Array) -> jax.Array:
    """Monte-Carlo KL(q || p) from per-element log-probs evaluated at z
    (reference: prior/base.py:65-68). Reduces over all non-batch dims."""
    diff = log_prob_q - log_prob_p
    return jnp.sum(diff.reshape(diff.shape[0], -1), axis=-1)


class PriorModule(nn.Module):
    """Base class carrying the loss-coefficient warm-up contract."""

    loss_coeff: float = 1.0
    annealing_steps: int = 0

    def scale_loss(self, loss: jax.Array, step: jax.Array) -> jax.Array:
        return loss * self.loss_coeff * annealing_coeff(step, self.annealing_steps)
