"""Transport operators: source↔target distribution pairs with streaming
updates and a computed transport map
(reference: ot_vae_lightning/ot/transport/base.py:28-173).

Functional design: each operator is a frozen config with pure
``init/update/compute/transport`` functions over an immutable pytree state —
the reference's buffer mutation becomes state threading. Optional raw-sample
buffering (reference base.py:134-149) is host-side in the callback (python
list + device concat at fit time), not in the jitted state.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax

from ot_vae_tpu.parallel.comm import NO_COMM, Comm

__all__ = ["TransportOperator"]


@dataclasses.dataclass(frozen=True)
class TransportOperator:
    """Abstract base: subclasses define source/target distribution models and
    the transport computation."""

    leading_shape: Tuple[int, ...] = ()
    dim: int = 1
    reset_source: bool = True
    reset_target: bool = True
    store_source: bool = False
    store_target: bool = False

    def init(self, key: jax.Array):
        raise NotImplementedError

    def reset(self, state, key: jax.Array):
        """Re-init the sides flagged for reset (reference: base.py:90-99)."""
        fresh = self.init(key)
        return state.replace(
            **({"source": fresh.source} if self.reset_source else {}),
            **({"target": fresh.target} if self.reset_target else {}),
        )

    def update(
        self,
        state,
        source_samples: Optional[jax.Array] = None,
        target_samples: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        comm: Comm = NO_COMM,
    ):
        """Feed samples into either side (reference: base.py:107-132)."""
        raise NotImplementedError

    def compute(
        self,
        state,
        source_samples: Optional[jax.Array] = None,
        target_samples: Optional[jax.Array] = None,
        key: Optional[jax.Array] = None,
        comm: Comm = NO_COMM,
    ):
        """Fit both models and compute the transport operator.

        :return: (new state with fitted operator, transport cost [*L])
        (reference: base.py:151-158 + subclass ``compute``)
        """
        raise NotImplementedError

    def transport(self, state, inputs: jax.Array, key: Optional[jax.Array] = None):
        """Map source samples onto the target distribution
        (reference: base.py:160-169)."""
        raise NotImplementedError
