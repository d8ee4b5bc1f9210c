"""Explicit train state (replaces Lightning's implicit module state).

Non-weight state that must survive save/load (SURVEY §5 checkpoint list):
EMA shadow params, prior embeddings/buffers (``prior_stats`` collection),
batchnorm statistics — all live here as pytrees.
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
from flax import struct

__all__ = ["TrainState"]


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    mutable: Any  # dict of mutable collections: batch_stats, prior_stats, ...
    opt_state: Any
    ema_params: Optional[Any] = None

    @property
    def variables(self):
        return {"params": self.params, **self.mutable}

    @property
    def ema_variables(self):
        """Variables with EMA shadow params swapped in
        (reference: torch_ema store/copy_to, model/base.py:153-166)."""
        params = self.ema_params if self.ema_params is not None else self.params
        return {"params": params, **self.mutable}

    @classmethod
    def create(cls, variables, opt, ema_decay: Optional[float] = None):
        variables = dict(variables)
        params = variables.pop("params")
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            mutable=variables,
            opt_state=opt.init(params),
            # real copies — aliasing the param buffers breaks donation
            # (double-donate) in the jitted train step
            ema_params=jax.tree_util.tree_map(jnp.copy, params)
            if ema_decay is not None
            else None,
        )
