"""Parameter partitioning for model-parallel (2-D mesh) training.

The reference supports only data parallelism (SURVEY §2.2 — nothing else
exists in its tree). This module goes beyond it: a simple, general GSPMD
partitioner that shards large parameter arrays over a ``model`` mesh axis
(output-channel dim for conv kernels, output-feature dim for dense kernels)
while keeping small params replicated. With batches sharded over ``data``,
XLA inserts the all-gathers/reduce-scatters over ICI.

Usage::

    mesh = make_mesh(axis_names=("data", "model"), shape=(4, 2))
    shardings = partition_params(params, mesh, min_size=2**14)
    params = jax.device_put(params, shardings)
    # jit with in_shardings matching; GSPMD does the rest
"""
from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["partition_spec_for", "partition_params"]

MODEL_AXIS = "model"


def partition_spec_for(path: str, value: Any, mesh: Mesh, min_size: int = 1 << 14) -> P:
    """Heuristic spec: shard the trailing (output-feature) dim of large
    kernels over ``model`` when it divides evenly; replicate everything else."""
    if MODEL_AXIS not in mesh.axis_names:
        return P()
    axis_size = mesh.shape[MODEL_AXIS]
    shape = getattr(value, "shape", ())
    if np.prod(shape, dtype=np.int64) < min_size or len(shape) < 2:
        return P()
    # prefer the last dim (HWIO conv kernels / (in, out) dense kernels:
    # output features last)
    if shape[-1] % axis_size == 0 and shape[-1] >= axis_size:
        return P(*([None] * (len(shape) - 1)), MODEL_AXIS)
    if shape[-2] % axis_size == 0 and shape[-2] >= axis_size:
        return P(*([None] * (len(shape) - 2)), MODEL_AXIS, None)
    return P()


def partition_params(params, mesh: Mesh, min_size: int = 1 << 14):
    """Build a NamedSharding pytree for a parameter tree."""
    flat = jax.tree_util.tree_flatten_with_path(params)[0]

    def spec(path, v):
        return NamedSharding(
            mesh, partition_spec_for(jax.tree_util.keystr(path), v, mesh, min_size)
        )

    specs = {jax.tree_util.keystr(p): spec(p, v) for p, v in flat}

    def lookup(path, v):
        return specs[jax.tree_util.keystr(path)]

    return jax.tree_util.tree_map_with_path(lookup, params)
