"""Device-mesh helpers for data-parallel (and beyond) training.

The reference's only parallelism strategy is DDP via Lightning
(reference: ot_vae_lightning/configs/ddp.yaml:1-5, SURVEY §2.2). The
TPU-native equivalent: a 1-D ``data`` mesh over ICI, batches sharded on
``data``, parameters replicated; XLA inserts the gradient psum.
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(
    devices: Optional[Sequence[jax.Device]] = None,
    axis_names: Sequence[str] = (DATA_AXIS,),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Create a mesh over all (or the given) devices.

    Default: 1-D ``data`` mesh — the DDP-equivalent layout. Pass
    ``axis_names=("data", "model")`` with a ``shape`` for 2-D layouts.
    """
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (len(devices),) if len(axis_names) == 1 else None
    if shape is None:
        raise ValueError("shape is required for multi-axis meshes")
    dev_array = np.asarray(devices).reshape(tuple(shape))
    return Mesh(dev_array, tuple(axis_names))


def data_sharding(mesh: Mesh, ndim: int = 0) -> NamedSharding:
    """Shard the leading (batch) dimension over the ``data`` axis."""
    spec = P(DATA_AXIS, *([None] * max(0, ndim - 1))) if ndim else P(DATA_AXIS)
    return NamedSharding(mesh, spec)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def spans_processes(mesh: Mesh) -> bool:
    """True when the mesh contains devices of other JAX processes (pod /
    multi-host training)."""
    pi = jax.process_index()
    return any(d.process_index != pi for d in mesh.devices.flat)


def shard_batch(mesh: Mesh, batch):
    """Device-put a pytree of host arrays with the batch axis sharded on
    ``data`` (replaces the reference's DistributedSampler per-rank split).

    Multi-process meshes: each process passes ONLY its host-local rows
    (shape [B/num_processes, ...]) and the result is the global [B, ...]
    array — no host ever materializes the full batch."""
    if spans_processes(mesh):
        from ot_vae_tpu.parallel.multihost import host_local_batch_to_global

        return host_local_batch_to_global(mesh, batch)

    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(put, batch)


def put_replicated(mesh: Mesh, tree):
    """Replicate a (process-identical) pytree over the mesh. Works on
    multi-process meshes, where plain ``jax.device_put`` cannot target
    non-addressable devices."""
    if spans_processes(mesh):
        from jax.experimental import multihost_utils

        return multihost_utils.host_local_array_to_global_array(
            tree, mesh, P()
        )
    return jax.device_put(tree, replicated(mesh))
