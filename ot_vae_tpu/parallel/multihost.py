"""Multi-host (pod / multi-slice) wiring.

The reference's multi-node story is Lightning ddp over NCCL/DCN (reference:
configs/ddp.yaml:1-5 — one process per device, init_process_group). The
TPU-native equivalent: one JAX process per host, ``jax.distributed.initialize``
to form the global runtime, a mesh spanning all processes (collectives ride
ICI within a slice, DCN across slices), and per-host data feeding where each
process loads only its shard and assembles a global array.

Single-process behavior: every helper degrades to the identity, so the same
training script runs unchanged from a laptop to a pod.
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import jax
import numpy as np

__all__ = [
    "initialize_distributed",
    "global_mesh",
    "host_local_batch_to_global",
    "ProcessComm",
    "per_host_slice",
]


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize the multi-process JAX runtime.

    Arguments default to the standard env vars (``JAX_COORDINATOR_ADDRESS``,
    ``JAX_NUM_PROCESSES``, ``JAX_PROCESS_ID``); on TPU pods
    ``jax.distributed.initialize()`` auto-discovers everything from the TPU
    metadata, so all three may be None. Returns True when a multi-process
    runtime was initialized, False when single-process (no coordinator
    configured — the local dev path).
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    num_processes = num_processes if num_processes is not None else (
        int(os.environ["JAX_NUM_PROCESSES"])
        if "JAX_NUM_PROCESSES" in os.environ else None
    )
    process_id = process_id if process_id is not None else (
        int(os.environ["JAX_PROCESS_ID"])
        if "JAX_PROCESS_ID" in os.environ else None
    )
    on_tpu_pod = os.environ.get("TPU_WORKER_HOSTNAMES") or os.environ.get(
        "MEGASCALE_COORDINATOR_ADDRESS"
    )
    if coordinator_address is None and not on_tpu_pod:
        return False  # single-process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def global_mesh(axis_names: Sequence[str] = ("data",),
                shape: Optional[Sequence[int]] = None):
    """Mesh over ALL devices of ALL processes. With the default 1-D layout
    the data axis spans hosts — gradient psums ride ICI within a slice and
    DCN across slices (the scaling-book DP recipe)."""
    from ot_vae_tpu.parallel.mesh import make_mesh

    return make_mesh(jax.devices(), axis_names, shape)


def per_host_slice(n: int) -> slice:
    """The [start, stop) range of a length-``n`` global dataset this process
    should load (the DistributedSampler equivalent: contiguous per-host
    shards, same length everywhere — ragged tails dropped)."""
    per = n // jax.process_count()
    start = jax.process_index() * per
    return slice(start, start + per)


def host_local_batch_to_global(mesh, batch):
    """Assemble per-host numpy batches into one global jax.Array whose batch
    axis is sharded over the mesh's ``data`` axis.

    Each process passes ONLY its local rows (shape [B/num_processes, ...]);
    the result behaves as the full [B, ...] array for jit/GSPMD without any
    host ever materializing the global batch (reference equivalent: each DDP
    rank reads its DistributedSampler shard)."""
    from jax.experimental import multihost_utils
    from jax.sharding import PartitionSpec as P

    def put(x):
        x = np.asarray(x)
        spec = P("data", *([None] * (x.ndim - 1)))
        return multihost_utils.host_local_array_to_global_array(x, mesh, spec)

    return jax.tree_util.tree_map(put, batch)


class ProcessComm:
    """Host-side cross-process reduction for metric states and other
    outside-jit pytrees (plugs into ``Trainer(metric_comm=...)`` and
    ``Metric.reduce``). Uses ``multihost_utils.process_allgather`` — a no-op
    reduction when single-process."""

    def _gather(self, x):
        from jax.experimental import multihost_utils

        return multihost_utils.process_allgather(x)  # [P, ...]

    def psum(self, x):
        if jax.process_count() == 1:
            return x
        return jax.tree_util.tree_map(lambda t: self._gather(t).sum(0), x)

    def pmin(self, x):
        if jax.process_count() == 1:
            return x
        return jax.tree_util.tree_map(lambda t: self._gather(t).min(0), x)

    def pmax(self, x):
        if jax.process_count() == 1:
            return x
        return jax.tree_util.tree_map(lambda t: self._gather(t).max(0), x)

    def all_gather(self, x):
        if jax.process_count() == 1:
            return x
        return jax.tree_util.tree_map(
            lambda t: np.concatenate(list(self._gather(t)), axis=0), x
        )

    @property
    def axis_size(self) -> int:
        return jax.process_count()
