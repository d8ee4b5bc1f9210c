"""Parallelism: comm seam + mesh/sharding helpers
(reference seam: DDPMixin, ot_vae_lightning/utils/__init__.py:21-46)."""
from ot_vae_tpu.parallel.comm import NO_COMM, AxisComm, Comm, NoComm
from ot_vae_tpu.parallel.mesh import (
    DATA_AXIS,
    data_sharding,
    make_mesh,
    put_replicated,
    replicated,
    shard_batch,
    spans_processes,
)
from ot_vae_tpu.parallel.partitioning import (
    MODEL_AXIS,
    partition_params,
    partition_spec_for,
)
from ot_vae_tpu.parallel.multihost import (
    ProcessComm,
    global_mesh,
    host_local_batch_to_global,
    initialize_distributed,
    per_host_slice,
)

__all__ = [
    "ProcessComm",
    "global_mesh",
    "host_local_batch_to_global",
    "initialize_distributed",
    "per_host_slice",
    "Comm",
    "NoComm",
    "AxisComm",
    "NO_COMM",
    "DATA_AXIS",
    "MODEL_AXIS",
    "make_mesh",
    "put_replicated",
    "data_sharding",
    "replicated",
    "shard_batch",
    "spans_processes",
    "partition_params",
    "partition_spec_for",
]
