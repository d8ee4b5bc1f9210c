"""Parallelism: comm seam + mesh/sharding helpers
(reference seam: DDPMixin, ot_vae_lightning/utils/__init__.py:21-46)."""
from ot_vae_tpu.parallel.comm import NO_COMM, AxisComm, Comm, NoComm
from ot_vae_tpu.parallel.mesh import (
    DATA_AXIS,
    data_sharding,
    make_mesh,
    replicated,
    shard_batch,
)

__all__ = [
    "Comm",
    "NoComm",
    "AxisComm",
    "NO_COMM",
    "DATA_AXIS",
    "make_mesh",
    "data_sharding",
    "replicated",
    "shard_batch",
]
