"""Collective-communication seam.

TPU-native replacement for the reference's ``DDPMixin``
(reference: ot_vae_lightning/utils/__init__.py:21-46), which injects
all-reduce / all-gather callables bound to torch.distributed. Here the seam is
a tiny protocol over mesh-axis collectives:

* ``NO_COMM`` — identity; single-device or GSPMD-jit contexts, where XLA
  inserts the collectives automatically from sharding annotations.
* ``AxisComm("data")`` — explicit ``lax.psum``/``lax.all_gather`` over a named
  mesh axis; for use inside ``shard_map``/``pmap`` bodies where collectives
  are spelled out (streaming-statistic reduction, metric sync).

Every reference call-site family hangs off this seam (SURVEY §2.2):
gradient reduction, distribution-model statistic reduction, transport-operator
sample gather, per-class EMA prior reduction, metric sync.
"""
from __future__ import annotations

import dataclasses
from typing import Protocol, runtime_checkable

import jax
from jax import lax


@runtime_checkable
class Comm(Protocol):
    """All-reduce / all-gather protocol over the data-parallel axis."""

    def psum(self, x):
        ...

    def all_gather(self, x):
        ...

    @property
    def axis_size(self) -> int:
        ...


@dataclasses.dataclass(frozen=True)
class NoComm:
    """Identity comm — single device, or GSPMD-jit where XLA handles it."""

    def psum(self, x):
        return x

    def pmin(self, x):
        return x

    def pmax(self, x):
        return x

    def all_gather(self, x):
        return x

    @property
    def axis_size(self) -> int:
        return 1


@dataclasses.dataclass(frozen=True)
class AxisComm:
    """Collectives over a named mesh axis (inside shard_map/pmap).

    ``all_gather`` concatenates along ``gather_axis`` (the reference gathers a
    list then ``torch.cat(dim=-2)``, ot_vae_lightning/ot/transport/base.py:139).
    """

    axis: str
    gather_axis: int = -2

    def psum(self, x):
        return jax.tree_util.tree_map(lambda t: lax.psum(t, self.axis), x)

    def pmin(self, x):
        return jax.tree_util.tree_map(lambda t: lax.pmin(t, self.axis), x)

    def pmax(self, x):
        return jax.tree_util.tree_map(lambda t: lax.pmax(t, self.axis), x)

    def all_gather(self, x):
        return jax.tree_util.tree_map(
            lambda t: lax.all_gather(t, self.axis, axis=self.gather_axis, tiled=True),
            x,
        )

    @property
    def axis_size(self) -> int:
        return lax.axis_size(self.axis)


NO_COMM = NoComm()
