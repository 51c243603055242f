"""Device-mesh construction helpers."""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


@dataclasses.dataclass(frozen=True)
class MeshSpec:
    time: int = 1
    chan: int = 1

    @property
    def size(self) -> int:
        return self.time * self.chan


def make_mesh(spec: Optional[MeshSpec] = None,
              devices: Optional[Sequence] = None) -> Mesh:
    """('time', 'chan') mesh over the given (or all) devices.

    With neither spec nor devices, uses every visible device on the time
    axis (sequence-parallel streaming is the axis that always scales:
    channels are bounded by the band plan, time is not).
    """
    devices = list(devices if devices is not None else jax.devices())
    if spec is None:
        spec = MeshSpec(time=len(devices), chan=1)
    assert spec.size == len(devices), (spec, len(devices))
    arr = np.array(devices).reshape(spec.time, spec.chan)
    return Mesh(arr, ("time", "chan"))


def time_sharding(mesh: Mesh, rank: int = 2) -> NamedSharding:
    """Shard the leading (time/sample) axis; replicate the rest."""
    return NamedSharding(mesh, P("time", *([None] * (rank - 1))))


def chan_sharding(mesh: Mesh, axis: int, rank: int) -> NamedSharding:
    spec = [None] * rank
    spec[axis] = "chan"
    return NamedSharding(mesh, P(*spec))
