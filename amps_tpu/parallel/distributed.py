"""Multi-host distribution (DCN) helpers.

The reference is strictly single-process; multi-host operation is new
capability (SURVEY.md §2 parallelism table).  Topology: a global
('time', 'chan') mesh spanning all processes — ICI carries the
neighbor halos inside a slice, DCN carries the host-boundary halos and
the control plane (the TCP command server runs on process 0 only).

Validated three ways on this single-host environment: the sharded step
on the virtual 8-device CPU mesh (tests/test_parallel.py), the driver's
__graft_entry__.dryrun_multichip, and a REAL 2-process
jax.distributed run whose halo-exchange/psum collectives cross the
process boundary (tests/test_distributed.py — the DCN analogue).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax
from jax.sharding import Mesh

from amps_tpu.parallel.mesh import MeshSpec


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> None:
    """jax.distributed.initialize with env-var fallbacks (JAX reads
    COORDINATOR_ADDRESS / NUM_PROCESSES / PROCESS_ID when args None)."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def global_mesh(spec: Optional[MeshSpec] = None) -> Mesh:
    """('time', 'chan') mesh over ALL devices in the job (all hosts).

    Default: the time axis spans hosts (each host streams a contiguous
    time range; halos cross DCN only at host boundaries) and the chan
    axis spans the devices within a host (channel fan-out rides ICI).
    """
    devices = jax.devices()
    n_local = jax.local_device_count()
    n_proc = jax.process_count()
    if spec is None:
        spec = MeshSpec(time=n_proc, chan=n_local)
    assert spec.size == len(devices), (spec, len(devices))
    arr = np.array(devices).reshape(spec.time, spec.chan)
    return Mesh(arr, ("time", "chan"))


def is_coordinator() -> bool:
    return jax.process_index() == 0
