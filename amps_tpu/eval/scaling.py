"""Scaling-efficiency harness: samples/s of the sharded BS step vs mesh
size (the BASELINE.json ">=85% scaling 1 chip -> 1 host -> N hosts"
target).

On this single-chip environment real multi-chip numbers aren't
measurable; the harness runs on any mesh (the 8-virtual-device CPU mesh
in tests, a pod slice in production via parallel.distributed.global_mesh)
and reports weak-scaling efficiency: per-device throughput at size N
relative to size 1, with the workload scaled proportionally.

NB: virtual CPU devices share physical cores, so their "efficiency"
trivially degrades as 1/N (total throughput stays flat) — on the CPU
mesh this harness only validates that the sharded step runs at every
size; meaningful efficiency requires real chips.
"""

from __future__ import annotations

import time
from typing import Dict, Optional, Sequence

import numpy as np
import jax

from amps_tpu.parallel.mesh import make_mesh, MeshSpec
from amps_tpu.parallel.pipeline import MultichannelSpec, make_sharded_bs_step
from amps_tpu.tx.focc import superframe_word_pairs


def weak_scaling(sizes: Optional[Sequence[int]] = None,
                 spec: Optional[MultichannelSpec] = None,
                 frames_per_device: int = 2,
                 iters: int = 3) -> Dict[int, dict]:
    """Run the full sharded TX->RX step on time-meshes of the given
    sizes; workload (superframe count) scales with mesh size."""
    devices = jax.devices()
    if sizes is None:
        sizes = [s for s in (1, 2, 4, 8) if s <= len(devices)]
    spec = spec or MultichannelSpec(num_channels=8, taps_per_phase=4)
    out: Dict[int, dict] = {}
    for size in sizes:
        mesh = make_mesh(MeshSpec(time=size, chan=1), devices[:size])
        frames = frames_per_device * size
        n_hops = frames * 463 * 2 * spec.chan_sps
        while n_hops % size:
            frames += 1
            n_hops = frames * 463 * 2 * spec.chan_sps
        pairs = superframe_word_pairs()[:2]
        reps = -(-frames // 2)
        word_pairs = np.broadcast_to(
            np.tile(pairs, (reps, 1, 1))[:frames],
            (spec.num_channels, frames, 2, 28)).copy()
        step = make_sharded_bs_step(mesh, spec, demod_halo=32, max_bursts=1)
        res = step(word_pairs)
        jax.block_until_ready(res)
        _ = float(np.asarray(res[2]).sum())  # force sync
        t0 = time.perf_counter()
        for _ in range(iters):
            res = step(word_pairs)
        _ = float(np.asarray(res[2]).sum())
        dt = time.perf_counter() - t0
        wideband = n_hops * (spec.num_channels // 2)
        total_sps = wideband * iters / dt
        out[size] = {
            "devices": size,
            "wideband_samples": wideband,
            "samples_per_sec": total_sps,
            "per_device": total_sps / size,
        }
    base = out[min(out)]["per_device"]
    for size in out:
        out[size]["efficiency"] = out[size]["per_device"] / base
    return out
