"""Attribute the r3 bench delta (2208 -> ~1920 Msps): in ONE process,
interleave (a) the bench RX config as-is (trigger gate 6 + repeat gate 6
+ per-burst rssi), (b) the same spec with both gates disabled, and
(c) the unchanged TX path as a pure session-drift reference (TX code is
untouched since bench_r2a measured 3042 Msps — any TX delta is drift,
not code).  Chip drift rule: only interleaved same-process comparisons
are meaningful (CLAUDE.md).
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from amps_tpu.parallel.pipeline import (MultichannelSpec,
                                        rx_multichannel_block,
                                        tx_multichannel_block)
import functools

OUT = open("/root/repo/tools/profile_gate_cost.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)

n = 1 << 22
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
base = dict(num_channels=1024, taps_per_phase=8, fold="bank",
            io_bf16=True, corr_bf16=True, transform_bf16=True)
spec_on = MultichannelSpec(**base)
spec_off = MultichannelSpec(**base, max_trigger_errors=-1, repeat_gate=-1)
spec_trig = MultichannelSpec(**base, repeat_gate=-1)
spec_rep = MultichannelSpec(**base, max_trigger_errors=-1)

wp = jnp.asarray(rng.integers(0, 2, (1024, 3, 2, 28)).astype(np.uint8))
ntx = 3 * 463 * 2 * 3 * 512
tx_spec = MultichannelSpec(num_channels=1024, taps_per_phase=8)
run_tx = jax.jit(functools.partial(tx_multichannel_block, spec=tx_spec))


def rx_runner(spec):
    def run():
        return rx_multichannel_block(x, spec, max_bursts=2)["quality"]
    return run


variants = [("rx_gates_on", rx_runner(spec_on), n),
            ("rx_trig_only", rx_runner(spec_trig), n),
            ("rx_repeat_only", rx_runner(spec_rep), n),
            ("rx_gates_off", rx_runner(spec_off), n),
            ("tx_ref", lambda: run_tx(wp), ntx)]

emit(event="start", device=str(jax.devices()[0]), iters=64)
for name, run, _ in variants:
    t0 = time.perf_counter()
    float(jnp.sum(run()))
    emit(event="compiled", variant=name, s=round(time.perf_counter() - t0, 1))

R, ITERS = 4, 64
acc = {name: [] for name, _, _ in variants}
for r in range(R):
    for name, run, nn in variants:
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = run()
        float(jnp.sum(out))
        acc[name].append(nn * ITERS / (time.perf_counter() - t0) / 1e6)
for name, _, _ in variants:
    v = acc[name]
    emit(event="msps", variant=name, rounds=[round(u, 1) for u in v],
         median=round(float(np.median(v)), 1))
emit(event="done")
