"""Packed-LUT decode timing (96 iters) + bench-style full RX."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.rx import decoder
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

OUT = open("/root/repo/tools/profile_dec5.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=96):
    r = fn(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
rng = np.random.default_rng(0)
hard = jnp.asarray(rng.integers(0, 2, (1024, 2, 3374)).astype(np.uint8))
dt = timeit(lambda s: decoder.decode_bursts(s).words, hard)
emit(event="decode_packed", ms=dt*1e3)
dt = timeit(lambda s: decoder.decode_bursts(s, policy="majority").words, hard)
emit(event="decode_packed_majority", ms=dt*1e3)

n = 1 << 22
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank")
dt = timeit(lambda xb: rx_multichannel_block(xb, spec, max_bursts=2)
            ["quality"], x)
emit(event="rx_full_bench_style", ms=dt*1e3, msps=n/dt/1e6)
emit(event="done")
