"""Round-11: decode-stage share at M=1024 bank + block-size scaling
(fixed ~2 ms dispatch overhead suggests bigger blocks buy throughput)."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block
from amps_tpu.rx import decoder

OUT = open("/root/repo/tools/profile_rx11.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=12):
    r = fn(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
rng = np.random.default_rng(0)

# decode alone at the bench shape
hard = jnp.asarray(rng.integers(0, 2, (1024, 2, 3374)).astype(np.uint8))
dt = timeit(lambda h: decoder.decode_bursts(h), hard)
emit(event="decode_alone", shape=list(hard.shape), ms=dt*1e3)

# block-size scaling at the bench config
spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank")
for nlog in (22, 23, 24):
    n = 1 << nlog
    x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
    iters = max(4, 48 >> (nlog - 22))
    dt = timeit(lambda xb: rx_multichannel_block(xb, spec, max_bursts=2),
                x, iters=iters)
    emit(event="pipeline", n=n, ms=dt*1e3, msps=n/dt/1e6)
emit(event="done")
