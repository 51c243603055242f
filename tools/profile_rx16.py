"""io_bf16 data plane vs f32, bench config, deep queue (96 iters)."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

OUT = open("/root/repo/tools/profile_rx16.out", "a", buffering=1)
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
n = 1 << 22
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
for M in (1024, 256):
    for io16, t16 in ((False, False), (True, False), (True, True)):
        spec = MultichannelSpec(num_channels=M, taps_per_phase=8,
                                fold="bank", io_bf16=io16,
                                transform_bf16=t16)
        dt = timeit(lambda xb, s=spec: rx_multichannel_block(
            xb, s, max_bursts=2)["quality"], x)
        emit(event="rx", M=M, io_bf16=io16, transform_bf16=t16,
             ms=dt*1e3, msps=n/dt/1e6)
emit(event="done")
