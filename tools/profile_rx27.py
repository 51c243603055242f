"""Cost of majority-vote decode in-pipeline (M=1024)."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

OUT = open("/root/repo/tools/profile_rx27.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    return float(jnp.sum(jnp.asarray(r, jnp.float32)))
def timeit(fn, *a, iters=128):
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
spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
for pol in ("first_ok", "majority"):
    def full(xb, p=pol):
        return rx_multichannel_block(xb, spec, max_bursts=2,
                                     policy=p)["quality"]
    dt = timeit(full, x)
    emit(event="rx_full", policy=pol, ms=dt * 1e3, msps=n / dt / 1e6)
emit(event="done")
