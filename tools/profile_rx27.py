"""transform_bf16 at the bench config: does halving the analysis
transform's operand bytes help now that decode/extract are lean?"""
import functools, json, sys, time
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
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
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
for M in (1024, 256):
    for tbf in (False, True):
        spec = MultichannelSpec(num_channels=M, taps_per_phase=8,
                                fold="bank", io_bf16=True, corr_bf16=True,
                                transform_bf16=tbf)
        fn = jax.jit(functools.partial(rx_multichannel_block, spec=spec,
                                       max_bursts=2))
        dt = timeit(fn, x)
        emit(M=M, transform_bf16=tbf, ms=round(dt*1e3, 3),
             msps=round(n/dt/1e6, 1))
