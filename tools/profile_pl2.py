"""Fused kernel tile_h sweep at M=1024 in-pipeline."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.dsp import channelizer as chz
from amps_tpu.pallas.rx_front_kernel import analyze_demod_pallas

OUT = open("/root/repo/tools/profile_pl2.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def timeit(fn, *a, iters=128):
    r = fn(*a); float(jnp.sum(jnp.asarray(r[0], jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    float(jnp.sum(jnp.asarray(r[0], jnp.float32)))
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
rng = np.random.default_rng(0)
M, T = 1024, 8
P = M // 2
n = 1 << 22
Nh = n // P
n_ext = (Nh + 2 * T - 1) * P
x = jnp.asarray(rng.normal(0, 0.1, (n_ext, 2)).astype(np.float32))
import functools
for th in (128, 256, 512):
    fn = jax.jit(functools.partial(analyze_demod_pallas, M=M, T=T,
                                   tile_h=th))
    emit(event="compile_attempt", tile_h=th)
    dt = timeit(fn, x)
    emit(event="fused", tile_h=th, ms=dt * 1e3, msps=n / dt / 1e6)
emit(event="done")
