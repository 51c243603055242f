"""TX after one-hot frame bits: stage marginals + full, M=1024/256."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, tx_multichannel_block
from amps_tpu.tx.focc import focc_frame_bits

OUT = open("/root/repo/tools/profile_tx9.out", "a", buffering=1)
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
rng = np.random.default_rng(0)
for M in (1024, 256):
    F = 3
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8)
    wp = jnp.asarray(rng.integers(0, 2, (M, F, 2, 28)).astype(np.uint8))
    nwide = F * 463 * 2 * spec.chan_sps * (M // 2)
    bits_fn = jax.jit(focc_frame_bits)
    dt = timeit(bits_fn, wp)
    emit(event="bits_only", M=M, ms=dt * 1e3)
    tx = jax.jit(functools.partial(tx_multichannel_block, spec=spec))
    dt = timeit(tx, wp)
    emit(event="tx_full", M=M, ms=dt * 1e3, msps=nwide / dt / 1e6)
emit(event="done")
