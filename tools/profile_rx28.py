"""Block-size sweep for the XLA headline path + batched small banks."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

LOG = open("/root/repo/tools/profile_rx28.out", "a", buffering=1)
def say(*a):
    s = " ".join(str(x) for x in a)
    LOG.write(s + "\n"); print(s, flush=True)

from amps_tpu.parallel.pipeline import (MultichannelSpec,
    rx_multichannel_block, rx_multichannel_block_batched)

spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True, transform_bf16=True)
say("device:", jax.devices()[0])
rng = np.random.default_rng(0)

def timeit(x, n, iters):
    def run(xb):
        return rx_multichannel_block(xb, spec, max_bursts=2)["quality"]
    q = run(x); float(jnp.sum(q))
    t0 = time.perf_counter()
    for _ in range(iters):
        q = run(x)
    float(jnp.sum(q))
    return n * iters / (time.perf_counter() - t0) / 1e6

for rnd in range(2):
    for p2 in (21, 22, 23, 24):
        n = 1 << p2
        iters = max(16, (1 << 22) * 128 // n)
        x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
        say("xla n=2^%d" % p2, "round", rnd, round(timeit(x, n, iters), 1),
            "Msps", "iters", iters)

spec128 = MultichannelSpec(num_channels=128, taps_per_phase=8, fold="bank",
                           io_bf16=True, corr_bf16=True)
def timeit_b(xs, total, iters=128):
    def run(xb):
        return rx_multichannel_block_batched(xb, spec128,
                                             max_bursts=2)["quality"]
    q = run(xs); float(jnp.sum(q))
    t0 = time.perf_counter()
    for _ in range(iters):
        q = run(xs)
    float(jnp.sum(q))
    return total * iters / (time.perf_counter() - t0) / 1e6

for g in (4, 8, 16):
    n = (1 << 22) // g
    xs = jnp.asarray(rng.normal(0, 0.1, (g, n, 2)).astype(np.float32))
    say("m128 batched g=%d" % g, round(timeit_b(xs, g * n), 1), "Msps")
say("done")
