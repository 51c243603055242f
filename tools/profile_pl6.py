"""Interleaved xla/v1/v2 at the tile-aligned shape (Nh=8448, all cached)
and xla/v1 at the bench shape (Nh=8192) — the drift-controlled decision
data for which front end is the default (v2@8192 skipped: its padded
variant hits the Mosaic scoped-VMEM compile OOM, see pl5)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

LOG = open("/root/repo/tools/profile_pl6.out", "a", buffering=1)
def say(*a):
    s = " ".join(str(x) for x in a)
    LOG.write(s + "\n"); print(s, flush=True)

from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True, transform_bf16=True)
say("device:", jax.devices()[0])

def timeit(x, n, use_pallas, iters=128):
    def run(xb):
        return rx_multichannel_block(xb, spec, max_bursts=2,
                                     use_pallas=use_pallas)["quality"]
    q = run(x); float(jnp.sum(q))
    t0 = time.perf_counter()
    for _ in range(iters):
        q = run(x)
    float(jnp.sum(q))
    return n * iters / (time.perf_counter() - t0) / 1e6

rng = np.random.default_rng(0)
n1 = 8448 * 512
x1 = jnp.asarray(rng.normal(0, 0.1, (n1, 2)).astype(np.float32))
n2 = 1 << 22
x2 = jnp.asarray(rng.normal(0, 0.1, (n2, 2)).astype(np.float32))
names = {False: "xla", True: "v2", "v1": "v1"}
for rnd in range(3):
    for mode in (False, "v1", True):
        m = timeit(x1, n1, mode)
        say("Nh=8448", "round", rnd, names[mode], round(m, 1), "Msps")
for rnd in range(3):
    for mode in (False, "v1"):
        m = timeit(x2, n2, mode)
        say("Nh=8192", "round", rnd, names[mode], round(m, 1), "Msps")
say("done")
