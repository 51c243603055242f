"""Interleaved v2/xla/v1 comparison at the bench shape (Nh=8192) and the
tile-aligned shape (Nh=8448), 3 rounds each to control chip drift."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

LOG = open("/root/repo/tools/profile_pl5.out", "a", buffering=1)
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
for n, label in ((1 << 22, "Nh=8192(bench)"), (8448 * 512, "Nh=8448(tile)")):
    x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
    for rnd in range(3):
        for mode in (False, True, "v1"):
            m = timeit(x, n, mode)
            say(label, "round", rnd, {False: "xla", True: "v2",
                                      "v1": "v1"}[mode], round(m, 1), "Msps")
