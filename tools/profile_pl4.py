"""v2 phases kernel on the REAL chip: compile, validate vs XLA path,
time in-pipeline at M=1024 (VERDICT r1 item 4 / ROADMAP item 1)."""
import sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

LOG = open("/root/repo/tools/profile_pl4.out", "a", buffering=1)
def say(*a):
    s = " ".join(str(x) for x in a)
    LOG.write(s + "\n"); print(s, flush=True)

say("device:", jax.devices()[0])

from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True, transform_bf16=True)
n = 8448 * 512          # Nh = 8448 = 22*384: tile-aligned, no pad
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))

say("compiling v2 kernel path...")
t0 = time.time()
out2 = rx_multichannel_block(x, spec, max_bursts=2, use_pallas=True)
q2 = np.asarray(out2["quality"]); say("v2 compiled+ran in", round(time.time()-t0, 1), "s")
t0 = time.time()
out0 = rx_multichannel_block(x, spec, max_bursts=2, use_pallas=False)
q0 = np.asarray(out0["quality"]); say("xla ran in", round(time.time()-t0, 1), "s")

# numerics: same quality field on noise (no bursts) within bf16 slack
say("quality max v2/xla:", float(q2.max()), float(q0.max()),
    "meandiff:", float(np.abs(q2 - q0).mean()))

def timeit(use_pallas, iters=128):
    def run(xb):
        return rx_multichannel_block(xb, spec, max_bursts=2,
                                     use_pallas=use_pallas)["quality"]
    q = run(x); float(jnp.sum(q))
    t0 = time.perf_counter()
    for _ in range(iters):
        q = run(x)
    float(jnp.sum(q))
    return n * iters / (time.perf_counter() - t0) / 1e6

m_v2 = timeit(True)
say("v2 in-pipeline:", round(m_v2, 1), "Msps")
m_x = timeit(False)
say("xla in-pipeline:", round(m_x, 1), "Msps")
m_v1 = timeit("v1")
say("v1 in-pipeline:", round(m_v1, 1), "Msps")
say("RESULT v2/xla ratio:", round(m_v2 / m_x, 4))
