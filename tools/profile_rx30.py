"""Block-size sweep at the bench config (interleaved, one process):
the 2^22 bench block was chosen in r1; per-block fixed costs (selector
builds, small ops, scheduling) amortize further with bigger blocks.
Latency stays well inside the superframe deadline (2^23 samples =
273 ms of air vs the 0.83 s filler-injection envelope)."""
import json, statistics, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

OUT = open("/root/repo/tools/profile_rx30.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))

emit(event="start", device=str(jax.devices()[0]))
spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True, transform_bf16=True)
rng = np.random.default_rng(0)
sizes = [1 << 21, 1 << 22, 3 << 21, 1 << 23]
xs = {n: jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
      for n in sizes}
fns = {}
for n in sizes:
    fns[n] = lambda xb: rx_multichannel_block(xb, spec, max_bursts=2)
    sync(fns[n](xs[n]))          # compile+warm
rounds = {n: [] for n in sizes}
for r in range(5):
    for n in sizes:
        iters = max(24, (1 << 29) // n)   # equal samples per timing
        fn, x = fns[n], xs[n]
        sync(fn(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(x)
        sync(out)
        dt = (time.perf_counter() - t0) / iters
        rounds[n].append(round(n / dt / 1e6, 1))
for n, vals in rounds.items():
    emit(event="sweep", n=n, rounds=vals,
         median=round(statistics.median(vals), 1))
emit(event="done")
