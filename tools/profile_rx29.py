"""Interleaved A/B of transform_bf16 at the bench config (M=1024):
adopted in r2 on a +4% single-session measurement; rx28's fresh stage
table shows analyze at 1.26 ms (64% of the pipeline), so re-measure
both the full pipeline and the analyze stage alone, interleaved."""
import json, statistics, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.dsp import channelizer as chz
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

OUT = open("/root/repo/tools/profile_rx29.out", "a", buffering=1)
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

variants = {}
for tb in (True, False):
    spec = MultichannelSpec(num_channels=1024, taps_per_phase=8,
                            fold="bank", io_bf16=True, corr_bf16=True,
                            transform_bf16=tb)
    variants[f"full_tb{int(tb)}"] = (
        lambda xb, s=spec: rx_multichannel_block(xb, s, max_bursts=2))
    def ana(xb, s=spec):
        ypl, _ = chz.analyze(xb, s.chz_spec, chz.analyzer_init(s.chz_spec),
                             chmajor=True, bf16=s.transform_bf16,
                             split=s.transform_split, fold=s.fold,
                             planar=True)
        return ypl
    variants[f"ana_tb{int(tb)}"] = jax.jit(ana)

for name, fn in variants.items():
    sync(fn(x))
rounds = {k: [] for k in variants}
for r in range(5):
    for name, fn in variants.items():
        dt = timeit(fn, x)
        rounds[name].append(round(n / dt / 1e6, 1))
for name, vals in rounds.items():
    emit(event="ab", variant=name, rounds=vals,
         median=round(statistics.median(vals), 1))
emit(event="done")
