"""A/B: fold="bank" (8 dots, each folded bank read twice) vs the new
fold="bankp" (4 paired einsums with (2M, P) constant column blocks —
each bank read ONCE, derotation absorbed, no data concat).  The bank
reads are the analyze stage's dominant HBM traffic; bank2 (single
matmul) lost to the data-concat copy, bankp has no such copy.
Interleaved, one process, full pipeline + analyze-only, M=1024/256."""
import json, statistics, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.dsp import channelizer as chz
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

OUT = open("/root/repo/tools/profile_rx31.out", "a", buffering=1)
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

for M in (1024, 256):
    variants = {}
    for fold in ("bank", "bankp"):
        spec = MultichannelSpec(num_channels=M, taps_per_phase=8,
                                fold=fold, io_bf16=True, corr_bf16=True,
                                transform_bf16=(M == 1024))
        variants[f"full_{fold}"] = (
            lambda xb, s=spec: rx_multichannel_block(xb, s, max_bursts=2))
        def ana(xb, s=spec):
            ypl, _ = chz.analyze(xb, s.chz_spec,
                                 chz.analyzer_init(s.chz_spec),
                                 chmajor=True, bf16=s.transform_bf16,
                                 split=s.transform_split, fold=s.fold,
                                 planar=True)
            return ypl
        variants[f"ana_{fold}"] = jax.jit(ana)
    for name, fn in variants.items():
        sync(fn(x))
    rounds = {k: [] for k in variants}
    for r in range(5):
        for name, fn in variants.items():
            dt = timeit(fn, x)
            rounds[name].append(round(n / dt / 1e6, 1))
    for name, vals in rounds.items():
        emit(event="ab", M=M, variant=name, rounds=vals,
             median=round(statistics.median(vals), 1))
emit(event="done")
