"""CORR_BLOCK sweep: find_bursts marginal inside the fused pipeline
(analyze+demod+find, no extract/decode) at the bench config."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.rx import correlator

OUT = open("/root/repo/tools/profile_corr.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=24):
    r = fn(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
rng = np.random.default_rng(0)
n = 1 << 22
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank")

@functools.partial(jax.jit, static_argnames=("ob", "with_find"))
def rx_find(xb, ob: int, with_find: bool = True):
    ypl, _ = chz.analyze(xb, spec.chz_spec, chz.analyzer_init(spec.chz_spec),
                         chmajor=True, split=chz.default_split(1024),
                         fold="bank", planar=True)
    demod, _ = quadrature_demod_planar(ypl[0], ypl[1])
    if not with_find:
        return demod
    return correlator.find_bursts(demod, spec.chan_sps, 2, 0.55,
                                  corr_block=ob)

dt0 = timeit(lambda xb: rx_find(xb, 512, with_find=False), x)
emit(event="base_no_find", ms=dt0*1e3)
for ob in (512, 256, 128, 64, 512):
    dt = timeit(lambda xb, o=ob: rx_find(xb, o), x)
    emit(event="find", corr_block=ob, ms=dt*1e3,
         marginal_ms=(dt-dt0)*1e3, msps=n/dt/1e6)
emit(event="done")
