"""Flat vs batch decode layout inside the fused RX pipeline (same
session, bench config)."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.rx import correlator, decoder

OUT = open("/root/repo/tools/profile_dec3.out", "a", buffering=1)
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

@functools.partial(jax.jit, static_argnames=("layout",))
def rx_full(xb, layout: str):
    ypl, _ = chz.analyze(xb, spec.chz_spec, chz.analyzer_init(spec.chz_spec),
                         chmajor=True, split=chz.default_split(1024),
                         fold="bank", planar=True)
    demod, _ = quadrature_demod_planar(ypl[0], ypl[1])
    sps = spec.chan_sps
    pad = jnp.zeros(demod.shape[:-1]
                    + (correlator.CAPTURE_SYMBOLS * sps,), demod.dtype)
    demod_p = jnp.concatenate([demod, pad], axis=-1)
    starts, valid, quality = correlator.find_bursts(demod, sps, 2, 0.55)
    hard, _ = correlator.extract_bursts_batched(demod_p, starts, sps)
    dec = decoder.decode_bursts(hard, layout=layout)
    chan_power = jnp.mean(ypl[0]**2 + ypl[1]**2, axis=-1)
    return starts, valid, quality, dec.words, dec.word_ok, chan_power

for layout in ("batch", "flat", "batch", "flat"):
    dt = timeit(lambda xb, l=layout: rx_full(xb, l), x)
    emit(event="pipeline", layout=layout, ms=dt*1e3, msps=n/dt/1e6)
emit(event="done")
