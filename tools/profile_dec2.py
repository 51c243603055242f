"""In-pipeline decode marginal (same-session A/B): full RX pipeline vs
pipeline stopping after extraction, at the bench config."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.rx import correlator, decoder

OUT = open("/root/repo/tools/profile_dec2.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=16):
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

import functools
@functools.partial(jax.jit, static_argnames=("stage",))
def rx_partial(xb, stage: str):
    ypl, _ = chz.analyze(xb, spec.chz_spec, chz.analyzer_init(spec.chz_spec),
                         chmajor=True, split=chz.default_split(1024),
                         fold="bank", planar=True)
    if stage == "analyze":
        return ypl
    demod, _ = quadrature_demod_planar(ypl[0], ypl[1])
    if stage == "demod":
        return demod
    sps = spec.chan_sps
    pad = jnp.zeros(demod.shape[:-1]
                    + (correlator.CAPTURE_SYMBOLS * sps,), demod.dtype)
    demod_p = jnp.concatenate([demod, pad], axis=-1)
    starts, valid, quality = correlator.find_bursts(demod, sps, 2, 0.55)
    if stage == "find":
        return starts, valid, quality
    hard, soft = correlator.extract_bursts_batched(demod_p, starts, sps)
    if stage == "extract":
        return hard
    dec = decoder.decode_bursts(hard)
    return dec.words, dec.word_ok

for stage in ("analyze", "demod", "find", "extract", "decode"):
    dt = timeit(lambda xb, s=stage: rx_partial(xb, s), x)
    emit(event="stage_cum", stage=stage, ms=dt*1e3, msps=n/dt/1e6)
dt = timeit(lambda xb: rx_multichannel_block(xb, spec, max_bursts=2), x)
emit(event="pipeline_ref", ms=dt*1e3, msps=n/dt/1e6)
emit(event="done")
