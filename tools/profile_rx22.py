"""Stage marginals after the decode-tail rework (M=1024, production
config), plus TX full-call rates at deep queue depth (128 iters)."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import (MultichannelSpec,
                                        rx_multichannel_block,
                                        tx_multichannel_block)
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.rx import correlator, decoder

OUT = open("/root/repo/tools/profile_rx22.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=128):
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
M = 1024
spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
sps = spec.chan_sps
split = chz.default_split(M)


@functools.partial(jax.jit, static_argnames=("upto",))
def rx_upto(xb, upto: str):
    ypl, _ = chz.analyze(xb, spec.chz_spec, chz.analyzer_init(spec.chz_spec),
                         chmajor=True, split=split, fold="bank", planar=True)
    ypl = ypl.astype(jnp.bfloat16)
    if upto == "analyze":
        return ypl
    demod, _, chan_power = quadrature_demod_planar(ypl[0], ypl[1],
                                                   return_power=True)
    demod = demod.astype(jnp.bfloat16)
    if upto == "demod":
        return demod
    phases = correlator.symbol_phase_streams(demod, sps)
    if upto == "phases":
        return phases
    starts, valid, quality = correlator.find_bursts_phases(
        phases, sps, 2, 0.55, out_bf16=True)
    if upto == "find":
        return quality
    hard, soft = correlator.extract_from_phases(phases, starts, sps)
    if upto == "extract":
        return hard
    dec = decoder.decode_bursts(hard)
    return dec.words


prev = None
for stage in ("analyze", "demod", "phases", "find", "extract", "decode"):
    dt = timeit(lambda xb, s=stage: rx_upto(xb, s), x)
    emit(event="stage", upto=stage, ms=dt * 1e3,
         marginal_ms=None if prev is None else (dt - prev) * 1e3,
         msps=n / dt / 1e6)
    prev = dt

# TX at deep queue: C=M channels, F frames -> n_wide = F*463*2*sps*M/2
F = 3
wp = jnp.asarray(rng.integers(0, 2, (M, F, 2, 28)).astype(np.uint8))
tx = jax.jit(lambda w: tx_multichannel_block(w, spec))
dt = timeit(tx, wp)
nwide = F * 463 * 2 * sps * (M // 2)
emit(event="tx_full", M=M, ms=dt * 1e3, msps=nwide / dt / 1e6)
emit(event="done")
