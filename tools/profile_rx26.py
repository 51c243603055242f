"""Current stage marginals at the bench config (M=1024/256, fold=bank,
io_bf16, corr_bf16) after symbol-domain decode + DC slicing: cumulative
analyze / +demod / +phases / +find / +extract / +decode."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.rx import correlator, decoder
from amps_tpu.parallel.pipeline import MultichannelSpec

OUT = open("/root/repo/tools/profile_rx26.out", "a", buffering=1)
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

def build(spec, upto):
    M = spec.num_channels
    sps = spec.chan_sps
    def fn(xb):
        ypl, _ = chz.analyze(xb, spec.chz_spec,
                             chz.analyzer_init(spec.chz_spec),
                             chmajor=True, bf16=spec.transform_bf16,
                             split=spec.transform_split,
                             fold=spec.fold, planar=True)
        if spec.io_bf16:
            ypl = ypl.astype(jnp.bfloat16)
        if upto == "analyze":
            return ypl
        demod, _, chan_power = quadrature_demod_planar(
            ypl[0], ypl[1], return_power=True)
        if spec.io_bf16:
            demod = demod.astype(jnp.bfloat16)
        if upto == "demod":
            return demod
        phases = correlator.symbol_phase_streams(demod, sps)
        if upto == "phases":
            return phases
        starts, valid, quality = correlator.find_bursts_phases(
            phases, sps, 2, 0.55, out_bf16=spec.corr_bf16)
        if upto == "find":
            return starts, valid, quality
        hard, soft = correlator.extract_from_phases(
            phases, starts, sps,
            hard_dtype=jnp.bfloat16 if spec.io_bf16 else jnp.uint8)
        if upto == "extract":
            return starts, hard
        dec = decoder.decode_bursts(hard)
        return starts, valid, quality, dec.words, dec.word_ok
    return jax.jit(fn)

for M in (1024, 256):
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank",
                            io_bf16=True, corr_bf16=True)
    prev = 0.0
    for upto in ("analyze", "demod", "phases", "find", "extract", "full"):
        dt = timeit(build(spec, upto), x)
        emit(M=M, upto=upto, ms=round(dt * 1e3, 3),
             marginal_ms=round((dt - prev) * 1e3, 3),
             msps=round(n / dt / 1e6, 1))
        prev = dt
