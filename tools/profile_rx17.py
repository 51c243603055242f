"""Measure the unrolled-NMS find + select-then-correct decode rework and
the opt-in bf16 correlation plane, at deep queue (96 iters), M=1024 with
the bench config (fold=bank, io_bf16).  Stages + bench-style full calls."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.rx import correlator, decoder

OUT = open("/root/repo/tools/profile_rx17.out", "a", buffering=1)
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
M = 1024

for corr_bf16 in (False, True):
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank",
                            io_bf16=True, corr_bf16=corr_bf16)
    sps = spec.chan_sps
    split = chz.default_split(M)

    @functools.partial(jax.jit, static_argnames=("upto",))
    def rx_upto(xb, upto: int):
        ypl, _ = chz.analyze(xb, spec.chz_spec,
                             chz.analyzer_init(spec.chz_spec),
                             chmajor=True, split=split, fold="bank",
                             planar=True)
        ypl = ypl.astype(jnp.bfloat16)
        demod, _ = quadrature_demod_planar(ypl[0], ypl[1])
        demod = demod.astype(jnp.bfloat16)
        if upto == 0:
            return demod
        phases = correlator.symbol_phase_streams(demod, sps)
        if upto == 1:
            return phases
        starts, valid, quality = correlator.find_bursts_phases(
            phases, sps, 2, 0.55, out_bf16=corr_bf16)
        if upto == 2:
            return quality
        hard, soft = correlator.extract_from_phases(phases, starts, sps)
        if upto == 3:
            return hard
        dec = decoder.decode_bursts(hard)
        return dec.words

    prev = 0.0
    names = ["demod", "phases", "find", "extract", "decode"]
    for u in range(5):
        dt = timeit(lambda xb, uu=u: rx_upto(xb, uu), x)
        emit(event="stage", corr_bf16=corr_bf16, upto=names[u], ms=dt*1e3,
             marginal_ms=(dt-prev)*1e3, msps=n/dt/1e6)
        prev = dt

    def bench_style(xb):
        return rx_multichannel_block(xb, spec, max_bursts=2)["quality"]

    dt = timeit(bench_style, x)
    emit(event="rx_full_bench_style", corr_bf16=corr_bf16,
         ms=dt*1e3, msps=n/dt/1e6)

# 256-channel bank for the bench's secondary numbers
for corr_bf16 in (False, True):
    spec = MultichannelSpec(num_channels=256, taps_per_phase=8, fold="bank",
                            io_bf16=True, corr_bf16=corr_bf16)
    def bench_style(xb):
        return rx_multichannel_block(xb, spec, max_bursts=2)["quality"]
    dt = timeit(bench_style, x)
    emit(event="rx_full_256", corr_bf16=corr_bf16, ms=dt*1e3, msps=n/dt/1e6)

emit(event="done")
