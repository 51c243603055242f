"""Ablate the full-call vs stage-sum gap at M=1024 (io_bf16+corr_bf16):
which outputs cost what.  Each variant is the full pipeline with some
outputs dropped (DCE) or the power estimator swapped."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar, fast_atan2
from amps_tpu.rx import correlator, decoder

OUT = open("/root/repo/tools/profile_rx19.out", "a", buffering=1)
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
spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
sps = spec.chan_sps
split = chz.default_split(M)


@functools.partial(jax.jit, static_argnames=("variant",))
def rx_v(xb, variant: str):
    ypl, _ = chz.analyze(xb, spec.chz_spec, chz.analyzer_init(spec.chz_spec),
                         chmajor=True, split=split, fold="bank", planar=True)
    ypl = ypl.astype(jnp.bfloat16)
    yr, yi = ypl[0], ypl[1]
    if variant in ("pow_fused", "no_bad"):
        demod, _, chan_power = quadrature_demod_planar(yr, yi,
                                                       return_power=True)
    else:
        demod, _ = quadrature_demod_planar(yr, yi)
        if variant == "pow_full":
            chan_power = jnp.mean(yr.astype(jnp.float32) ** 2
                                  + yi.astype(jnp.float32) ** 2, axis=-1)
        elif variant == "pow_sub":
            chunk, sub = 128, 8
            g = yr.shape[-1] // chunk
            c = yr[..., : g * chunk].reshape(M, g, chunk)[:, ::sub, :]
            s = yi[..., : g * chunk].reshape(M, g, chunk)[:, ::sub, :]
            chan_power = jnp.mean(c.astype(jnp.float32) ** 2
                                  + s.astype(jnp.float32) ** 2, axis=(-2, -1))
        else:
            chan_power = None
    demod = demod.astype(jnp.bfloat16)
    phases = correlator.symbol_phase_streams(demod, sps)
    starts, valid, quality = correlator.find_bursts_phases(
        phases, sps, 2, 0.55, out_bf16=True)
    hard, soft = correlator.extract_from_phases(phases, starts, sps)
    dec = decoder.decode_bursts(hard)
    out = {"starts": starts, "valid": valid, "quality": quality,
           "words": dec.words, "word_ok": dec.word_ok}
    if variant == "words_only":
        return {"words": dec.words, "quality": quality}
    if variant not in ("no_bad",):
        out["dcc_bits"] = dec.dcc_bits
        out["bad_symbols"] = dec.bad_symbols
    if chan_power is not None:
        out["chan_power"] = chan_power
    return out

for v in ("pow_fused", "none", "pow_full", "pow_sub", "no_bad",
          "words_only"):
    dt = timeit(lambda xb, vv=v: rx_v(xb, vv), x)
    emit(event="variant", variant=v, ms=dt*1e3, msps=n/dt/1e6)
emit(event="done")
