"""Synthesis transform split sweep (ROADMAP TX item): dense vs two-stage
Cooley-Tukey vs bf16, at the bench config, plus full TX."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, tx_multichannel_block
from amps_tpu.tx.focc import superframe_word_pairs, focc_frame_bits
from amps_tpu.dsp.fm import fsk_manchester_baseband
from amps_tpu.dsp import channelizer as chz

OUT = open("/root/repo/tools/profile_tx3.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=12):
    r = fn(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
F = 2
for M in (1024, 256):
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank")
    sps = spec.chan_sps
    pairs = superframe_word_pairs()[:F]
    wp = jnp.asarray(np.broadcast_to(pairs, (M,) + pairs.shape).copy())
    n_out = F * 463 * 2 * sps * (M // 2)
    sens = 2.0 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
    mod = jax.jit(lambda w: fsk_manchester_baseband(
        focc_frame_bits(w), sps, sens)[0])
    bb = mod(wp); sync(bb)
    Y = jnp.swapaxes(bb, 0, 1)
    st0 = chz.synthesizer_init(spec.chz_spec)
    for split in (0, 128):
        if split and M % 128:
            continue
        for bf16 in (False, True):
            syn = jax.jit(lambda y, s=split, b=bf16: chz.synthesize(
                y, spec.chz_spec, st0, bf16=b, split=s)[0])
            dts = timeit(syn, Y)
            emit(event="tx_syn", M=M, split=split, bf16=bf16,
                 ms=dts*1e3, msps=n_out/dts/1e6)
    full = jax.jit(lambda w: tx_multichannel_block(w, spec))
    dt = timeit(full, wp)
    emit(event="tx_full", M=M, ms=dt*1e3, msps=n_out/dt/1e6)
emit(event="done")
