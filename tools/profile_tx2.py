"""TX-side throughput: word pairs -> superframe symbols -> FSK baseband
-> synthesis channelizer -> wideband.  First TPU numbers for the TX path
(ROADMAP 'Planar riq on the TX side': measure before restructuring).

Reports wideband Msamples/s produced per chip for M = 1024/256/128 banks,
plus a stage split (frames+mod vs synthesis) to aim any optimization.
"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, tx_multichannel_block
from amps_tpu.tx.focc import focc_frames_symbols, superframe_word_pairs
from amps_tpu.dsp.fm import fm_modulate_symbols
from amps_tpu.dsp import channelizer as chz

OUT = open("/root/repo/tools/profile_tx2.out", "a", buffering=1)
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
F = 2  # frames per channel per block
for M in (1024, 256, 128):
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank")
    sps = spec.chan_sps
    pairs = superframe_word_pairs()[:F]
    wp = jnp.asarray(np.broadcast_to(pairs, (M,) + pairs.shape).copy())
    n_out = F * 463 * 2 * sps * (M // 2)

    full = jax.jit(lambda w: tx_multichannel_block(w, spec))
    dt = timeit(full, wp)
    emit(event="tx_full", M=M, ms=dt*1e3, msps=n_out/dt/1e6)

    # stage split: bits+templated mod only (the new fused path)
    from amps_tpu.tx.focc import focc_frame_bits
    from amps_tpu.dsp.fm import fsk_manchester_baseband
    sens = 2.0 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
    mod = jax.jit(lambda w: fsk_manchester_baseband(
        focc_frame_bits(w), sps, sens)[0])
    dtm = timeit(mod, wp)
    emit(event="tx_mod", M=M, ms=dtm*1e3)

    # synthesis only (from a prebuilt baseband)
    bb = mod(wp); sync(bb)
    Y = jnp.swapaxes(bb, 0, 1)
    st0 = chz.synthesizer_init(spec.chz_spec)
    syn = jax.jit(lambda y: chz.synthesize(y, spec.chz_spec, st0)[0])
    dts = timeit(syn, Y)
    emit(event="tx_syn", M=M, ms=dts*1e3, msps=n_out/dts/1e6)
emit(event="done")
