"""TX stage marginals at deep queue (VERDICT r3 item 8: extend the
roofline accounting to TX).  Stages of tx_multichannel_block at the
bench config: framing (word pairs -> frame bits), +FSK baseband
(2-template LUT), full (+synthesis channelizer fold+transform+
overlap-add).  128 queued iters (dispatch amortization, CLAUDE.md).
"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fsk_manchester_baseband
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.tx.focc import focc_frame_bits

OUT = open("/root/repo/tools/profile_tx9.out", "a", buffering=1)
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
FRAMES = 3
for M in (1024, 256):
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8)
    sps = spec.chan_sps
    sens = 2.0 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
    rng = np.random.default_rng(0)
    wp = jnp.asarray(rng.integers(0, 2, (M, FRAMES, 2, 28))
                     .astype(np.uint8))
    nwide = FRAMES * 463 * 2 * sps * (M // 2)

    def build(upto):
        def fn(w):
            bits = focc_frame_bits(w)
            if upto == "bits":
                return bits
            bb, _ = fsk_manchester_baseband(bits, sps, sens)
            if upto == "fsk":
                return bb
            Y = jnp.swapaxes(bb, 0, 1)
            x, _ = chz.synthesize(Y, spec.chz_spec,
                                  chz.synthesizer_init(spec.chz_spec))
            return x
        return jax.jit(fn)

    prev = 0.0
    for upto in ("bits", "fsk", "full"):
        dt = timeit(build(upto), wp)
        emit(M=M, upto=upto, ms=round(dt * 1e3, 3),
             marginal_ms=round((dt - prev) * 1e3, 3),
             msps_wideband=round(nwide / dt / 1e6, 1))
        prev = dt
emit(event="done")
