"""TX synth after slice-based overlap-add: full TX at M=1024/256, split
variants."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fsk_manchester_baseband
from amps_tpu.tx.focc import focc_frame_bits
import functools

OUT = open("/root/repo/tools/profile_tx8.out", "a", buffering=1)
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
rng = np.random.default_rng(0)
for M in (1024, 256):
    F = 3
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8)
    sps = spec.chan_sps
    sens = 2.0 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
    wp = jnp.asarray(rng.integers(0, 2, (M, F, 2, 28)).astype(np.uint8))
    nwide = F * 463 * 2 * sps * (M // 2)

    @functools.partial(jax.jit, static_argnames=("spl", "bf16"))
    def tx(w, spl, bf16=False):
        bits = focc_frame_bits(w)
        bb, _ = fsk_manchester_baseband(bits, sps, sens)
        Y = jnp.swapaxes(bb, 0, 1)
        x, _ = chz.synthesize(Y, spec.chz_spec,
                              chz.synthesizer_init(spec.chz_spec),
                              bf16=bf16, split=spl)
        return x

    for spl, bf16 in ((chz.default_split(M), False), (0, False), (0, True)):
        dt = timeit(lambda w, s=spl, b=bf16: tx(w, s, b), wp)
        emit(event="tx_full", M=M, split=spl, bf16=bf16, ms=dt * 1e3,
             msps=nwide / dt / 1e6)
emit(event="done")
