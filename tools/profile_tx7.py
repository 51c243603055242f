"""TX stage marginals at deep queue depth (M=1024): where do the 2.6 ms
go?  (bits -> fsk baseband -> swap to hop-major -> synthesize)."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fsk_manchester_baseband
from amps_tpu.tx.focc import focc_frame_bits

OUT = open("/root/repo/tools/profile_tx7.out", "a", buffering=1)
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
M = 1024
F = 3
spec = MultichannelSpec(num_channels=M, taps_per_phase=8)
sps = spec.chan_sps
sens = 2.0 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
rng = np.random.default_rng(0)
wp = jnp.asarray(rng.integers(0, 2, (M, F, 2, 28)).astype(np.uint8))
nwide = F * 463 * 2 * sps * (M // 2)
split = chz.default_split(M)


@functools.partial(jax.jit, static_argnames=("upto", "bf16", "spl"))
def tx_upto(w, upto: str, bf16: bool = False, spl: int = split):
    bits = focc_frame_bits(w)
    if upto == "bits":
        return bits
    bb, _ = fsk_manchester_baseband(bits, sps, sens)
    if upto == "baseband":
        return bb
    Y = jnp.swapaxes(bb, 0, 1)
    if upto == "swap":
        return Y
    x, _ = chz.synthesize(Y, spec.chz_spec,
                          chz.synthesizer_init(spec.chz_spec),
                          bf16=bf16, split=spl)
    return x

prev = None
for stage in ("bits", "baseband", "swap", "synth"):
    dt = timeit(lambda w, s=stage: tx_upto(w, s), wp)
    emit(event="stage", upto=stage, ms=dt * 1e3,
         marginal_ms=None if prev is None else (dt - prev) * 1e3,
         msps=nwide / dt / 1e6)
    prev = dt

for bf16, spl in ((True, split), (False, 0), (True, 0)):
    dt = timeit(lambda w, b=bf16, s=spl: tx_upto(w, "synth", b, s), wp)
    emit(event="tx_variant", bf16=bf16, split=spl, ms=dt * 1e3,
         msps=nwide / dt / 1e6)
emit(event="done")
