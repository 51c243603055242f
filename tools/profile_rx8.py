"""Round-4: marginal cost of each pipeline stage via jitted prefixes."""
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

OUT = open("/root/repo/tools/profile_rx8.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=10):
    r = fn(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / iters

n = 1 << 22
M, T = 128, 8
P = M // 2
sps = 3
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
spec = MultichannelSpec(num_channels=M, taps_per_phase=T, fold="bank")
h = jnp.asarray(chz.prototype_taps(M, T))
emit(event="start", device=str(jax.devices()[0]))

def prefix(depth):
    @jax.jit
    def fn(xb):
        xe = jnp.concatenate([jnp.zeros((M*T-P, 2), jnp.float32), xb], 0)
        ypl = chz._analyze_block_chmajor(xe, h, M, T, 0, False, 0, "bank",
                                         planar=True)
        if depth == 1:
            return ypl
        demod, _ = quadrature_demod_planar(ypl[0], ypl[1])
        if depth == 2:
            return demod
        starts, valid, quality = correlator.find_bursts(demod, sps, 2, 0.55)
        if depth == 3:
            return (starts, valid, quality)
        pad = jnp.zeros(demod.shape[:-1] + (correlator.CAPTURE_SYMBOLS*sps,),
                        demod.dtype)
        demod_p = jnp.concatenate([demod, pad], axis=-1)
        hard, _ = jax.vmap(
            lambda d, s: correlator.extract_burst_symbols(d, s, sps)
        )(demod_p, starts)
        if depth == 4:
            return hard
        dec = decoder.decode_bursts(hard)
        return dec.words
    return fn

names = ["analyze", "+demod", "+find", "+extract", "+decode"]
prev = 0.0
for d in range(1, 6):
    dt = timeit(prefix(d), x) * 1e3
    emit(event="prefix", depth=d, name=names[d-1], total_ms=dt,
         marginal_ms=dt - prev)
    prev = dt

dtf = timeit(lambda xb: rx_multichannel_block(xb, spec, max_bursts=2), x)
emit(event="pipeline", M=M, variant="f32_bank_fastatan_mmenergy",
     ms=dtf*1e3, msps=n/dtf/1e6)
emit(event="done")
