"""Round-3 RX profiling: bank fold, matmul extract, f32 BCH."""
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

OUT = open("/root/repo/tools/profile_rx3.out", "a", buffering=1)
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
M, T = 1024, 8
P = M // 2
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
emit(event="start", device=str(jax.devices()[0]))

for name, kw in [("f32_bank", dict(fold="bank")),
                 ("bf16_bank", dict(fold="bank", transform_bf16=True)),
                 ("f32_conv_ref", dict())]:
    spec = MultichannelSpec(num_channels=M, taps_per_phase=T, **kw)
    dt = timeit(lambda xb: rx_multichannel_block(xb, spec, max_bursts=2), x)
    emit(event="pipeline", M=M, variant=name, ms=dt*1e3, msps=n/dt/1e6)

h = jnp.asarray(chz.prototype_taps(M, T))
xe = jnp.concatenate([jnp.zeros((M*T-P, 2), jnp.float32), x], axis=0)
for nm, bf in (("f32", False), ("bf16", True)):
    an = jax.jit(functools.partial(chz._analyze_block_chmajor, M=M, T=T,
        hop0_parity=0, bf16=bf, split=0, fold="bank", planar=True))
    dt = timeit(lambda a: an(a, h), xe)
    emit(event="stage", stage=f"analyze_bank_{nm}", ms=dt*1e3)

ypl = an(xe, h); _ = sync(ypl)
qd = jax.jit(lambda y: quadrature_demod_planar(y[0], y[1])[0])
demod = qd(ypl); _ = sync(demod)
sps = 3
starts, valid, q = correlator.find_bursts(demod, sps, 2, 0.55)
pad = jnp.zeros(demod.shape[:-1] + (correlator.CAPTURE_SYMBOLS*sps,), demod.dtype)
demod_p = jnp.concatenate([demod, pad], axis=-1)
ex = jax.jit(lambda dp, st: jax.vmap(
    lambda d, s: correlator.extract_burst_symbols(d, s, sps))(dp, st)[0])
dt = timeit(ex, demod_p, starts)
emit(event="stage", stage="extract_matmul", ms=dt*1e3)
hard = ex(demod_p, starts); _ = sync(hard.astype(jnp.float32))
de = jax.jit(lambda hd: decoder.decode_bursts(hd).words)
dt = timeit(de, hard)
emit(event="stage", stage="decode_f32bch", ms=dt*1e3)

# M=128 with the best config
spec = MultichannelSpec(num_channels=128, taps_per_phase=8, fold="bank",
                        transform_bf16=True)
dt = timeit(lambda xb: rx_multichannel_block(xb, spec, max_bursts=2), x)
emit(event="pipeline", M=128, variant="bf16_bank", ms=dt*1e3, msps=n/dt/1e6)
emit(event="done")
