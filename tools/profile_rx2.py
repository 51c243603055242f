"""Round-2 RX profiling: new Toeplitz correlator, planar analyze/demod,
extract and decode variants.  Run ALONE on the TPU, in background."""
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

OUT = open("/root/repo/tools/profile_rx2.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)

def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))

def timeit(fn, *a, iters=8):
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

# full new pipeline
for name, kw in [("f32_dense_conv_planar", dict(transform_split=0)),
                 ("bf16_split_shift_planar", dict(transform_split=-1,
                     fold="shift", transform_bf16=True))]:
    spec = MultichannelSpec(num_channels=M, taps_per_phase=T, **kw)
    dt = timeit(lambda xb: rx_multichannel_block(xb, spec, max_bursts=2), x)
    emit(event="pipeline", M=M, variant=name, ms=dt*1e3, msps=n/dt/1e6)

h = jnp.asarray(chz.prototype_taps(M, T))
xe = jnp.concatenate([jnp.zeros((M*T-P, 2), jnp.float32), x], axis=0)

an_pl = jax.jit(functools.partial(chz._analyze_block_chmajor, M=M, T=T,
    hop0_parity=0, bf16=False, split=0, fold="conv", planar=True))
dt = timeit(lambda a: an_pl(a, h), xe)
emit(event="stage", stage="analyze_planar_f32_dense_conv", ms=dt*1e3)
an_pl2 = jax.jit(functools.partial(chz._analyze_block_chmajor, M=M, T=T,
    hop0_parity=0, bf16=True, split=128, fold="shift", planar=True))
dt = timeit(lambda a: an_pl2(a, h), xe)
emit(event="stage", stage="analyze_planar_bf16_split_shift", ms=dt*1e3)

ypl = an_pl(xe, h); _ = sync(ypl)
qd = jax.jit(lambda y: quadrature_demod_planar(y[0], y[1])[0])
dt = timeit(qd, ypl)
emit(event="stage", stage="demod_planar", ms=dt*1e3)

demod = qd(ypl); _ = sync(demod)
sps = 3
fb = jax.jit(lambda d: correlator.find_bursts(d, sps, 2, 0.55)[2])
dt = timeit(fb, demod)
emit(event="stage", stage="find_bursts_toeplitz", ms=dt*1e3)

starts, valid, q = correlator.find_bursts(demod, sps, 2, 0.55)
pad = jnp.zeros(demod.shape[:-1] + (correlator.CAPTURE_SYMBOLS*sps,), demod.dtype)
demod_p = jnp.concatenate([demod, pad], axis=-1)

ex_cur = jax.jit(lambda dp, st: jax.vmap(
    lambda d, s: correlator.extract_burst_symbols(d, s, sps))(dp, st)[0])
dt = timeit(ex_cur, demod_p, starts)
emit(event="stage", stage="extract_current", ms=dt*1e3)

CAP = correlator.CAPTURE_SYMBOLS
def extract_flat(dp, st):
    xx = dp
    nn = xx.shape[-1]
    nsym = (nn - (sps-1)) // sps
    phases = jnp.stack([xx[..., p:p+nsym*sps].reshape(xx.shape[:-1]+(nsym, sps)).mean(-1)
                        for p in range(sps)], axis=-2)   # (C, sps, nsym)
    flat = phases.reshape(xx.shape[:-1] + (sps*nsym,))   # (C, sps*nsym)
    ph = st % sps; k0 = st // sps                        # (C, K)
    base = ph*nsym + k0
    idx = base[..., None] + jnp.arange(CAP)[None, None, :]
    return jnp.take_along_axis(flat[:, None, :], idx, axis=-1) >= 0
ex_f = jax.jit(extract_flat)
dt = timeit(ex_f, demod_p, starts)
emit(event="stage", stage="extract_flat_take", ms=dt*1e3)

def extract_srate(dp, st):
    def one(d, s):
        seg = jax.vmap(lambda s0: jax.lax.dynamic_slice(d, (s0,), (CAP*sps,)))(s)
        return seg.reshape(seg.shape[:-1] + (CAP, sps)).mean(-1) >= 0
    return jax.vmap(one)(dp, st)
ex_s = jax.jit(extract_srate)
dt = timeit(ex_s, demod_p, starts)
emit(event="stage", stage="extract_samplerate_slice", ms=dt*1e3)

hard = ex_cur(demod_p, starts); _ = sync(hard.astype(jnp.float32))
de = jax.jit(lambda hd: decoder.decode_bursts(hd).words)
dt = timeit(de, hard)
emit(event="stage", stage="decode_current", ms=dt*1e3)

from amps_tpu.codec.manchester import manchester_decode_bits
man = jax.jit(lambda s: manchester_decode_bits(s[..., 14:].reshape(s.shape[:-1]+(7, 480)))[0])
dt = timeit(man, hard)
emit(event="stage", stage="decode_manchester_only", ms=dt*1e3)
from amps_tpu.codec.bch import recc_bch_decode
bits = man(hard); _ = sync(bits.astype(jnp.float32))
reps = bits.reshape(bits.shape[:-1] + (5, 48))
bch = jax.jit(lambda r: recc_bch_decode(r)[0])
dt = timeit(bch, reps)
emit(event="stage", stage="decode_bch_only", ms=dt*1e3)

emit(event="done")
