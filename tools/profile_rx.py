"""Per-variant / per-stage RX profiling on the real TPU.

Appends JSON lines to tools/profile_rx.out.  Run ALONE (one chip), in
the background, never under a killing timeout (CLAUDE.md).
"""
import json, sys, time
import numpy as np
import jax   # NB: import jax BEFORE touching sys.path — a PYTHONPATH
             # entry of /root/repo breaks axon plugin discovery (why is
             # unclear; run scripts with sys.path.insert instead)
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")

from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod
from amps_tpu.rx import correlator, decoder

OUT = open("/root/repo/tools/profile_rx.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)

def sync(x):
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)[..., :1, :1])))

def timeit(fn, *a, iters=8):
    r = fn(*a); sync(r if not isinstance(r, dict) else r["quality"])
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    sync(r if not isinstance(r, dict) else r["quality"])
    return (time.perf_counter() - t0) / iters

n = 1 << 22
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))

emit(event="start", device=str(jax.devices()[0]), n=n)

variants = [
    ("f32_dense_conv", dict(transform_split=0, fold="conv")),
    ("f32_split_conv", dict(transform_split=-1, fold="conv")),
    ("f32_split_shift", dict(transform_split=-1, fold="shift")),
    ("bf16_split_shift", dict(transform_split=-1, fold="shift",
                              transform_bf16=True)),
    ("bf16_split_conv", dict(transform_split=-1, fold="conv",
                             transform_bf16=True)),
]
for name, kw in variants:
    spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, **kw)
    try:
        dt = timeit(lambda xb: rx_multichannel_block(xb, spec, max_bursts=2), x)
        emit(event="pipeline", M=1024, variant=name, ms=dt * 1e3,
             msps=n / dt / 1e6)
    except Exception as e:
        emit(event="error", variant=name, err=repr(e)[:300])

# per-stage breakdown at the best-likely config
spec = MultichannelSpec(num_channels=1024, taps_per_phase=8,
                        transform_split=-1, fold="shift",
                        transform_bf16=True)
M, T = 1024, 8
P = M // 2
h = jnp.asarray(chz.prototype_taps(M, T))
xe = jnp.concatenate([jnp.zeros((M * T - P, 2), jnp.float32), x], axis=0)
import functools
an = jax.jit(functools.partial(chz._analyze_block_chmajor, M=M, T=T,
                               hop0_parity=0, bf16=True, split=128,
                               fold="shift"))
dt = timeit(lambda a: an(a, h), xe); emit(event="stage", stage="analyze_bf16_split_shift", ms=dt*1e3)
an32 = jax.jit(functools.partial(chz._analyze_block_chmajor, M=M, T=T,
                                 hop0_parity=0, bf16=False, split=128,
                                 fold="shift"))
dt = timeit(lambda a: an32(a, h), xe); emit(event="stage", stage="analyze_f32_split_shift", ms=dt*1e3)
ych = an(xe, h); _ = sync(ych)
qd = jax.jit(lambda y: quadrature_demod(y)[0])
dt = timeit(qd, ych); emit(event="stage", stage="demod", ms=dt*1e3)
demod = qd(ych); _ = float(jnp.sum(demod[..., :1]))
sps = spec.chan_sps
fb = jax.jit(lambda d: correlator.find_bursts(d, sps, 2, 0.55)[2])
dt = timeit(fb, demod); emit(event="stage", stage="find_bursts", ms=dt*1e3)
starts, valid, q = correlator.find_bursts(demod, sps, 2, 0.55)
pad = jnp.zeros(demod.shape[:-1] + (correlator.CAPTURE_SYMBOLS * sps,), demod.dtype)
demod_p = jnp.concatenate([demod, pad], axis=-1)
ex = jax.jit(lambda dp, st: jax.vmap(
    lambda d, s: correlator.extract_burst_symbols(d, s, sps))(dp, st)[0])
dt = timeit(ex, demod_p, starts); emit(event="stage", stage="extract", ms=dt*1e3)
hard = ex(demod_p, starts); _ = float(jnp.sum(hard[..., :1].astype(jnp.float32)))
de = jax.jit(lambda hd: decoder.decode_bursts(hd).words)
dt = timeit(de, hard); emit(event="stage", stage="decode", ms=dt*1e3)

# M=128 bank for the second bench figure
for name, kw in [("f32_dense_conv", dict(transform_split=0, fold="conv")),
                 ("f32_dense_shift", dict(transform_split=0, fold="shift")),
                 ("bf16_dense_shift", dict(transform_split=0, fold="shift",
                                           transform_bf16=True))]:
    spec = MultichannelSpec(num_channels=128, taps_per_phase=8, **kw)
    dt = timeit(lambda xb: rx_multichannel_block(xb, spec, max_bursts=2), x)
    emit(event="pipeline", M=128, variant=name, ms=dt * 1e3, msps=n / dt / 1e6)

emit(event="done")
