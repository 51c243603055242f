"""Dispatch-floor check + synthesis stage split (transform vs overlap-add).
Is the ~3.4 ms TX number compute or per-dispatch overhead on the tunneled
chip?"""
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

OUT = open("/root/repo/tools/profile_tx4.out", "a", buffering=1)
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
# dispatch floor: trivial op, tiny and medium
tiny = jnp.zeros((8, 128), jnp.float32)
triv = jax.jit(lambda x: x + 1.0)
for iters in (12, 48):
    emit(event="trivial", iters=iters, ms=timeit(triv, tiny, iters=iters)*1e3)

M = 1024
F = 2
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
Nh = Y.shape[0]
emit(event="shapes", Nh=Nh, n_out=n_out)

# full TX at different iteration counts (amortization check)
full = jax.jit(lambda w: tx_multichannel_block(w, spec))
for iters in (12, 48):
    dt = timeit(full, wp, iters=iters)
    emit(event="tx_full", iters=iters, ms=dt*1e3, msps=n_out/dt/1e6)

# transform only: u = y @ E (dense) from the hop-major planes
sgn_in = Y  # timing includes the hop-sign multiply like the real path


@jax.jit
def transform_only(Yb):
    sgn = chz._hop_sign(M, Nh, 0)
    yr = Yb[..., 0] * sgn
    yi = Yb[..., 1] * sgn
    ur, ui = chz._transform_hopmajor(yr, yi, M, False, 0)
    return ur, ui

dt = timeit(transform_only, Y)
emit(event="syn_transform_dense", ms=dt*1e3)

u = transform_only(Y); sync(u)
ur, ui = u

# OA only from precomputed u planes
g = chz.prototype_taps(M, 8)


@jax.jit
def oa_only(ur_, ui_):
    L = M * 8
    P = M // 2
    gm = jnp.asarray(g).reshape(8, M) * jnp.float32(P)
    LP = L // P
    nb_out = Nh + LP - 1
    total = nb_out * P

    def overlap_add(uplane):
        out = None
        for j in range(LP):
            gj = gm[j // 2, (j & 1) * P: (j & 1) * P + P]
            half = uplane[..., (j & 1) * P: (j & 1) * P + P]
            term = jnp.pad(gj * half, [(j, LP - 1 - j), (0, 0)])
            out = term if out is None else out + term
        return out.reshape(total)

    outr = overlap_add(ur_)
    outi = overlap_add(ui_)
    return jnp.stack([outr, outi], axis=-1)

dt = timeit(oa_only, ur, ui)
emit(event="syn_oa_only", ms=dt*1e3)
emit(event="done")
