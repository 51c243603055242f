"""TX stages at deep queue depth (96 iters): dense vs split vs bf16
synthesis transform, transform-only, OA-only, full TX."""
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

OUT = open("/root/repo/tools/profile_tx5.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=96):
    r = fn(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
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
st0 = chz.synthesizer_init(spec.chz_spec)

emit(event="tx_mod", ms=timeit(mod, wp)*1e3)
for split, bf16 in ((0, False), (128, False), (128, True)):
    syn = jax.jit(lambda y, s=split, b=bf16: chz.synthesize(
        y, spec.chz_spec, st0, bf16=b, split=s)[0])
    dts = timeit(syn, Y)
    emit(event="tx_syn", split=split, bf16=bf16, ms=dts*1e3,
         msps=n_out/dts/1e6)


@jax.jit
def transform_only(Yb):
    sgn = chz._hop_sign(M, Nh, 0)
    ur, ui = chz._transform_hopmajor(Yb[..., 0]*sgn, Yb[..., 1]*sgn,
                                     M, False, 0)
    return ur, ui

emit(event="syn_transform_dense", ms=timeit(transform_only, Y)*1e3)


@jax.jit
def transform_split(Yb):
    sgn = chz._hop_sign(M, Nh, 0)
    return chz._transform_hopmajor(Yb[..., 0]*sgn, Yb[..., 1]*sgn,
                                   M, False, 128)

emit(event="syn_transform_split", ms=timeit(transform_split, Y)*1e3)
ur, ui = transform_only(Y); sync((ur, ui))
g = chz.prototype_taps(M, 8)


@jax.jit
def oa_only(ur_, ui_):
    P = M // 2
    gm = jnp.asarray(g).reshape(8, M) * jnp.float32(P)
    LP = 16
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

    return jnp.stack([overlap_add(ur_), overlap_add(ui_)], axis=-1)

emit(event="syn_oa_only", ms=timeit(oa_only, ur, ui)*1e3)
full = jax.jit(lambda w: tx_multichannel_block(w, spec))
dt = timeit(full, wp)
emit(event="tx_full", ms=dt*1e3, msps=n_out/dt/1e6)
emit(event="done")
