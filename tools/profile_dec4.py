"""Decode internals at deep queue (96 iters), bench shape (1024, 2, 3374)
uint8 captures: manchester / syndrome / +ok-gather / +err-gather / full.
Plus: packed-err gather variant, and a bf16 find_bursts_phases variant."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.rx import decoder, correlator
from amps_tpu.codec import bch
from amps_tpu.codec.bits import packbits
from amps_tpu.codec.manchester import manchester_decode_bits

OUT = open("/root/repo/tools/profile_dec4.out", "a", buffering=1)
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
rng = np.random.default_rng(0)
hard = jnp.asarray(rng.integers(0, 2, (1024, 2, 3374)).astype(np.uint8))


@functools.partial(jax.jit, static_argnames=("upto",))
def dec_upto(s, upto: int):
    batch = s.shape[:-1]
    dcc_sym = s[..., : 2 * 7]
    word_sym = s[..., 2 * 7:].reshape(batch + (7, 480))
    dcc_bits, dcc_bad = manchester_decode_bits(dcc_sym)
    word_bits, word_bad = manchester_decode_bits(word_sym)
    reps = word_bits.reshape(batch + (7, 5, 48))
    if upto == 0:
        return reps
    H = jnp.asarray(bch._syndrome_matrix(48), jnp.float32)
    syn = jnp.mod(reps.astype(jnp.float32) @ H, 2.0).astype(jnp.int32)
    idx = packbits(syn, jnp.int32)
    if upto == 1:
        return idx
    err_tab, valid_tab = bch._decode_tables(48)
    ok = jnp.asarray(valid_tab)[idx]
    if upto == 2:
        return ok
    err = jnp.asarray(err_tab)[idx]
    if upto == 3:
        return err
    corrected = jnp.bitwise_xor(reps, err)[..., :36]
    first_idx = jnp.argmax(ok, axis=-1)
    any_ok = jnp.any(ok, axis=-1)
    words = jnp.take_along_axis(
        corrected, first_idx[..., None, None], axis=-2)[..., 0, :]
    return words

names = ["manchester+reps", "syndrome+pack", "ok_gather", "err_gather",
         "select"]
prev = 0.0
for u in range(5):
    dt = timeit(lambda s, uu=u: dec_upto(s, uu), hard)
    emit(event="stage", upto=names[u], ms=dt*1e3, marginal_ms=(dt-prev)*1e3)
    prev = dt

dt = timeit(lambda s: decoder.decode_bursts(s).words, hard)
emit(event="decode_full", ms=dt*1e3)

# variant: select repeat FIRST, then one err gather on 7 words not 35
@jax.jit
def dec_select_first(s):
    batch = s.shape[:-1]
    word_sym = s[..., 2 * 7:].reshape(batch + (7, 480))
    word_bits, _ = manchester_decode_bits(word_sym)
    reps = word_bits.reshape(batch + (7, 5, 48))
    H = jnp.asarray(bch._syndrome_matrix(48), jnp.float32)
    syn = jnp.mod(reps.astype(jnp.float32) @ H, 2.0).astype(jnp.int32)
    idx = packbits(syn, jnp.int32)
    err_tab, valid_tab = bch._decode_tables(48)
    ok = jnp.asarray(valid_tab)[idx]
    first_idx = jnp.argmax(ok, axis=-1)
    sidx = jnp.take_along_axis(idx, first_idx[..., None], axis=-1)[..., 0]
    srx = jnp.take_along_axis(
        reps, first_idx[..., None, None], axis=-3)[..., 0, :]
    err = jnp.asarray(err_tab)[sidx]
    words = jnp.bitwise_xor(srx, err)[..., :36]
    return words

dt = timeit(dec_select_first, hard)
emit(event="decode_select_first", ms=dt*1e3)

# bf16 find variant
demod = jnp.asarray(rng.normal(0, 0.5, (1024, 8192)).astype(np.float32))
ph = correlator.symbol_phase_streams(demod, 3); sync(ph)
dt = timeit(lambda p: correlator.find_bursts_phases(p, 3, 2, 0.55)[2], ph)
emit(event="find_phases_f32", ms=dt*1e3)
ph16 = ph.astype(jnp.bfloat16); sync(ph16)
dt = timeit(lambda p: correlator.find_bursts_phases(p, 3, 2, 0.55)[2], ph16)
emit(event="find_phases_from_bf16_input", ms=dt*1e3)
emit(event="done")
