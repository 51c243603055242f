"""Decode-stage breakdown at the bench shape (1024, 2, 3374):
manchester vs BCH syndrome vs error-pattern selection, plus candidate
reorientations (position-packed table, one-hot matmul selection)."""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.rx import decoder
from amps_tpu.codec.manchester import manchester_decode_bits
from amps_tpu.codec import bch
from amps_tpu.codec.bits import packbits

OUT = open("/root/repo/tools/profile_dec.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=24):
    r = fn(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
rng = np.random.default_rng(0)
C, K = 1024, 2
hard = jnp.asarray(rng.integers(0, 2, (C, K, 3374)).astype(np.uint8))
reps = jnp.asarray(rng.integers(0, 2, (C, K, 7, 5, 48)).astype(np.uint8))

emit(event="decode_full", ms=timeit(lambda h: decoder.decode_bursts(h), hard)*1e3)
emit(event="manchester", ms=timeit(
    jax.jit(lambda h: manchester_decode_bits(h)), hard)*1e3)
emit(event="bch_decode", ms=timeit(
    jax.jit(lambda r: bch.recc_bch_decode(r)), reps)*1e3)

# syndrome matmul + pack only
H = jnp.asarray(bch._syndrome_matrix(48), dtype=jnp.float32)
@jax.jit
def syn_only(r):
    syn = jnp.mod(r.astype(jnp.float32) @ H, 2.0).astype(jnp.int32)
    return packbits(syn, jnp.int32)
emit(event="syndrome_pack", ms=timeit(syn_only, reps)*1e3)

# gather selection only (current)
err_tab, valid_tab = bch._decode_tables(48)
idx = syn_only(reps); sync(idx)
ET = jnp.asarray(err_tab); VT = jnp.asarray(valid_tab)
@jax.jit
def sel_gather(i):
    return ET[i], VT[i]
emit(event="sel_gather", ms=timeit(sel_gather, idx)*1e3)

# candidate: position-packed table (p1<<6|p2 in 12 bits, valid flag),
# flips rebuilt by iota compare
pos_tab = np.zeros((1 << 12,), np.int32)
for s in range(1 << 12):
    nz = np.nonzero(err_tab[s])[0]
    p1 = nz[0] if len(nz) > 0 else 63
    p2 = nz[1] if len(nz) > 1 else 63
    pos_tab[s] = (int(p1) << 6) | int(p2)
PT = jnp.asarray(pos_tab)
IOTA48 = jnp.arange(48, dtype=jnp.int32)
@jax.jit
def sel_positions(i):
    pk = PT[i]
    p1 = pk >> 6
    p2 = pk & 63
    err = ((IOTA48 == p1[..., None]) | (IOTA48 == p2[..., None]))
    return err.astype(jnp.uint8), VT[i]
emit(event="sel_positions", ms=timeit(sel_positions, idx)*1e3)
r_g = sel_gather(idx); r_p = sel_positions(idx)
emit(event="sel_equal",
     equal=bool(jnp.all(r_g[0] == r_p[0]) & jnp.all(r_g[1] == r_p[1])))

# candidate: one-hot matmul selection
ETf = jnp.asarray(err_tab, jnp.float32)
@jax.jit
def sel_onehot(i):
    oh = (i[..., None] == jnp.arange(1 << 12, dtype=jnp.int32))
    e = oh.astype(jnp.float32) @ ETf
    return e.astype(jnp.uint8), VT[i]
emit(event="sel_onehot", ms=timeit(sel_onehot, idx)*1e3)
emit(event="done")
