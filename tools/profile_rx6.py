"""Round-6: hardware calibration + one-hot-matmul extract."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, "/root/repo")
from amps_tpu.rx import correlator

OUT = open("/root/repo/tools/profile_rx6.out", "a", buffering=1)
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

emit(event="start", device=str(jax.devices()[0]))
rng = np.random.default_rng(0)

# --- calibration ---
big = jnp.asarray(rng.normal(0, 1, (32 * 1024 * 1024,)).astype(np.float32))  # 128 MB
f_add = jax.jit(lambda v: v * 1.0001 + 1.0)
dt = timeit(f_add, big)
emit(event="calib", name="elementwise_128MB", ms=dt*1e3,
     gbps=2 * big.nbytes / dt / 1e9)
tr = jnp.asarray(rng.normal(0, 1, (4 * 1024 * 1024, 2)).astype(np.float32))
f_tr = jax.jit(lambda v: jnp.swapaxes(v, 0, 1) + 0.0)
dt = timeit(f_tr, tr)
emit(event="calib", name="transpose_n2_33MB", ms=dt*1e3,
     gbps=2 * tr.nbytes / dt / 1e9)
trb = jnp.asarray(rng.normal(0, 1, (8192, 4096)).astype(np.float32))
f_trb = jax.jit(lambda v: jnp.swapaxes(v, 0, 1) + 0.0)
dt = timeit(f_trb, trb)
emit(event="calib", name="transpose_big_128MB", ms=dt*1e3,
     gbps=2 * trb.nbytes / dt / 1e9)
A = jnp.asarray(rng.normal(0, 1, (4096, 4096)).astype(np.float32))
B = jnp.asarray(rng.normal(0, 1, (4096, 4096)).astype(np.float32))
f_mm = jax.jit(lambda a, b: a @ b)
dt = timeit(f_mm, A, B)
emit(event="calib", name="matmul_4096_f32", ms=dt*1e3,
     tflops=2 * 4096**3 / dt / 1e12)
f_mm16 = jax.jit(lambda a, b: (a.astype(jnp.bfloat16) @ b.astype(jnp.bfloat16)))
dt = timeit(f_mm16, A, B)
emit(event="calib", name="matmul_4096_bf16", ms=dt*1e3,
     tflops=2 * 4096**3 / dt / 1e12)

# --- one-hot-matmul extract ---
M = 1024
sps = 3
CAP = correlator.CAPTURE_SYMBOLS
Nh = 8184
demod = jnp.asarray(rng.normal(0, 0.3, (M, Nh)).astype(np.float32))
starts = jnp.asarray((rng.integers(0, Nh * 2, (M, 2))).astype(np.int32))
pad = jnp.zeros((M, CAP * sps), jnp.float32)
demod_p = jnp.concatenate([demod, pad], axis=-1)

BB = 128
NBLK_OUT = -(-CAP // BB) + 1          # 28 blocks cover CAP + fine shift

@jax.jit
def extract_onehot(dp, st):
    phases = correlator.symbol_phase_streams(dp, sps)     # (C, 3, nsym)
    C3 = phases.shape
    nsym = C3[-1]
    nb = -(-nsym // BB)
    ph_pad = jnp.concatenate(
        [phases, jnp.zeros(C3[:-1] + (nb * BB - nsym,), phases.dtype)], -1)
    blocks = ph_pad.reshape(C3[0], sps * nb, BB)          # (C, 3*nb, BB)
    ph = st % sps
    k0 = st // sps
    b0 = ph * nb + k0 // BB                               # (C, K)
    r = k0 % BB
    j = jnp.arange(NBLK_OUT)
    tgt = b0[..., None] + j                               # (C, K, 28)
    sel = (tgt[..., None] == jnp.arange(sps * nb)).astype(jnp.float32)
    coarse = jnp.einsum("ckjb,cbl->ckjl", sel, blocks)    # (C, K, 28, BB)
    flat = coarse.reshape(C3[0], st.shape[-1], NBLK_OUT * BB)
    # fine realign by r in [0, BB): binary shift decomposition
    for bit in range(7):
        amt = 1 << bit
        shifted = jnp.concatenate(
            [flat[..., amt:], jnp.zeros(flat.shape[:-1] + (amt,),
                                        flat.dtype)], -1)
        flat = jnp.where((r[..., None] & amt) > 0, shifted, flat)
    return flat[..., :CAP]

@jax.jit
def extract_gather(dp, st):
    phases = correlator.symbol_phase_streams(dp, sps)
    def chan(p, s):
        def one(s0):
            return lax.dynamic_slice(p, (s0 % sps, s0 // sps), (1, CAP))[0]
        return jax.vmap(one)(s)
    return jax.vmap(chan)(phases, st)

a = extract_onehot(demod_p, starts)
b = extract_gather(demod_p, starts)
err = float(jnp.max(jnp.abs(a - b)))
emit(event="check", name="onehot_vs_gather_maxerr", err=err)
dt = timeit(extract_onehot, demod_p, starts)
emit(event="v", name="extract_onehot_full", ms=dt*1e3)
dt = timeit(extract_gather, demod_p, starts)
emit(event="v", name="extract_gather_full", ms=dt*1e3)
emit(event="done")
