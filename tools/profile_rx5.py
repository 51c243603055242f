"""Round-5: analyze variants + extract attribution."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax import lax
sys.path.insert(0, "/root/repo")
from amps_tpu.dsp import channelizer as chz
from amps_tpu.rx import correlator

OUT = open("/root/repo/tools/profile_rx5.out", "a", buffering=1)
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
sps = 3
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
h = jnp.asarray(chz.prototype_taps(M, T))
xe = jnp.concatenate([jnp.zeros((M*T-P, 2), jnp.float32), x], axis=0)
xpl = jnp.asarray(np.swapaxes(np.asarray(xe), 0, 1).copy())  # (2, n_ext)
emit(event="start", device=str(jax.devices()[0]))

coef = np.asarray(h)[::-1].reshape(T, M)
ke_np, ko_np = coef[:, :P], coef[:, P:]
Co, So, Ce, Se = chz._dft_mats_folded(M)
n_ext = xe.shape[0]
nblk = n_ext // P
Nh = (n_ext - (M*T - P)) // P

def bank_core(bl, bf16, fused):
    ke = jnp.asarray(ke_np); ko = jnp.asarray(ko_np)
    acc_e = ke[0] * bl[..., 0:Nh, :]
    acc_o = ko[0] * bl[..., 1:1+Nh, :]
    for t in range(1, T):
        acc_e = acc_e + ke[t] * bl[..., 2*t:2*t+Nh, :]
        acc_o = acc_o + ko[t] * bl[..., 2*t+1:2*t+1+Nh, :]
    er, ei = acc_e[0], acc_e[1]
    or_, oi = acc_o[0], acc_o[1]
    if fused:
        Wr = jnp.asarray(np.concatenate([Co, -So, Ce, -Se], 1))  # (M, 2M)
        Wi = jnp.asarray(np.concatenate([So, Co, Se, Ce], 1))
        v = jnp.concatenate([or_, oi, er, ei], axis=-1)          # (Nh, 4P)
        if bf16:
            dot = lambda A, b: jnp.einsum("kw,nw->kn", A.astype(jnp.bfloat16),
                b.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
        else:
            dot = lambda A, b: jnp.einsum("kw,nw->kn", A, b)
        return dot(Wr, v), dot(Wi, v)
    A = [jnp.asarray(a) for a in (Co, So, Ce, Se)]
    if bf16:
        dot = lambda Aa, b: jnp.einsum("kq,nq->kn", Aa.astype(jnp.bfloat16),
            b.astype(jnp.bfloat16), preferred_element_type=jnp.float32)
    else:
        dot = lambda Aa, b: jnp.einsum("kq,nq->kn", Aa, b)
    yr = dot(A[0], or_) - dot(A[1], oi) + dot(A[2], er) - dot(A[3], ei)
    yi = dot(A[1], or_) + dot(A[0], oi) + dot(A[3], er) + dot(A[2], ei)
    return yr, yi

def finish(yr, yi):
    ang = 2.0*np.pi*np.arange(M)/M
    rc = jnp.asarray(np.cos(ang), jnp.float32)[:, None]
    rs = jnp.asarray(np.sin(ang), jnp.float32)[:, None]
    return jnp.stack([yr*rc - yi*rs, yr*rs + yi*rc], axis=0)

@jax.jit
def an_current(a):
    return chz._analyze_block_chmajor(a, h, M, T, 0, False, 0, "bank", True)
dt = timeit(an_current, xe); emit(event="v", name="bank_current_f32", ms=dt*1e3)

@jax.jit
def an_planarin(pl):
    bl = pl[:, :nblk*P].reshape(2, nblk, P)
    return finish(*bank_core(bl, False, False))
dt = timeit(an_planarin, xpl); emit(event="v", name="bank_planar_in_f32", ms=dt*1e3)

@jax.jit
def an_fused(a):
    pl = jnp.swapaxes(a, 0, 1)
    bl = pl[:, :nblk*P].reshape(2, nblk, P)
    return finish(*bank_core(bl, False, True))
dt = timeit(an_fused, xe); emit(event="v", name="bank_fusedmm_f32", ms=dt*1e3)

@jax.jit
def an_fused16(a):
    pl = jnp.swapaxes(a, 0, 1)
    bl = pl[:, :nblk*P].reshape(2, nblk, P)
    return finish(*bank_core(bl, True, True))
dt = timeit(an_fused16, xe); emit(event="v", name="bank_fusedmm_bf16", ms=dt*1e3)

# variant e: P-major fold, natural (M,P)@(P,Nh) matmuls
@jax.jit
def an_pmajor(a):
    pl = jnp.swapaxes(a, 0, 1)                       # (2, n)
    bl = pl[:, :nblk*P].reshape(2, nblk, P)
    blT = jnp.swapaxes(bl, -1, -2)                   # (2, P, nblk)
    ke = jnp.asarray(ke_np); ko = jnp.asarray(ko_np)
    acc_e = ke[0][:, None] * blT[..., 0:Nh]
    acc_o = ko[0][:, None] * blT[..., 1:1+Nh]
    for t in range(1, T):
        acc_e = acc_e + ke[t][:, None] * blT[..., 2*t:2*t+Nh]
        acc_o = acc_o + ko[t][:, None] * blT[..., 2*t+1:2*t+1+Nh]
    er, ei = acc_e[0], acc_e[1]
    or_, oi = acc_o[0], acc_o[1]
    A = [jnp.asarray(m) for m in (Co, So, Ce, Se)]
    yr = A[0]@or_ - A[1]@oi + A[2]@er - A[3]@ei
    yi = A[1]@or_ + A[0]@oi + A[3]@er + A[2]@ei
    return finish(yr, yi)
dt = timeit(an_pmajor, xe); emit(event="v", name="bank_pmajor_f32", ms=dt*1e3)

# ---- extract attribution ----
demod = jnp.asarray(rng.normal(0, 0.3, (M, Nh)).astype(np.float32))
starts = jnp.asarray(rng.integers(0, Nh*2, (M, 2)).astype(np.int32))
pad = jnp.zeros((M, correlator.CAPTURE_SYMBOLS*sps), jnp.float32)
demod_p = jnp.concatenate([demod, pad], axis=-1)

ph_fn = jax.jit(lambda d: correlator.symbol_phase_streams(d, sps))
dt = timeit(ph_fn, demod_p); emit(event="v", name="phase_streams_matmul", ms=dt*1e3)
phases = ph_fn(demod_p); _ = sync(phases)

CAP = correlator.CAPTURE_SYMBOLS
@jax.jit
def gather_f32(ph, st):
    def chan(p, s):
        def one(s0):
            return lax.dynamic_slice(p, (s0 % sps, s0 // sps), (1, CAP))[0]
        return jax.vmap(one)(s)
    return jax.vmap(chan)(ph, st)
dt = timeit(gather_f32, phases, starts); emit(event="v", name="gather_f32", ms=dt*1e3)

hardp = (phases >= 0).astype(jnp.uint8); _ = sync(hardp.astype(jnp.float32))
@jax.jit
def gather_u8(ph, st):
    def chan(p, s):
        def one(s0):
            return lax.dynamic_slice(p, (s0 % sps, s0 // sps), (1, CAP))[0]
        return jax.vmap(one)(s)
    return jax.vmap(chan)(ph, st)
dt = timeit(gather_u8, hardp, starts); emit(event="v", name="gather_u8", ms=dt*1e3)
emit(event="done")
