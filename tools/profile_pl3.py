"""Diagnostic: v2 kernel with the transform dots cut to 1/4 (garbage
numerics, timing only) and with atan2 cut to a linear stub — attribute
the 0.98 ms between MXU and VPU."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
sys.path.insert(0, "/root/repo")
from amps_tpu.pallas.channelizer_kernel import _fold_coef, _matrices
from amps_tpu.dsp.fm import fast_atan2

OUT = open("/root/repo/tools/profile_pl3.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def timeit(fn, *a, iters=128):
    r = fn(*a); float(jnp.sum(jnp.asarray(r[0], jnp.float32)))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    float(jnp.sum(jnp.asarray(r[0], jnp.float32)))
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
M, T = 1024, 8
P = M // 2
tile_h = 128
half = tile_h // 2
rows = half + T
in_len = (rows + 1) * M
n = 1 << 22
Nh = n // P
nt = Nh // tile_h


def make(variant):
    def kernel(x_hbm, coef_ref, ce_ref, se_ref, out_ref, pow_ref,
               buf, carry, sem):
        i = pl.program_id(0)
        ntp = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)
        def dma(idx, s):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(idx * tile_h * P, in_len)],
                buf.at[s], sem.at[s])
        @pl.when(i == 0)
        def _():
            dma(0, 0).start()
        @pl.when(i + 1 < ntp)
        def _():
            dma(i + 1, nxt).start()
        dma(i, slot).wait()
        zr = buf[slot].reshape(2, rows + 1, M)
        zE = zr[:, :rows]
        zO = jnp.concatenate([zr[:, :rows, P:], zr[:, 1:rows + 1, :P]],
                             axis=-1)
        def fold(z):
            acc = z[:, 0:half] * coef_ref[0]
            for t in range(1, T):
                acc = acc + z[:, t: t + half] * coef_ref[t]
            return acc.astype(jnp.bfloat16)
        fE = fold(zE)
        fO = fold(zO)
        C2f = ce_ref[:]
        S2f = se_ref[:]
        if variant == "quarter_mxu":
            yrE = jnp.dot(fE[0], C2f, preferred_element_type=jnp.float32)
            yiE = yrE; yrO = jnp.dot(fO[0], C2f,
                                     preferred_element_type=jnp.float32)
            yiO = yrO
        else:
            def tf(f):
                yr = (jnp.dot(f[0], C2f, preferred_element_type=jnp.float32)
                      - jnp.dot(f[1], S2f, preferred_element_type=jnp.float32))
                yi = (jnp.dot(f[0], S2f, preferred_element_type=jnp.float32)
                      + jnp.dot(f[1], C2f, preferred_element_type=jnp.float32))
                return yr, yi
            yrE, yiE = tf(fE)
            yrO, yiO = tf(fO)
        yr = jnp.stack([yrE, yrO], axis=1).reshape(tile_h, M)
        yi = jnp.stack([yiE, yiO], axis=1).reshape(tile_h, M)
        @pl.when(i == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)
        sr = jnp.concatenate([carry[0:1], yr[:-1]], axis=0)
        si = jnp.concatenate([carry[1:2], yi[:-1]], axis=0)
        re = yr * sr + yi * si
        im = yi * sr - yr * si
        carry[0:1] = yr[-1:]
        carry[1:2] = yi[-1:]
        if variant == "lin_atan":
            demod = im - re
        else:
            demod = fast_atan2(im, re)
        out_ref[:] = demod.T.astype(out_ref.dtype)
        psum = jnp.sum(re * re + im * im, axis=0, keepdims=True)
        pow_ref[:] = jnp.broadcast_to(psum, (8, M))
    return kernel


@functools.partial(jax.jit, static_argnames=("variant",))
def run(x_pl, variant):
    Ce, Se = (jnp.asarray(a, jnp.bfloat16) for a in _matrices(M, False))
    return pl.pallas_call(
        make(variant),
        grid=(nt,),
        out_shape=(jax.ShapeDtypeStruct((M, Nh), jnp.bfloat16),
                   jax.ShapeDtypeStruct((nt * 8, M), jnp.float32)),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)]
        + [pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=(pl.BlockSpec((M, tile_h), lambda i: (0, i),
                                memory_space=pltpu.VMEM),
                   pl.BlockSpec((8, M), lambda i: (i, 0),
                                memory_space=pltpu.VMEM)),
        scratch_shapes=[pltpu.VMEM((2, 2, in_len), jnp.float32),
                        pltpu.VMEM((2, M), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )(x_pl, jnp.asarray(_fold_coef(M, T)), Ce, Se)

rng = np.random.default_rng(0)
n_ext = (Nh + 2 * T - 1) * P
need = (Nh - tile_h) * P + in_len + P
x = rng.normal(0, 0.1, (2, max(n_ext, need))).astype(np.float32)
x_pl = jnp.asarray(x)
for v in ("full", "quarter_mxu", "lin_atan"):
    emit(event="compile_attempt", variant=v)
    dt = timeit(lambda xb, vv=v: run(xb, vv), x_pl)
    emit(event="variant", variant=v, ms=dt * 1e3, msps=n / dt / 1e6)
emit(event="done")
