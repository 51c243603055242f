"""Fused Pallas analysis-channelizer kernel.

One kernel program per tile of TILE_H hops does, entirely in VMEM:
  1. DMA the input rows it needs from HBM (two copies — even and odd
     hop parity — because hop windows overlap by half);
  2. the polyphase fold as T shifted multiply-accumulates over M-wide
     (128-lane-aligned) rows;
  3. the M-point channel transform as (TILE_H/2, M) @ (M, M) MXU
     matmuls against pre-flipped, pre-derotated cos/sin matrices — the
     odd-parity matrices additionally absorb the (-1)^{k n} hop signs;
  4. parity re-interleave + transpose to channel-major output.

Mosaic constraints shaped this: every VMEM view keeps a 128-lane minor
dimension (M >= 128; reshapes that would split the lane dim, e.g. to
P = M/2 blocks, crash the TPU compiler), so the fold works on M-sample
rows z[r] = x[rP : rP+M] with folded[n] = sum_t coef[t] * z[n+2t],
split by parity of n into two dense streams.

The XLA path (dsp/channelizer._analyze_block_chmajor) stays the
reference; this kernel is compared against it in tests (interpret mode
on CPU) and used on real TPUs via dsp.channelizer analyze(...,
use_pallas=True) / the bench.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amps_tpu.dsp import channelizer as chz


@functools.cache
def _matrices(M: int, odd_parity_signs: bool):
    """(C2f, S2f) float32 (M, M), contract on axis 0: flipped
    (v[r] = folded[M-1-r]) and derotated (e^{+j2πk/M}); when
    ``odd_parity_signs`` also scaled by (-1)^k (the hop-parity sign of
    odd hops)."""
    C, S = chz._dft_mats(M)
    ang = 2.0 * np.pi * np.arange(M) / M
    rc, rs = np.cos(ang), np.sin(ang)
    if odd_parity_signs:
        pk = 1.0 - 2.0 * (np.arange(M) % 2)
        rc = rc * pk
        rs = rs * pk
    Cf = C[:, ::-1].T  # Cf[q, k] = C[k, M-1-q]
    Sf = S[:, ::-1].T
    C2f = (Cf * rc[None, :] - Sf * rs[None, :]).astype(np.float32)
    S2f = (Sf * rc[None, :] + Cf * rs[None, :]).astype(np.float32)
    return C2f, S2f


@functools.cache
def _fold_coef(M: int, T: int) -> np.ndarray:
    """(T, M) coef[t, q_w] = h[L-1-(t*M+q_w)], so that
    folded[n, q_w] = sum_t coef[t, q_w] * x[n*P + t*M + q_w]."""
    h = chz.prototype_taps(M, T)
    return np.ascontiguousarray(h[::-1].reshape(T, M))


def _make_kernel(M: int, T: int, tile_h: int):
    P = M // 2
    half = tile_h // 2
    rows = half + T            # z rows needed per parity bank
    in_len = rows * M          # samples per parity DMA (multiple of M)

    def kernel(xe_hbm, xo_hbm, coef_ref, ce_ref, se_ref, co_ref, so_ref,
               out_ref, ebuf, obuf, seme, semo):
        # xo_hbm is xe_hbm pre-shifted by P samples (done in XLA-land):
        # this terminal's Mosaic compile helper rejects lane-unaligned
        # HBM DMA offsets, so both banks DMA at aligned offsets.
        i = pl.program_id(0)
        start = i * tile_h * P
        de = pltpu.make_async_copy(
            xe_hbm.at[:, pl.ds(start, in_len)], ebuf, seme)
        do = pltpu.make_async_copy(
            xo_hbm.at[:, pl.ds(start, in_len)], obuf, semo)
        de.start()
        do.start()
        de.wait()
        do.wait()
        zE = ebuf[:].reshape(2, rows, M)   # z[2m]   = x[start+mM : +M]
        zO = obuf[:].reshape(2, rows, M)   # z[2m+1] = x[start+P+mM : +M]

        def fold(z):
            acc = z[:, 0:half] * coef_ref[0]
            for t in range(1, T):
                acc = acc + z[:, t: t + half] * coef_ref[t]
            return acc                      # (2, half, M) in q_w order

        fE = fold(zE)
        fO = fold(zO)

        def transform(f, c_ref, s_ref):
            fr, fi = f[0], f[1]
            C2f = c_ref[:]
            S2f = s_ref[:]
            yr = (jnp.dot(fr, C2f, preferred_element_type=jnp.float32)
                  - jnp.dot(fi, S2f, preferred_element_type=jnp.float32))
            yi = (jnp.dot(fr, S2f, preferred_element_type=jnp.float32)
                  + jnp.dot(fi, C2f, preferred_element_type=jnp.float32))
            return yr, yi                   # (half, M)

        yrE, yiE = transform(fE, ce_ref, se_ref)
        yrO, yiO = transform(fO, co_ref, so_ref)
        # interleave parities back into hop order; planar (2, M, tile_h)
        # output (a (.., 2)-minor block would violate Mosaic's tile
        # alignment and crashes this compile helper)
        yr = jnp.stack([yrE, yrO], axis=1).reshape(tile_h, M)
        yi = jnp.stack([yiE, yiO], axis=1).reshape(tile_h, M)
        out_ref[0] = yr.T
        out_ref[1] = yi.T

    return kernel, in_len


def analyze_chmajor_pallas(x_ext, M: int, T: int, hop0_parity: int = 0,
                           tile_h: int = 256, interpret: bool = False):
    """Fused analysis: x_ext ((Nh + 2T - 1) * P, 2) float32 (history
    already prepended) -> Y (M, Nh, 2) channel-major.

    Requirements: M a multiple of 128 lanes... (M >= 128 and M % 128 == 0
    for the compiled path; interpret mode accepts any even M), Nh a
    multiple of tile_h, hop0_parity == 0 (streaming callers use
    even-hop block sizes so parity stays 0).
    """
    P = M // 2
    assert tile_h % 2 == 0
    assert hop0_parity % 2 == 0, "use even hops-per-block when streaming"
    n_ext = x_ext.shape[0]
    Nh = (n_ext - (2 * T - 1) * P) // P
    assert Nh % tile_h == 0, (Nh, tile_h)
    kernel, in_len = _make_kernel(M, T, tile_h)
    coef = _fold_coef(M, T)
    Ce, Se = _matrices(M, False)
    Co, So = _matrices(M, True)
    grid = (Nh // tile_h,)
    # planar (2, n) layout; the odd bank is the same stream pre-shifted
    # by P samples so all DMA offsets stay 128-lane aligned
    x_pl = jnp.swapaxes(jnp.asarray(x_ext, jnp.float32), 0, 1)
    need = (Nh - tile_h) * P + in_len + P
    if need > n_ext:
        x_pl = jnp.pad(x_pl, ((0, 0), (0, need - n_ext)))
    x_even = x_pl
    x_odd = x_pl[:, P:]
    out = pl.pallas_call(
        kernel,
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((2, M, Nh), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x (even bank), HBM
            pl.BlockSpec(memory_space=pl.ANY),      # x shifted (odd), HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coef
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ce
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Se
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Co
            pl.BlockSpec(memory_space=pltpu.VMEM),  # So
        ],
        out_specs=pl.BlockSpec((2, M, tile_h), lambda i: (0, 0, i),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, in_len), jnp.float32),
            pltpu.VMEM((2, in_len), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(x_even, x_odd, jnp.asarray(coef), jnp.asarray(Ce), jnp.asarray(Se),
      jnp.asarray(Co), jnp.asarray(So))
    return jnp.moveaxis(out, 0, -1)  # (M, Nh, 2) riq for consumers
