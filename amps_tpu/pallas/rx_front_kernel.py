"""Fused Pallas RX front end: analysis channelizer + FM discriminator.

One kernel program per tile of TILE_H hops does, entirely in VMEM:
  1. ONE double-buffered DMA of the rows it needs (program i prefetches
     tile i+1 into the other slot while computing — the TPU grid is
     sequential); the odd-parity windows are rebuilt from the even rows
     by P-aligned lane slices, so the stream is read ONCE;
  2. the polyphase fold as T shifted multiply-accumulates over M-wide
     rows (see pallas/channelizer_kernel.py, the analysis-only kernel);
  3. the M-point channel transform as (TILE_H/2, M) @ (M, M) MXU dots
     against pre-flipped, pre-derotated cos/sin matrices (bfloat16
     operands with f32 accumulation at M >= 512 so all four matrices fit
     VMEM: 4*M^2*2 B = 8 MB at M=1024);
  4. the quadrature discriminator IN PLACE: re/im of y[n]*conj(y[n-1])
     along the hop axis (the previous tile's last hop is carried in VMEM
     scratch — the TPU grid executes sequentially) and the polynomial
     fast_atan2 (dsp/fm.py) on the VPU;
  5. writes ONLY the bf16 demod tile (M, TILE_H) and an (8, M) band-power
     partial — the (2, M, Nh) analysis IQ planes never touch HBM.  That
     is the point: the XLA path writes + re-reads them (~100 MB at
     1024 x 8192), the biggest single traffic item in the RX pipeline.

First-hop convention matches quadrature_demod_planar(prev=None): the
hop -1 sample is zero, so demod[:, 0] = fast_atan2(0, 0) = 0 and the
power partial of hop 0 is 0.

STATUS (tools/profile_pl1-pl3.out, 2026-08): compiled + validated on
the real chip; standalone it beats the XLA analyze+demod 0.93 vs
1.06 ms at M=1024 (attribution: ~0.41 ms MXU dense dots, ~0.52 ms
DMA+fold+interleave, atan2 free), but IN-PIPELINE the full RX call is
~3% slower (1.92 vs 1.86 ms): the custom-call boundary blocks XLA's
cross-op scheduling, and XLA already fuses the discriminator into the
transform epilogue.  It stays an opt-in (use_pallas=True) — the win
would need an in-kernel two-stage transform whose awkward stage-2
shapes (8-deep batched dots or ~0.5 ms of VPU multiply-adds) eat the
saving — measured, documented, parked.

Mosaic constraints (see CLAUDE.md): every VMEM view keeps a 128-lane
minor; DMA offsets are multiples of P (M/2 >= 128); the power output
block is (8, M) because an output tile with sublane dim < 8 crashes the
remote compile helper.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amps_tpu.dsp.fm import fast_atan2
from amps_tpu.pallas.channelizer_kernel import _fold_coef, _matrices


def _make_kernel(M: int, T: int, tile_h: int, bf16_mats: bool):
    P = M // 2
    half = tile_h // 2
    rows = half + T            # z rows needed per parity bank
    in_len = (rows + 1) * M    # ONE DMA covers both parity banks
    mat_t = jnp.bfloat16 if bf16_mats else jnp.float32

    def kernel(x_hbm, coef_ref, ce_ref, se_ref, co_ref, so_ref,
               out_ref, pow_ref, buf, carry, sem):
        # Double-buffered single DMA per tile: the odd-parity windows
        # are the even rows lane-rotated by P (z_odd[m] =
        # [z[m, P:] | z[m+1, :P]]), so one (2, (rows+1)*M) copy feeds
        # both banks — half the HBM reads of the two-bank form — and
        # the TPU grid's sequential execution lets program i prefetch
        # tile i+1 into the other slot while it computes (the classic
        # Pallas double-buffer pattern).
        i = pl.program_id(0)
        nt = pl.num_programs(0)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def dma(idx, s):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(idx * tile_h * P, in_len)],
                buf.at[s], sem.at[s])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()

        @pl.when(i + 1 < nt)
        def _():
            dma(i + 1, nxt).start()

        dma(i, slot).wait()
        zr = buf[slot].reshape(2, rows + 1, M)
        zE = zr[:, :rows]                  # z[2m]   = x[start+mM : +M]

        def fold(z, c0, c1):
            acc = z[:, 0:half] * coef_ref[0, c0:c1]
            for t in range(1, T):
                acc = acc + z[:, t: t + half] * coef_ref[t, c0:c1]
            return acc.astype(mat_t)        # (2, half, c1-c0)

        fE = fold(zE, 0, M)                 # q_w in [0, M)
        # odd-parity windows are the even rows lane-rotated by P
        # (z_odd[m] = [z[m, P:] | z[m+1, :P]]); concatenating the two
        # slices hits an unimplemented Mosaic lowering ('result/input
        # offset mismatch on non-concat dimension'), so the odd fold
        # keeps the two lane halves SEPARATE and the transform contracts
        # them against the matching row halves of the matrices — same
        # MACs, no concat anywhere.
        fOl = fold(zr[:, :, P:], 0, P)      # q_w in [0, P)
        fOr = fold(zr[:, 1:, :P], P, M)     # q_w in [P, M)

        def dots(fr, fi, C2f, S2f):
            yr = (jnp.dot(fr, C2f, preferred_element_type=jnp.float32)
                  - jnp.dot(fi, S2f, preferred_element_type=jnp.float32))
            yi = (jnp.dot(fr, S2f, preferred_element_type=jnp.float32)
                  + jnp.dot(fi, C2f, preferred_element_type=jnp.float32))
            return yr, yi                   # (half, M) f32

        yrE, yiE = dots(fE[0], fE[1], ce_ref[:], se_ref[:])
        yrO1, yiO1 = dots(fOl[0], fOl[1], co_ref[:P], so_ref[:P])
        yrO2, yiO2 = dots(fOr[0], fOr[1], co_ref[P:], so_ref[P:])
        yrO = yrO1 + yrO2
        yiO = yiO1 + yiO2
        # interleave parities back into hop order, hop-major (tile_h, M)
        yr = jnp.stack([yrE, yrO], axis=1).reshape(tile_h, M)
        yi = jnp.stack([yiE, yiO], axis=1).reshape(tile_h, M)

        # discriminator: y[n] * conj(y[n-1]) along hops; hop -1 comes
        # from the previous tile via scratch (zeros for the first tile,
        # matching quadrature_demod_planar(prev=None))
        @pl.when(i == 0)
        def _():
            carry[:] = jnp.zeros_like(carry)
        prev_r = carry[0:1]                 # (1, M)
        prev_i = carry[1:2]
        sr = jnp.concatenate([prev_r, yr[:-1]], axis=0)
        si = jnp.concatenate([prev_i, yi[:-1]], axis=0)
        re = yr * sr + yi * si
        im = yi * sr - yr * si
        carry[0:1] = yr[-1:]
        carry[1:2] = yi[-1:]
        demod = fast_atan2(im, re)          # (tile_h, M) f32, VPU poly
        out_ref[:] = demod.T.astype(out_ref.dtype)
        # band-power partial: sum over this tile's hops of |y_n y_{n-1}|^2
        # pieces (re^2 + im^2); XLA finishes sqrt(sum / Nh).  (8, M)
        # because a sublane dim < 8 is not a legal f32 output tile.
        psum = jnp.sum(re * re + im * im, axis=0, keepdims=True)  # (1, M)
        pow_ref[:] = jnp.broadcast_to(psum, (8, M))

    return kernel, in_len


def analyze_demod_pallas(x_ext, M: int, T: int, tile_h: int = 128,
                         interpret: bool = False):
    """Fused analysis + FM demod: x_ext ((Nh + 2T - 1) * P, 2) float32
    (history already prepended) -> (demod (M, Nh) bfloat16,
    chan_power (M,) float32).

    Requirements: M % 128 == 0 (lane alignment), Nh % tile_h == 0,
    hop0_parity 0 (even hops-per-block streaming, as the analysis-only
    kernel).  Matches quadrature_demod_planar(prev=None) +
    sqrt(mean |y_n conj(y_{n-1})|^2) band power, with the transform in
    bf16 (f32-accumulated) at M >= 512.
    """
    P = M // 2
    assert M % 256 == 0 and tile_h % 2 == 0
    # M % 256: the odd-parity lane slices need P to be a multiple of
    # 128 lanes; M=128 falls back to the XLA path (fast there anyway)
    # or the two-DMA analysis-only kernel.
    # compiled-path constraint: the (M, tile_h) demod output block needs a
    # 128-divisible lane dim (interpret mode accepts any even tile_h)
    n_ext = x_ext.shape[0]
    Nh = (n_ext - (2 * T - 1) * P) // P
    assert Nh % tile_h == 0, (Nh, tile_h)
    bf16_mats = M >= 512
    kernel, in_len = _make_kernel(M, T, tile_h, bf16_mats)
    coef = _fold_coef(M, T)
    mat_t = jnp.bfloat16 if bf16_mats else jnp.float32
    Ce, Se = (jnp.asarray(a, mat_t) for a in _matrices(M, False))
    Co, So = (jnp.asarray(a, mat_t) for a in _matrices(M, True))
    nt = Nh // tile_h
    x_pl = jnp.swapaxes(jnp.asarray(x_ext, jnp.float32), 0, 1)
    need = (Nh - tile_h) * P + in_len + P
    if need > n_ext:
        x_pl = jnp.pad(x_pl, ((0, 0), (0, need - n_ext)))
    demod, pow_part = pl.pallas_call(
        kernel,
        grid=(nt,),
        out_shape=(jax.ShapeDtypeStruct((M, Nh), jnp.bfloat16),
                   jax.ShapeDtypeStruct((nt * 8, M), jnp.float32)),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x planar, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coef
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ce
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Se
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Co
            pl.BlockSpec(memory_space=pltpu.VMEM),  # So
        ],
        out_specs=(
            pl.BlockSpec((M, tile_h), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, in_len), jnp.float32),  # double-buffered
            pltpu.VMEM((2, M), jnp.float32),          # last-hop IQ carry
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_pl, jnp.asarray(coef), Ce, Se, Co, So)
    power = jnp.sqrt(jnp.sum(pow_part.reshape(nt, 8, M)[:, 0, :], axis=0)
                     / jnp.float32(Nh))
    return demod, power
