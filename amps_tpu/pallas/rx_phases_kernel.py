"""Fused Pallas RX front end v2: analysis channelizer + FM discriminator
+ integrate-and-dump phase streams (VERDICT r1 item 4 / ROADMAP item 1).

Extends pallas/rx_front_kernel.py one stage further: the kernel emits
the (M, sps, nsym) SYMBOL-rate phase streams that both trigger
correlation and burst capture consume (rx/correlator.py
symbol_phase_streams) — so neither the (2, M, Nh) analysis planes NOR
the (M, Nh) demod plane ever touch HBM.  The custom-call boundary moves
past the point where XLA's cross-op overlap beat the v1 kernel (the 3%
in-pipeline regression documented in rx_front_kernel.py STATUS).

Mechanics on top of v1:
  * tile_h must be a multiple of 2 (parity banks) and of sps (static
    symbol count per tile: tile_h/sps per phase);
  * the dump is ONE extra MXU dot per tile: a constant (tile_h,
    tile_h + sps - 1) selector W with W[p*S + j, r] = 1/sps for
    r in [p + sps*j, p + sps*j + sps) — rows are phase-major so the
    (tile_h, M) product transposes/reshapes straight into the
    (M, sps, S) output block;
  * a symbol window crossing the tile boundary needs the NEXT tile's
    first sps-1 demod rows, so tile i's phase block is emitted by
    program i+1 (demod tiles live in a double-buffered VMEM scratch;
    the grid runs one extra program that only drains the last tile,
    padding with zero rows — XLA-land slices the tail back to the
    exact nsym = (Nh - sps + 1) // sps).

First-tile convention matches quadrature_demod_planar(prev=None):
demod[:, 0] = fast_atan2(0, 0) = 0.  Outputs are bit-comparable to
symbol_phase_streams(demod_xla)[..., :nsym] in f32; the phase blocks are
written bf16 (the correlation/capture consumers are bf16-tolerant,
tests/test_bf16.py).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from amps_tpu.dsp.fm import fast_atan2
from amps_tpu.pallas.channelizer_kernel import _fold_coef, _matrices


@functools.cache
def _dump_selector(tile_h: int, sps: int) -> np.ndarray:
    """(tile_h, tile_h + sps - 1) selector, pre-transposed for the
    in-kernel dot: row p*S + j averages demod rows
    [p + sps*j, p + sps*j + sps) (S = tile_h // sps)."""
    S = tile_h // sps
    W = np.zeros((tile_h, tile_h + sps - 1), np.float32)
    for p in range(sps):
        for j in range(S):
            W[p * S + j, p + sps * j: p + sps * j + sps] = 1.0 / sps
    return W


def _make_kernel(M: int, T: int, sps: int, tile_h: int, bf16_mats: bool,
                 dm_t=jnp.float32):
    P = M // 2
    half = tile_h // 2
    rows = half + T            # z rows needed per parity bank
    in_len = (rows + 1) * M    # ONE DMA covers both parity banks
    mat_t = jnp.bfloat16 if bf16_mats else jnp.float32
    S = tile_h // sps

    def kernel(x_hbm, coef_ref, ce_ref, se_ref, pk_ref, w_ref,
               out_ref, pow_ref, buf, dbuf, carry, sem):
        i = pl.program_id(0)
        nt = pl.num_programs(0) - 1        # data tiles (last program drains)
        slot = jax.lax.rem(i, 2)
        nxt = jax.lax.rem(i + 1, 2)

        def dma(idx, s):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(idx * tile_h * P, in_len)],
                buf.at[s], sem.at[s])

        @pl.when(i == 0)
        def _():
            dma(0, 0).start()
            carry[:] = jnp.zeros_like(carry)

        @pl.when(i + 1 < nt)
        def _():
            dma(i + 1, nxt).start()

        @pl.when(i < nt)
        def _():
            dma(i, slot).wait()
            zr = buf[slot].reshape(2, rows + 1, M)
            zE = zr[:, :rows]

            def fold(z, c0, c1):
                acc = z[:, 0:half] * coef_ref[0, c0:c1]
                for t in range(1, T):
                    acc = acc + z[:, t: t + half] * coef_ref[t, c0:c1]
                return acc.astype(mat_t)    # (2, half, c1-c0)

            fE = fold(zE, 0, M)
            fOl = fold(zr[:, :, P:], 0, P)
            fOr = fold(zr[:, 1:, :P], P, M)

            def dots(fr, fi, C2f, S2f):
                yr = (jnp.dot(fr, C2f, preferred_element_type=jnp.float32)
                      - jnp.dot(fi, S2f, preferred_element_type=jnp.float32))
                yi = (jnp.dot(fr, S2f, preferred_element_type=jnp.float32)
                      + jnp.dot(fi, C2f, preferred_element_type=jnp.float32))
                return yr, yi               # (half, M) f32

            yrE, yiE = dots(fE[0], fE[1], ce_ref[:], se_ref[:])
            # the odd-hop matrices are the even ones with alternating
            # OUTPUT-channel signs (Co2f[q,k] = C2f[q,k]*(-1)^k — the
            # (-1)^k hop-parity factor scales the k axis only), so the
            # odd bank reuses ce/se and applies the sign row to the
            # result: two fewer (M, M) resident matrices = -4 MB VMEM
            # at M=1024, which is exactly the margin that put this
            # kernel at Mosaic's 16 MB scoped-VMEM cliff
            # (tools/profile_pl5.out: 16.97 MB, compile-scheduling-
            # dependent OOM)
            yrO1, yiO1 = dots(fOl[0], fOl[1], ce_ref[:P], se_ref[:P])
            yrO2, yiO2 = dots(fOr[0], fOr[1], ce_ref[P:], se_ref[P:])
            # pk rides in as a tiny (8, M) VMEM input: in-kernel iota
            # generation tripped Mosaic twice (float tpu.iota verifier,
            # then a helper crash on the int variant —
            # tools/profile_pl7.out runs 1-2)
            pk = pk_ref[0:1]
            yr = jnp.stack([yrE, (yrO1 + yrO2) * pk],
                           axis=1).reshape(tile_h, M)
            yi = jnp.stack([yiE, (yiO1 + yiO2) * pk],
                           axis=1).reshape(tile_h, M)

            prev_r = carry[0:1]
            prev_i = carry[1:2]
            sr = jnp.concatenate([prev_r, yr[:-1]], axis=0)
            si = jnp.concatenate([prev_i, yi[:-1]], axis=0)
            re = yr * sr + yi * si
            im = yi * sr - yr * si
            carry[0:1] = yr[-1:]
            carry[1:2] = yi[-1:]
            dbuf[slot] = fast_atan2(im, re).astype(dm_t)
            psum = jnp.sum(re * re + im * im, axis=0, keepdims=True)
            pow_ref[:] = jnp.broadcast_to(psum, (8, M))

        @pl.when(i == nt)
        def _():
            # drain program: no DMA/compute, zero power partial
            pow_ref[:] = jnp.zeros_like(pow_ref)

        # emit tile i-1's phase block: 384 rows of dbuf[prev] + the
        # first sps-1 rows of dbuf[cur] (zeros at the stream end)
        @pl.when(i > 0)
        def _():
            prev = jax.lax.rem(i + 1, 2)    # == (i - 1) % 2
            live = (i < nt).astype(dm_t)
            head = dbuf[slot][: sps - 1] * live
            d = jnp.concatenate([dbuf[prev], head], axis=0)
            # one MXU dot (bf16 operands, f32 accumulation):
            # (tile_h, tile_h+sps-1) x (tile_h+sps-1, M)
            ph = jnp.dot(w_ref[:], d,
                         preferred_element_type=jnp.float32)  # (tile_h, M)
            # (M, tile_h) -> (M*sps, S): row m*sps + p, symbol j — an
            # ALIGNED (sublanes M*sps, lanes S) output block; a tile
            # with sublane dim < 8 (e.g. (M, sps, S)) crashes the
            # remote Mosaic helper (CLAUDE.md).  The consumer's
            # (M, sps, nsym) view is a free major-dim reshape.
            out_ref[:] = ph.T.reshape(M * sps, S).astype(out_ref.dtype)

    return kernel, in_len


def analyze_phases_pallas(x_ext, M: int, T: int, sps: int = 3,
                          tile_h: int = 384, interpret: bool = False):
    """Fused analysis + FM demod + integrate-and-dump: x_ext
    ((Nh + 2T - 1) * P, 2) float32 (history already prepended) ->
    (phases (M, sps, nsym) bfloat16, chan_power (M,) float32), with
    nsym = (Nh - sps + 1) // sps, matching
    rx/correlator.symbol_phase_streams on the XLA demod.

    Requirements: M % 256 == 0 (lane-aligned P), tile_h % (2*sps) == 0,
    hop0_parity 0.  Nh not a multiple of tile_h is handled by zero-
    padding the stream up to the next tile (power and nsym use the REAL
    Nh; the padded tail symbols are sliced off) — power-of-two blocks
    (Nh = 8192) cost one ~3% padding tile.
    """
    P = M // 2
    assert M % 256 == 0 and tile_h % 2 == 0 and tile_h % sps == 0
    n_ext = x_ext.shape[0]
    Nh = (n_ext - (2 * T - 1) * P) // P
    nh_real = Nh
    if Nh % tile_h:
        pad_h = tile_h - Nh % tile_h
        x_ext = jnp.concatenate(
            [jnp.asarray(x_ext, jnp.float32),
             jnp.zeros((pad_h * P, 2), jnp.float32)], axis=0)
        n_ext = x_ext.shape[0]
        Nh += pad_h
    S = tile_h // sps
    bf16_mats = M >= 512
    # demod buffer dtype: f32.  A bf16 buffer was tried to duck the
    # 16 MB scoped-VMEM limit and made it WORSE (22.4 vs 16.97 MB —
    # Mosaic's stack is dominated by the (tile_h, M) f32 elementwise
    # temps and bf16 adds packing conversions, tools/profile_pl5.out);
    # the f32 form compiles (566 s) and is what the cache holds.
    dm_t = jnp.float32
    kernel, in_len = _make_kernel(M, T, sps, tile_h, bf16_mats, dm_t)
    coef = _fold_coef(M, T)
    mat_t = jnp.bfloat16 if bf16_mats else jnp.float32
    # only the even-hop matrices are shipped: the odd bank derives from
    # them in-kernel via the (-1)^k output-sign row (see kernel)
    Ce, Se = (jnp.asarray(a, mat_t) for a in _matrices(M, False))
    # W matches the demod buffer dtype: mixed-dtype dots would upcast
    # the whole (386, M) operand into a scoped f32 VMEM temp.
    W = jnp.asarray(_dump_selector(tile_h, sps), dm_t)
    nt = Nh // tile_h
    x_pl = jnp.swapaxes(jnp.asarray(x_ext, jnp.float32), 0, 1)
    need = (Nh - tile_h) * P + in_len + P
    if need > n_ext:
        x_pl = jnp.pad(x_pl, ((0, 0), (0, need - n_ext)))
    phases, pow_part = pl.pallas_call(
        kernel,
        grid=(nt + 1,),
        out_shape=(jax.ShapeDtypeStruct((M * sps, nt * S), jnp.bfloat16),
                   jax.ShapeDtypeStruct(((nt + 1) * 8, M), jnp.float32)),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),      # x planar, HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),  # coef
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Ce
            pl.BlockSpec(memory_space=pltpu.VMEM),  # Se
            pl.BlockSpec(memory_space=pltpu.VMEM),  # pk odd-bank signs
            pl.BlockSpec(memory_space=pltpu.VMEM),  # dump selector
        ],
        out_specs=(
            pl.BlockSpec((M * sps, S),
                         lambda i: (0, jnp.maximum(i - 1, 0)),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, M), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, 2, in_len), jnp.float32),   # input double buffer
            pltpu.VMEM((2, tile_h, M), dm_t),          # demod double buffer
            pltpu.VMEM((2, M), jnp.float32),           # last-hop IQ carry
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(x_pl, jnp.asarray(coef), Ce, Se,
      jnp.broadcast_to(jnp.asarray(1.0 - 2.0 * (np.arange(M) % 2),
                                   jnp.float32), (8, M)),
      W)
    nsym = (nh_real - sps + 1) // sps
    power = jnp.sqrt(
        jnp.sum(pow_part.reshape(nt + 1, 8, M)[:, 0, :], axis=0)
        / jnp.float32(nh_real))
    phases = phases.reshape(M, sps, nt * S)   # free major-dim split
    return phases[..., :nsym], power
