"""Fused Pallas synthesis-channelizer kernel (dual of the analysis one).

Per tile of TILE_H hops, in VMEM:
  1. inverse channel transform u_n[m] = sum_k (-1)^{kn} Y_k[n] E+[k,m]
     as MXU matmuls, hop parity split so the sign bakes into the odd
     matrices;
  2. windowed overlap-add: output P-sample block b accumulates
     g[tM+p] * uL[b-2t] (even taps) + g[tM+P+p] * uR[b-2t-1] (odd taps)
     where uL/uR are the halves of u — T shifted MACs per parity, the
     exact transpose of the analysis fold;
  3. the tile emits its tile_h*P main samples plus an (2T-1)*P tail;
     tails overlap into the NEXT tile's head and are added back in
     XLA-land by the wrapper (the streaming carry, intra-call).

Same Mosaic rules as the analysis kernel: planar (2, n) layouts,
128-lane-aligned DMA/blocks.
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
def _inv_matrices(M: int, odd_parity_signs: bool):
    """(M, M) E+[k, m] cos/sin, contract on axis 0 (k); odd variant
    scaled by (-1)^k."""
    C, S = chz._dft_mats(M)
    if odd_parity_signs:
        pk = (1.0 - 2.0 * (np.arange(M) % 2))[:, None]
        C = C * pk
        S = S * pk
    return C.astype(np.float32), S.astype(np.float32)


@functools.cache
def _ola_coef(M: int, T: int):
    """(T, M) g[t*M + q] * P (the unit-roundtrip gain of the XLA path),
    split by the wrapper into even (q < P) / odd (q >= P) halves."""
    g = chz.prototype_taps(M, T) * (M // 2)
    return np.ascontiguousarray(g.reshape(T, M)).astype(np.float32)


def _make_kernel(M: int, T: int, tile_h: int):
    P = M // 2
    half = tile_h // 2
    nblk_out = tile_h + 2 * T - 1

    def kernel(ye_ref, yo_ref, ce_ref, se_ref, co_ref, so_ref, g_ref,
               main_ref, tail_ref):
        # ye/yo: (2, half, M) planar iq blocks of even/odd hops
        def transform(y_ref, c_ref, s_ref):
            yr, yi = y_ref[0], y_ref[1]
            C = c_ref[:]
            S = s_ref[:]
            ur = (jnp.dot(yr, C, preferred_element_type=jnp.float32)
                  - jnp.dot(yi, S, preferred_element_type=jnp.float32))
            ui = (jnp.dot(yr, S, preferred_element_type=jnp.float32)
                  + jnp.dot(yi, C, preferred_element_type=jnp.float32))
            return ur, ui                    # (half, M)

        urE, uiE = transform(ye_ref, ce_ref, se_ref)
        urO, uiO = transform(yo_ref, co_ref, so_ref)
        # interleave to hop order: u (tile_h, M) per iq component
        ur = jnp.stack([urE, urO], axis=1).reshape(tile_h, M)
        ui = jnp.stack([uiE, uiO], axis=1).reshape(tile_h, M)
        g = g_ref[:]                         # (T, M)

        def ola(u):                          # u (tile_h, M) -> (nblk_out, M)
            # pad so row index b-2t (and b-2t-1) is always in range
            up = jnp.pad(u, ((2 * T, 2 * T), (0, 0)))
            acc = jnp.zeros((nblk_out, M), jnp.float32)
            for t in range(T):
                geo = g[t]                   # (M,): [even half | odd half]
                sl_e = up[2 * T - 2 * t: 2 * T - 2 * t + nblk_out]
                sl_o = up[2 * T - 2 * t - 1: 2 * T - 2 * t - 1 + nblk_out]
                # even taps read uL (cols :P), odd taps read uR (cols P:)
                contrib = jnp.concatenate(
                    [sl_e[:, :P] * geo[:P], sl_o[:, P:] * geo[P:]], axis=1)
                acc = acc + contrib
            return acc

        # out block b, phase p: even-tap term uses u[b-2t][p] (left half
        # cols) scaled g[tM+p]; odd-tap term u[b-2t-1][P+p] scaled
        # g[tM+P+p].  acc columns [0:P) and [P:2P) hold the two terms'
        # sums for the SAME output sample (bP+p) — add them.
        accr = ola(ur)
        acci = ola(ui)
        outr = accr[:, :P] + accr[:, P:]
        outi = acci[:, :P] + acci[:, P:]
        flatr = outr.reshape(1, nblk_out * P)
        flati = outi.reshape(1, nblk_out * P)
        full = jnp.concatenate([flatr, flati], axis=0)  # (2, nblk_out*P)
        main_ref[:] = full[:, : tile_h * P]
        tail_ref[0] = full[:, tile_h * P:]

    return kernel


def synthesize_pallas(Y, M: int, T: int, hop0_parity: int = 0,
                      tile_h: int = 256, interpret: bool = False):
    """Y (Nh, M, 2) hop-major channel basebands -> (Nh*P, 2) wideband +
    (L-P, 2) final carry tail (matching chz._synthesize_block with zero
    carry-in).  Nh % tile_h == 0; hop0_parity must be even."""
    P = M // 2
    L = M * T
    assert hop0_parity % 2 == 0
    Nh = Y.shape[0]
    assert Nh % tile_h == 0, (Nh, tile_h)
    half = tile_h // 2
    grid_n = Nh // tile_h
    Ce, Se = _inv_matrices(M, False)
    Co, So = _inv_matrices(M, True)
    g = _ola_coef(M, T)
    # planar parity-split inputs: (2, Nh/2, M) each
    Yp = jnp.moveaxis(jnp.asarray(Y, jnp.float32), -1, 0)   # (2, Nh, M)
    Ye = Yp[:, 0::2]
    Yo = Yp[:, 1::2]
    kernel = _make_kernel(M, T, tile_h)
    main, tails = pl.pallas_call(
        kernel,
        grid=(grid_n,),
        out_shape=(
            jax.ShapeDtypeStruct((2, Nh * P), jnp.float32),
            jax.ShapeDtypeStruct((grid_n, 2, (2 * T - 1) * P), jnp.float32),
        ),
        in_specs=[
            pl.BlockSpec((2, half, M), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, half, M), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((2, tile_h * P), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, (2 * T - 1) * P), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(Ye, Yo, jnp.asarray(Ce), jnp.asarray(Se), jnp.asarray(Co),
      jnp.asarray(So), jnp.asarray(g))
    # add each tile's tail into the next tile's head (XLA-land carry)
    if grid_n > 1:
        # tails[i] lands at offset (i+1)*tile_h*P
        pad = jnp.zeros((2, Nh * P), jnp.float32)
        for i in range(grid_n - 1):
            pad = jax.lax.dynamic_update_slice(
                pad, tails[i], (0, (i + 1) * tile_h * P))
        main = main + pad
    x = jnp.moveaxis(main, 0, -1)                            # (Nh*P, 2)
    return x, jnp.moveaxis(tails[-1], 0, -1)                 # carry (L-P, 2)