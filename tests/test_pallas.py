"""Pallas kernels vs their XLA reference implementations (interpreter
mode on the CPU test mesh; compiled path exercised by bench on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from amps_tpu.dsp import channelizer as chz
from amps_tpu.pallas.channelizer_kernel import analyze_chmajor_pallas


def test_analyze_kernel_matches_xla():
    M, T = 8, 4
    P = M // 2
    tile_h = 64
    Nh = 256
    n_ext = (Nh + 2 * T - 1) * P
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (n_ext, 2)).astype(np.float32)
    h = jnp.asarray(chz.prototype_taps(M, T))
    want = np.asarray(chz._analyze_block_chmajor(x, h, M, T, jnp.int32(0)))
    got = np.asarray(analyze_chmajor_pallas(x, M, T, 0, tile_h,
                                            interpret=True))
    assert got.shape == want.shape == (M, Nh, 2)
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_analyze_kernel_rejects_odd_parity():
    with pytest.raises(AssertionError):
        analyze_chmajor_pallas(np.zeros((1024, 2), np.float32), 8, 4,
                               hop0_parity=1, tile_h=64, interpret=True)


def test_analyze_kernel_multi_tile_continuity():
    """Tile boundaries must be seamless (the DMA overlap covers them)."""
    M, T = 8, 4
    P = M // 2
    Nh = 512
    n_ext = (Nh + 2 * T - 1) * P
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (n_ext, 2)).astype(np.float32)
    a = np.asarray(analyze_chmajor_pallas(x, M, T, 0, 64, interpret=True))
    b = np.asarray(analyze_chmajor_pallas(x, M, T, 0, 256, interpret=True))
    assert np.allclose(a, b, atol=2e-4)


def test_fused_rx_front_kernel_matches_xla():
    """analyze+demod fused kernel == XLA analyze -> quadrature demod
    (prev=None) including band power and tile-boundary carry."""
    from amps_tpu.dsp.fm import quadrature_demod_planar
    from amps_tpu.pallas.rx_front_kernel import analyze_demod_pallas

    M, T = 256, 4
    P = M // 2
    Nh = 256
    n_ext = (Nh + 2 * T - 1) * P
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (n_ext, 2)).astype(np.float32)
    h = jnp.asarray(chz.prototype_taps(M, T))
    ypl = chz._analyze_block_chmajor(x, h, M, T, jnp.int32(0), planar=True)
    want_d, _, want_p = quadrature_demod_planar(ypl[0], ypl[1],
                                                return_power=True)
    for tile_h in (64, 128):
        got_d, got_p = analyze_demod_pallas(x, M, T, tile_h=tile_h,
                                            interpret=True)
        assert got_d.shape == (M, Nh) and got_p.shape == (M,)
        dd = np.abs(np.asarray(got_d, np.float32) - np.asarray(want_d))
        # bf16 demod output: tolerance is the bf16 quantization of ±π
        assert dd.max() < 0.03, dd.max()
        assert np.allclose(np.asarray(got_p), np.asarray(want_p),
                           rtol=1e-3), (got_p[:4], want_p[:4])
