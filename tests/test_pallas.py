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
