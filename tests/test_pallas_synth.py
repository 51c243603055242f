"""Synthesis Pallas kernel vs the XLA reference (interpreter mode)."""

import numpy as np
import jax.numpy as jnp

from amps_tpu.dsp import channelizer as chz
from amps_tpu.pallas.synthesizer_kernel import synthesize_pallas


def test_synthesize_kernel_matches_xla():
    M, T = 8, 4
    P = M // 2
    Nh = 256
    tile_h = 64
    rng = np.random.default_rng(0)
    Y = rng.normal(0, 1, (Nh, M, 2)).astype(np.float32)
    h = jnp.asarray(chz.prototype_taps(M, T))
    want, want_carry = chz._synthesize_block(
        Y, h, M, T, jnp.int32(0), jnp.zeros((M * T - P, 2), jnp.float32))
    got, got_carry = synthesize_pallas(Y, M, T, 0, tile_h, interpret=True)
    assert got.shape == np.asarray(want).shape
    assert np.allclose(np.asarray(got), np.asarray(want), atol=2e-4), \
        np.abs(np.asarray(got) - np.asarray(want)).max()
    assert np.allclose(np.asarray(got_carry), np.asarray(want_carry),
                       atol=2e-4)


def test_synthesize_kernel_tile_size_invariance():
    M, T = 8, 4
    Nh = 512
    rng = np.random.default_rng(1)
    Y = rng.normal(0, 1, (Nh, M, 2)).astype(np.float32)
    a, ca = synthesize_pallas(Y, M, T, 0, 64, interpret=True)
    b, cb = synthesize_pallas(Y, M, T, 0, 256, interpret=True)
    assert np.allclose(np.asarray(a), np.asarray(b), atol=2e-4)
    assert np.allclose(np.asarray(ca), np.asarray(cb), atol=2e-4)
