"""Vectorized bit expansion/packing (the get8/get32/get64 + expandbits of
lib/amps_packet.h:118-143 and lib/utils.cc:101, as array ops)."""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def expandbits_np(val: int, nbits: int) -> np.ndarray:
    """Host (pure NumPy) MSB-first expansion: int -> (nbits,) uint8.

    Same semantics as ``expandbits`` without a device dispatch — for
    control-plane word building (lib/utils.cc:101)."""
    shifts = np.arange(nbits - 1, -1, -1)
    return ((int(val) >> shifts) & 1).astype(np.uint8)


def expandbits(val, nbits: int):
    """MSB-first expansion: (...,) integer -> (..., nbits) uint8.

    expandbits(6, 3) == [1, 1, 0] (lib/utils.cc:97-100 example).
    """
    val = jnp.asarray(val)
    shifts = jnp.arange(nbits - 1, -1, -1, dtype=val.dtype)
    return ((val[..., None] >> shifts) & 1).astype(jnp.uint8)


def packbits(bits, dtype=jnp.uint32):
    """MSB-first packing: (..., nbits) bits -> (...,) integer."""
    bits = jnp.asarray(bits)
    nbits = bits.shape[-1]
    weights = (jnp.ones((), dtype) << jnp.arange(nbits - 1, -1, -1, dtype=jnp.uint32)).astype(dtype)
    return jnp.sum(bits.astype(dtype) * weights, axis=-1)
