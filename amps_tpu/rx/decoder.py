"""RECC burst decoding: Manchester + 5-repeat BCH word decode, batched.

Mirrors bursts_message (lib/recc_decode_impl.cc:81-118): a 3374-symbol
capture is DCC (7 bits Manchester = 14 symbols) + 7 words x 5 repeats x 48
coded bits (x2 symbols).  Per word the reference tries BCH decode on
successive repeats until one succeeds (sequential fallback,
lib/recc_decode_impl.cc:100-107).  We decode ALL 35 repeats of a burst in
one batched syndrome matmul and then select per policy:

* ``first_ok``   — reference-exact: first repeat whose decode succeeds;
* ``majority``   — bit-wise majority vote across the 5 repeats before BCH
  (the spec-recommended combining; strictly better at low SNR, and the
  behavior named in BASELINE.json).  If the majority word fails BCH we
  fall back to first_ok.

Parsing uses the BCH-corrected bits — the reference parses the *raw first
repeat* (lib/recc_decode_impl.cc:112,117) and ignores the corrected output
it just computed; SURVEY.md §7 marks that a bug to fix consciously.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from amps_tpu.codec.bch import (apply_error_pattern, recc_bch_decode,
                                recc_syndrome_packed)
from amps_tpu.codec.manchester import manchester_decode_bits

NUM_WORDS = 7
NUM_REPEATS = 5
WORD_CODED_BITS = 48
DCC_BITS = 7


class DecodedBurst(NamedTuple):
    dcc_bits: jax.Array      # (..., 7) uint8
    words: jax.Array         # (..., 7, 36) uint8 corrected info bits
    word_ok: jax.Array       # (..., 7) bool — any repeat decodable
    repeat_used: jax.Array   # (..., 7) int32 — repeat index selected
    bad_symbols: jax.Array   # (..., 8) int32 Manchester bad counts
                             # (DCC + 7 words, lib/recc_decode_impl.cc:90-98)


@functools.partial(jax.jit, static_argnames=("policy",))
def decode_bursts(symbols, policy: str = "first_ok") -> DecodedBurst:
    """Decode (..., 3374) sliced 0/1 RECC captures."""
    s = jnp.asarray(symbols)
    batch = s.shape[:-1]
    word_sym = s[..., 2 * DCC_BITS:].reshape(batch + (NUM_WORDS, 480))

    # DCC bits via one-hot matmul over the full capture width: a
    # stride-2 slice of 7 columns is a lane-granularity gather that
    # measured ~0.45 ms of the 1024-ch pipeline; the matmul re-reads a
    # plane the MXU streams at full rate (tools/profile_dec7.out,
    # slice 1380 -> matmul 1533 Msps).  Bit value = complement of the
    # first half-symbol, exactly manchester_decode_bits' convention.
    sel = np.zeros((s.shape[-1], DCC_BITS), np.float32)
    sel[np.arange(0, 2 * DCC_BITS, 2), np.arange(DCC_BITS)] = 1.0
    picked = jnp.matmul(s.astype(jnp.bfloat16), jnp.asarray(sel, jnp.bfloat16),
                        preferred_element_type=jnp.float32)
    dcc_bits = (1.0 - picked).astype(jnp.uint8)
    # bad count = pairs whose halves agree, from a CONTIGUOUS
    # adjacent-xor masked to even offsets (no strided views)
    agree = 1 - jnp.bitwise_xor(
        s[..., : 2 * DCC_BITS - 1], s[..., 1: 2 * DCC_BITS]).astype(jnp.int32)
    mask = jnp.asarray((1 - np.arange(2 * DCC_BITS - 1) % 2).astype(np.int32))
    dcc_bad = jnp.sum(agree * mask, axis=-1)

    word_bits, word_bad = manchester_decode_bits(word_sym)  # (...,7,240)
    reps = word_bits.reshape(batch + (NUM_WORDS, NUM_REPEATS, WORD_CODED_BITS))

    # Select-then-correct: rank the 5 repeats on their packed syndrome
    # LUT values (one int32 per repeat), one-hot select the winning
    # repeat's RAW bits + LUT value, and build the <=2-bit error pattern
    # ONCE for the selected repeat.  Correction commutes with selection
    # (each repeat's correction depends only on its own syndrome), so
    # this is output-identical to correcting all 5 repeats first — but
    # never materializes the (..., 7, 5, 36) corrected tensor and does
    # 1/5 the iota-compare/xor work.  Invalid syndromes carry sentinel
    # positions (255) that flip nothing, so not-ok words still pass
    # through their raw first-repeat bits exactly as before.
    g = recc_syndrome_packed(reps)                            # (...,7,5) i32
    ok = (g & (1 << 16)) != 0
    first_idx = jnp.argmax(ok, axis=-1)                       # (...,7)
    any_ok = jnp.any(ok, axis=-1)
    onehot = (jnp.arange(NUM_REPEATS) == first_idx[..., None])
    g_sel = jnp.sum(g * onehot, axis=-1)                      # (...,7)
    rep_sel = jnp.sum(
        reps * onehot[..., None].astype(reps.dtype), axis=-2) \
        .astype(reps.dtype)                                   # (...,7,48)
    first_words = apply_error_pattern(rep_sel, g_sel, 36)

    if policy == "first_ok":
        words, used, wok = first_words, first_idx, any_ok
    elif policy == "majority":
        votes = jnp.sum(reps.astype(jnp.int32), axis=-2)      # (...,7,48)
        maj = (votes * 2 > NUM_REPEATS).astype(jnp.uint8)
        mdec, mok = recc_bch_decode(maj)
        words = jnp.where(mok[..., None], mdec, first_words)
        used = jnp.where(mok, jnp.int32(-1), first_idx)       # -1 = majority
        wok = mok | any_ok
    else:
        raise ValueError(f"unknown repeat policy {policy!r}")

    bad = jnp.concatenate([dcc_bad[..., None], word_bad], axis=-1)
    return DecodedBurst(dcc_bits, words, wok, used, bad.astype(jnp.int32))


def decode_burst(symbols, policy: str = "first_ok") -> DecodedBurst:
    """Single-capture convenience wrapper."""
    return decode_bursts(symbols, policy)
