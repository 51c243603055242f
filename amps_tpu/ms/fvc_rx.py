"""Mobile-side FVC decoder: blank-and-burst voice-channel data.

Burst layout (tx/fvc.py, bit-exact with fvc_words_message,
lib/fvc_impl.cc:109-143): dotting(101) + 11 repeats of [wsync(11) +
word(40)] separated by dotting(37), Manchester encoded.  The mobile
majority-votes the 11 repeats bit-wise before BCH (553 §2.4's repeat
discipline), so a single decode survives deep per-repeat corruption.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np

from amps_tpu.codec.bch import focc_bch_decode
from amps_tpu.tx.focc import WORD_SYNC

_REPEATS = 11
_WORD_BITS = 40


def _dump(symbols, sps: int) -> np.ndarray:
    s = np.asarray(symbols, np.float32)
    nsym = len(s) // sps
    return s[: nsym * sps].reshape(nsym, sps).mean(-1)


def decode_fvc_stream(symbols, sps: int = 1,
                      min_repeats: int = 5) -> Optional[np.ndarray]:
    """±1 FVC samples -> (28,) decoded word bits, or None.

    Scans every symbol phase for word-sync hits, stacks the repeats that
    follow, majority-votes, BCH-decodes.  min_repeats guards against
    decoding from too few sync hits (a truncated tail of a burst).
    """
    best = None
    for ph in range(sps):
        s = _dump(np.asarray(symbols, np.float32)[ph:], sps)
        if len(s) < 2 * (len(WORD_SYNC) + _WORD_BITS):
            continue
        bits = (s[0::2] < 0).astype(np.uint8)
        # correlate bits against word sync (±1 domain for a sharp peak)
        b = 1.0 - 2.0 * bits.astype(np.float32)
        t = 1.0 - 2.0 * WORD_SYNC.astype(np.float32)
        c = np.correlate(b, t, "valid")
        hits = np.where(c >= len(WORD_SYNC) - 0.5)[0]   # exact matches
        words = [bits[h + len(WORD_SYNC): h + len(WORD_SYNC) + _WORD_BITS]
                 for h in hits
                 if h + len(WORD_SYNC) + _WORD_BITS <= len(bits)]
        if len(words) < min_repeats:
            continue
        stack = np.stack(words)
        maj = (stack.sum(0) * 2 >= len(stack)).astype(np.uint8)
        dec, ok = focc_bch_decode(maj[None])
        if bool(np.asarray(ok)[0]):
            cand = (len(words), np.asarray(dec)[0])
            if best is None or cand[0] > best[0]:
                best = cand
    return None if best is None else best[1]
