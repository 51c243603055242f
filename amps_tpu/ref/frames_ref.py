"""Oracle FOCC frame/superframe and FVC burst bit layout (NumPy).

Reproduces the segment layout of lib/focc_impl.cc:178-218 (make_frame),
:384-480 (make_superframe / make_registration_superframe) and the FVC burst
of lib/fvc_impl.cc:109-143, down to ±1 symbol streams.

One FOCC frame = 463 bits (validated at lib/focc_impl.cc:246):
    [BI] dot(10) [BI] wsync(11)
    5 x ( [BI] A[0:10] [BI] A[10:20] [BI] A[20:30] [BI] A[30:40]
          [BI] B[0:10] [BI] B[10:20] [BI] B[20:30] [BI] B[30:40] )
= 42 busy-idle bits + 421 message bits.  The busy/idle bit is always 1 in
the reference (set once at lib/focc_impl.cc:111; README.md:54 calls the
write path vestigial).

Manchester convention (focc_segment ctor, lib/amps_packet.h:47): bit 0 ->
(+1, -1), bit 1 -> (-1, +1), each half-symbol repeated samples_per_sym
times.
"""

from __future__ import annotations

import numpy as np

from amps_tpu.ref import bch_ref, words_ref

DOTTING = np.array([1, 0, 1, 0, 1, 0, 1, 0, 1, 0], dtype=np.uint8)
WORD_SYNC = np.array([1, 1, 1, 0, 0, 0, 1, 0, 0, 1, 0], dtype=np.uint8)
FRAME_BITS = 463
FRAMES_PER_SUPERFRAME = 18


def manchester_symbols(bits: np.ndarray, sps: int = 1) -> np.ndarray:
    """bits -> ±1 int8 symbol stream, each half-symbol repeated sps times."""
    bits = np.asarray(bits, dtype=np.uint8)
    first = np.where(bits == 0, 1, -1).astype(np.int8)
    pair = np.stack([first, -first], axis=1).reshape(-1)
    return np.repeat(pair, sps)


def frame_bits(word_a28: np.ndarray, word_b28: np.ndarray,
               busy_idle: int = 1) -> np.ndarray:
    """One 463-bit FOCC frame from two 28-bit (unencoded) words."""
    a = bch_ref.focc_bch_encode(word_a28)
    b = bch_ref.focc_bch_encode(word_b28)
    bi = np.array([busy_idle], dtype=np.uint8)
    parts = [bi, DOTTING, bi, WORD_SYNC]
    for _ in range(5):
        for w in (a, b):
            for chunk in range(4):
                parts.append(bi)
                parts.append(w[chunk * 10 : chunk * 10 + 10])
    out = np.concatenate(parts)
    assert out.shape == (FRAME_BITS,)
    return out


def superframe_words(system=None) -> np.ndarray:
    """The 18 (frame, A/B) word pairs of the steady-state superframe
    (lib/focc_impl.cc:384-418).  Returns (18, 2, 28) uint8."""
    from amps_tpu.config import SystemConfig

    sc = system or SystemConfig()
    w = words_ref
    rows = [
        w.overhead_word_1(sc.dcc, sc.sid, True, False, False, 3),
        w.overhead_word_2(sc.dcc, True, True, True, True, 0, 23, True, True, 23, False),
        w.access_type_parameters_global_action(sc.dcc, False),
        w.registration_id(sc.dcc, 0, True),
    ] + [w.control_filler_word()] * 14
    arr = np.stack([np.stack([r, r]) for r in rows])  # A == B in every frame
    assert arr.shape == (18, 2, 28)
    return arr


def registration_superframe_words(system=None) -> np.ndarray:
    """The 38 word pairs of the aggressive-registration superframe
    (lib/focc_impl.cc:421-480).  Returns (38, 2, 28) uint8."""
    from amps_tpu.config import SystemConfig

    sc = system or SystemConfig()
    w = words_ref

    def half(regid):
        return [
            w.overhead_word_1(sc.dcc, sc.sid, True, False, False, 4),
            w.overhead_word_2(sc.dcc, True, True, True, True, 0, 23, True, True, 23, False),
            w.access_type_parameters_global_action(sc.dcc, False),
            w.registration_increment_global_action(sc.dcc, sc.regincr, False),
            w.registration_id(sc.dcc, regid, True),
        ] + [w.control_filler_word()] * 14

    rows = half(0) + half(500)
    arr = np.stack([np.stack([r, r]) for r in rows])
    assert arr.shape == (38, 2, 28)
    return arr


def superframe_symbols(frame_word_pairs: np.ndarray, sps: int,
                       busy_idle: int = 1) -> np.ndarray:
    """(F, 2, 28) word pairs -> ±1 symbol stream of F frames at sps
    samples/half-symbol (= the focc block's steady-state output,
    lib/focc_impl.cc:583-647)."""
    frames = [
        frame_bits(pair[0], pair[1], busy_idle) for pair in frame_word_pairs
    ]
    return manchester_symbols(np.concatenate(frames), sps)


# ---------------------------------------------------------------------------
# FVC burst (lib/fvc_impl.cc:109-143)
# ---------------------------------------------------------------------------

FVC_BIGDOT = np.array([1, 0] * 50 + [1], dtype=np.uint8)   # 101 bits
FVC_SMALLDOT = np.array([1, 0] * 18 + [1], dtype=np.uint8)  # 37 bits
FVC_BURST_BITS = 101 + 11 * (11 + 40) + 10 * 37  # = 1032 per word


def fvc_burst_bits(word28: np.ndarray) -> np.ndarray:
    """One FVC blank-and-burst data burst for a 28-bit word: bigdot then
    11 repeats of [wsync + 40-bit BCH word] with smalldot between repeats."""
    enc = bch_ref.focc_bch_encode(word28)  # same (40,28) code as FOCC
    parts = [FVC_BIGDOT]
    for j in range(11):
        parts.append(WORD_SYNC)
        parts.append(enc)
        if j < 10:
            parts.append(FVC_SMALLDOT)
    out = np.concatenate(parts)
    assert out.shape == (FVC_BURST_BITS,)
    return out


def fvc_burst_symbols(words28: list, sps: int) -> np.ndarray:
    """Multi-word FVC burst -> ±1 symbols (fvc_impl queues words back to
    back, each with its own bigdot)."""
    bits = np.concatenate([fvc_burst_bits(w) for w in words28])
    return manchester_symbols(bits, sps)


# ---------------------------------------------------------------------------
# RECC burst (mobile side) — for synthesizing receiver test vectors
# (layout per lib/recc_impl.cc:70-79 and lib/recc_decode_impl.cc:89-99)
# ---------------------------------------------------------------------------

RECC_SEIZURE_DOTTING = 30   # dotting bits in the seizure precursor
RECC_TRIGGER_BITS = np.concatenate(
    [np.array([1, 0] * 13, dtype=np.uint8), WORD_SYNC]
)  # last 26 dotting bits + word sync = the reference's memmem trigger
RECC_WORD_REPEATS = 5
RECC_WORDS_MAX = 7


def recc_burst_bits(dcc: int, words36: list) -> np.ndarray:
    """Mobile RECC seizure: [dotting(30) wsync(11)] DCC(7) then per word
    5 repeats of its 48-bit BCH encoding.  Unused word slots are filled with
    dotting filler so the burst always spans 7 words (the receiver captures
    a fixed 3374 symbols, lib/recc_impl.cc:70)."""
    assert len(words36) <= RECC_WORDS_MAX
    coded_dcc = {0: [0, 0, 0, 0, 0, 0, 0],
                 1: [0, 0, 1, 1, 1, 0, 0],
                 2: [1, 1, 0, 0, 0, 1, 1],
                 3: [1, 1, 1, 1, 1, 1, 1]}[dcc]
    parts = [np.array([1, 0] * 15, dtype=np.uint8), WORD_SYNC,
             np.array(coded_dcc, dtype=np.uint8)]
    for w in words36:
        enc = bch_ref.recc_bch_encode(np.asarray(w, dtype=np.uint8))
        for _ in range(RECC_WORD_REPEATS):
            parts.append(enc)
    pad_words = RECC_WORDS_MAX - len(words36)
    if pad_words:
        parts.append(np.tile(np.array([1, 0], dtype=np.uint8),
                             pad_words * RECC_WORD_REPEATS * 24))
    return np.concatenate(parts)


def recc_burst_symbols(dcc: int, words36: list, sps: int = 1) -> np.ndarray:
    return manchester_symbols(recc_burst_bits(dcc, words36), sps)
