"""Self-consistency tests for the NumPy oracle (amps_tpu.ref).

These pin down the reference's bit conventions (SURVEY.md §7 step 0) before
any JAX code is checked against them.
"""

import numpy as np
import pytest

from amps_tpu.ref import bch_ref, frames_ref, words_ref


# ---------------------------------------------------------------------------
# BCH
# ---------------------------------------------------------------------------

def test_generator_poly_is_amps_spec():
    # TIA/EIA-553 prints the BCH generator as 1010100111001.
    assert "".join(map(str, bch_ref.GEN_POLY_BITS)) == "1010100111001"


def test_encode_is_codeword(rng):
    for _ in range(50):
        info = rng.integers(0, 2, 51).astype(np.uint8)
        code = bch_ref.bch_encode_63(info)
        assert code.shape == (63,)
        assert np.array_equal(code[:51], info)  # systematic
        # codeword polynomial divisible by g(x)
        rem = bch_ref._poly_mod(code, bch_ref.GEN_POLY_BITS)
        assert not rem.any()


def test_focc_encode_shape_and_systematic(rng):
    info = rng.integers(0, 2, 28).astype(np.uint8)
    word = bch_ref.focc_bch_encode(info)
    assert word.shape == (40,)
    assert np.array_equal(word[:28], info)


@pytest.mark.parametrize("nerr", [0, 1, 2])
def test_decode_corrects_errors(rng, nerr):
    for _ in range(30):
        info = rng.integers(0, 2, 36).astype(np.uint8)
        tx = bch_ref.recc_bch_encode(info)
        rx = tx.copy()
        pos = rng.choice(48, size=nerr, replace=False)
        rx[pos] ^= 1
        dec, ok = bch_ref.recc_bch_decode(rx)
        assert ok
        assert np.array_equal(dec[:36], info)


def test_decode_flags_three_errors(rng):
    flagged_or_wrong = 0
    trials = 30
    for _ in range(trials):
        info = rng.integers(0, 2, 36).astype(np.uint8)
        tx = bch_ref.recc_bch_encode(info)
        rx = tx.copy()
        pos = rng.choice(48, size=3, replace=False)
        rx[pos] ^= 1
        dec, ok = bch_ref.recc_bch_decode(rx)
        # a t=2 code either flags >=3 errors or miscorrects; it must never
        # silently return the clean word as "ok" with matching info unless
        # the pattern aliases into another codeword's correction sphere
        if not ok or not np.array_equal(dec[:36], info):
            flagged_or_wrong += 1
    assert flagged_or_wrong == trials


def test_syndrome_table_is_perfect_over_correctables():
    table = bch_ref.all_correctable_syndromes()
    # 1 zero-syndrome + 48 single + C(48,2) double patterns, all distinct
    assert len(table) == 1 + 48 + 48 * 47 // 2


# ---------------------------------------------------------------------------
# Words
# ---------------------------------------------------------------------------

def test_focc_word1_layout():
    w = words_ref.focc_word1(True, 0b10, 0xABCDEF)
    assert w.shape == (28,)
    assert w[0] == 0 and w[1] == 1
    assert (w[2], w[3]) == (1, 0)
    assert words_ref.getbits(w, 4, 24) == 0xABCDEF


def test_focc_word2_general_layout():
    w = words_ref.focc_word2_general(0x2AA, 0b10101, 0b011, 0b00111)
    assert tuple(w[:4]) == (1, 0, 1, 1)
    assert words_ref.getbits(w, 4, 10) == 0x2AA
    assert w[14] == 0
    assert words_ref.getbits(w, 15, 5) == 0b10101
    assert words_ref.getbits(w, 20, 3) == 0b011
    assert words_ref.getbits(w, 23, 5) == 0b00111


def test_voice_channel_word_layout():
    w = words_ref.focc_word2_voice_channel(1, 0x155, 5, 355)
    assert tuple(w[:4]) == (1, 0, 0, 1)  # SCC=01
    assert words_ref.getbits(w, 4, 10) == 0x155
    assert words_ref.getbits(w, 14, 3) == 5
    assert words_ref.getbits(w, 17, 11) == 355


def test_control_filler_word_value():
    w = words_ref.control_filler_word()
    assert "".join(map(str, w)) == "1100010111000001100111111001"


def test_recc_word_b_roundtrip():
    # Build word-B bits by hand, parse them back.
    bits = np.zeros(36, dtype=np.uint8)
    bits[0] = 1                                        # F
    bits[1:4] = words_ref.expandbits(3, 5)             # NAWC
    bits[4:9] = words_ref.expandbits(5, 0b01101)       # MSG_TYPE
    bits[9:12] = words_ref.expandbits(3, 0b101)        # ORDQ
    bits[12:17] = words_ref.expandbits(5, 0b01101)     # ORDER
    bits[26:36] = words_ref.expandbits(10, 777)        # MIN2
    d = words_ref.parse_recc_word_b(bits)
    assert d["NAWC"] == 5
    assert d["MSG_TYPE"] == 0b01101
    assert d["ORDQ"] == 0b101
    assert d["ORDER"] == 0b01101
    assert d["MIN2"] == 777


# ---------------------------------------------------------------------------
# MIN codec
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("min_str", [
    "5551234567", "0000000000", "9999999999", "1234567890", "5550001000",
])
def test_min_roundtrip(min_str):
    min1, min2 = words_ref.parse_min(min_str)
    assert words_ref.calc_min(min1, min2) == min_str
    assert min1 < (1 << 24) and min2 < (1 << 10)


def test_min_invalid():
    assert words_ref.parse_min("12345678901") is None   # too long
    assert words_ref.parse_min("555123456a") is None    # non-digit
    assert words_ref.parse_min("") is None


def test_called_digits_roundtrip():
    for s in ["5551234567"[:8], "0", "18005551", "*99#", "911"]:
        v = words_ref.encode_called_digits(s)
        assert words_ref.called_digits(v) == s


# ---------------------------------------------------------------------------
# Frames
# ---------------------------------------------------------------------------

def test_frame_is_463_bits():
    w = words_ref.control_filler_word()
    f = frames_ref.frame_bits(w, w)
    assert f.shape == (463,)


def test_superframe_symbol_invariants():
    """The testalloc.cc invariants (apps/testalloc.cc:70-97): every symbol
    repeated exactly sps times, no zeros, every pair valid Manchester."""
    sps = 5
    words = frames_ref.superframe_words()
    syms = frames_ref.superframe_symbols(words, sps)
    assert syms.shape == (18 * 463 * 2 * sps,)
    assert not (syms == 0).any()
    runs = syms.reshape(-1, sps)
    assert (runs == runs[:, :1]).all()          # sps-repeat invariant
    halves = runs[:, 0].reshape(-1, 2)
    assert (halves[:, 0] == -halves[:, 1]).all()  # valid Manchester pairs


def test_fvc_burst_length():
    w = words_ref.fvc_word1_general(1, 0, 0, 1)
    bits = frames_ref.fvc_burst_bits(w)
    assert bits.shape == (1032,)
    syms = frames_ref.fvc_burst_symbols([w], 5)
    assert syms.shape == (1032 * 2 * 5,)


def test_recc_burst_length():
    words = [np.random.default_rng(1).integers(0, 2, 36).astype(np.uint8)
             for _ in range(3)]
    bits = frames_ref.recc_burst_bits(0, words)
    # seizure 41 bits (30 dotting + 11 wsync) + DCC 7 + 7*240
    assert bits.shape == (41 + 7 + 7 * 240,)
    syms = frames_ref.recc_burst_symbols(0, words)
    # post-trigger capture region must be 3374 symbols (lib/recc_impl.cc:70)
    trigger = frames_ref.manchester_symbols(frames_ref.RECC_TRIGGER_BITS)
    # find trigger in the symbol stream
    n = len(trigger)
    found = -1
    for off in range(len(syms) - n):
        if np.array_equal(syms[off:off + n], trigger):
            found = off
            break
    assert found >= 0
    assert len(syms) - (found + n) == 3374


def test_ref_quarantine_is_structural():
    """ref/ is a test-only oracle (CLAUDE.md invariant): no product module
    under amps_tpu/ (outside ref/ itself) may import amps_tpu.ref.
    Guards the VERDICT r2 weak-5 leak (tx/recc_ms.py) from regressing."""
    import pathlib
    import re
    root = pathlib.Path(__file__).resolve().parent.parent / "amps_tpu"
    bad = []
    for p in root.rglob("*.py"):
        if (root / "ref") in p.parents:
            continue
        src = p.read_text()
        for ln, line in enumerate(src.splitlines(), 1):
            code = line.split("#", 1)[0]
            if re.search(r"^\s*(from\s+(amps_tpu\.ref|\.\.?ref)\b"
                         r"|import\s+amps_tpu\.ref\b"
                         r"|from\s+amps_tpu\s+import\s+.*\bref\b)", code):
                bad.append(f"{p.relative_to(root.parent)}:{ln}: {line.strip()}")
    assert not bad, "amps_tpu.ref imported from product code:\n" + "\n".join(bad)
