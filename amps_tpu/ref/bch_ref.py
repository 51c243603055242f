"""Oracle BCH(63,51,t=2) codec, bit-for-bit the reference's convention.

The reference encodes via IT++ ``itpp::BCH(63, 2, true)`` (systematic):

* forward (40,28): prepend 23 zero bits to the 28 info bits, systematically
  encode to 63, keep bits 23..62 -> 40-bit word = [28 info | 12 parity]
  (lib/focc_impl.cc:157-176, lib/fvc_impl.cc:98-107);
* reverse (48,36) decode: prepend 15 zeros to the 48 received bits, decode,
  keep info bits 15..50 -> 36 corrected bits (lib/recc_decode_impl.cc:53-79;
  NB the reference then reads 48 bits out of that 36-bit slice — an
  out-of-bounds bug we consciously fix, SURVEY.md §7 quirks).

The generator polynomial for n=63, t=2 over GF(2^6) with primitive
polynomial x^6+x+1 is

    g(x) = m1(x) * m3(x) = x^12 + x^10 + x^8 + x^5 + x^4 + x^3 + 1

which is exactly the BCH polynomial printed in TIA/EIA-553 §2.7.1/§3.7.1
(1010100111001) — so IT++'s table and the AMPS spec agree.  Bit order is
MSB-first (bvec element 0 = highest-degree coefficient), codeword layout
[info | parity].

This oracle works on Python ints / small NumPy arrays; no vectorization.
"""

from __future__ import annotations

import itertools

import numpy as np

N = 63
K = 51
T = 2
NUM_PARITY = N - K  # 12

# g(x) = x^12 + x^10 + x^8 + x^5 + x^4 + x^3 + 1, MSB-first coefficient list.
GEN_POLY_BITS = np.array([1, 0, 1, 0, 1, 0, 0, 1, 1, 1, 0, 0, 1], dtype=np.uint8)

# GF(64) log/antilog tables over primitive polynomial x^6 + x + 1 (0b1000011).
_PRIM_POLY = 0b1000011


def _build_gf64():
    exp = np.zeros(128, dtype=np.int32)
    log = np.zeros(64, dtype=np.int32)
    x = 1
    for i in range(63):
        exp[i] = x
        log[x] = i
        x <<= 1
        if x & 0x40:
            x ^= _PRIM_POLY
    for i in range(63, 128):
        exp[i] = exp[i - 63]
    return exp, log


GF_EXP, GF_LOG = _build_gf64()


def _gf_mul(a: int, b: int) -> int:
    if a == 0 or b == 0:
        return 0
    return int(GF_EXP[(GF_LOG[a] + GF_LOG[b]) % 63])


def _gf_inv(a: int) -> int:
    assert a != 0
    return int(GF_EXP[(63 - GF_LOG[a]) % 63])


def _poly_mod(dividend: np.ndarray, divisor: np.ndarray) -> np.ndarray:
    """GF(2) polynomial remainder; both MSB-first uint8 coefficient arrays."""
    rem = dividend.copy()
    dd = len(divisor)
    for i in range(len(rem) - dd + 1):
        if rem[i]:
            rem[i : i + dd] ^= divisor
    return rem[-(dd - 1) :]


def bch_encode_63(info51: np.ndarray) -> np.ndarray:
    """Systematic encode: 51 info bits (MSB-first) -> 63-bit codeword
    [info | parity]."""
    info51 = np.asarray(info51, dtype=np.uint8)
    assert info51.shape == (K,)
    shifted = np.concatenate([info51, np.zeros(NUM_PARITY, dtype=np.uint8)])
    parity = _poly_mod(shifted, GEN_POLY_BITS)
    return np.concatenate([info51, parity])


def focc_bch_encode(info28: np.ndarray) -> np.ndarray:
    """Forward (40,28): 28 info bits -> 40-bit word (lib/focc_impl.cc:157)."""
    info28 = np.asarray(info28, dtype=np.uint8)
    assert info28.shape == (28,)
    padded = np.concatenate([np.zeros(23, dtype=np.uint8), info28])
    return bch_encode_63(padded)[23:]


def recc_bch_encode(info36: np.ndarray) -> np.ndarray:
    """Reverse (48,36): 36 info bits -> 48-bit word (mobile-side encode; the
    reference only decodes, but the layout is forced by its decode slice
    lib/recc_decode_impl.cc:62-68)."""
    info36 = np.asarray(info36, dtype=np.uint8)
    assert info36.shape == (36,)
    padded = np.concatenate([np.zeros(15, dtype=np.uint8), info36])
    return bch_encode_63(padded)[15:]


def _syndromes(code63: np.ndarray):
    """S1 = r(alpha), S3 = r(alpha^3); r MSB-first so bit i is coeff of
    x^(62-i)."""
    s1 = 0
    s3 = 0
    for i, bit in enumerate(code63):
        if bit:
            e = 62 - i
            s1 ^= int(GF_EXP[e % 63])
            s3 ^= int(GF_EXP[(3 * e) % 63])
    return s1, s3


def bch_decode_63(code63: np.ndarray):
    """Decode a 63-bit word, correcting up to 2 errors.

    Returns (corrected codeword, ok).  ok=False when the syndrome matches no
    <=2-error pattern (mirrors itpp::BCH::decode's validity flag used at
    lib/recc_decode_impl.cc:66).
    """
    code63 = np.asarray(code63, dtype=np.uint8).copy()
    s1, s3 = _syndromes(code63)
    if s1 == 0 and s3 == 0:
        return code63, True
    # Single error at position with alpha^e == s1: requires s3 == s1^3.
    if s1 != 0:
        s1_cubed = _gf_mul(_gf_mul(s1, s1), s1)
        if s1_cubed == s3:
            e = int(GF_LOG[s1])
            code63[62 - e] ^= 1
            return code63, True
        # Two errors: x1+x2 = s1, x1*x2 = (s3 + s1^3)/s1.
        # Solve z^2 + s1 z + p = 0 by exhaustive search over GF(64).
        p = _gf_mul(s3 ^ s1_cubed, _gf_inv(s1))
        roots = [z for z in range(1, 64) if (_gf_mul(z, z) ^ _gf_mul(s1, z) ^ p) == 0]
        if len(roots) == 2:
            for z in roots:
                code63[62 - int(GF_LOG[z])] ^= 1
            return code63, True
    return code63, False


def recc_bch_decode(rx48: np.ndarray):
    """Reverse decode: 48 received bits -> (36 corrected info+parity bits, ok).

    Mirrors lib/recc_decode_impl.cc:53-79 but returns the 36 valid bits only
    (the reference reads 48 — out-of-bounds — see SURVEY §7 quirks).
    """
    rx48 = np.asarray(rx48, dtype=np.uint8)
    assert rx48.shape == (48,)
    padded = np.concatenate([np.zeros(15, dtype=np.uint8), rx48])
    corrected, ok = bch_decode_63(padded)
    return corrected[15:51], ok


def all_correctable_syndromes():
    """Enumerate (syndrome bits -> error pattern) for 0/1/2-error patterns of
    the shortened 48-bit reverse code.  Used to cross-check the JAX LUT."""
    table = {}
    base = np.zeros(48, dtype=np.uint8)
    table[tuple(_syndrome_bits(base))] = ()
    for i in range(48):
        e = base.copy()
        e[i] = 1
        table[tuple(_syndrome_bits(e))] = (i,)
    for i, j in itertools.combinations(range(48), 2):
        e = base.copy()
        e[i] = 1
        e[j] = 1
        table[tuple(_syndrome_bits(e))] = (i, j)
    return table


def _syndrome_bits(rx48: np.ndarray) -> np.ndarray:
    """12 parity-check bits of the shortened 48-bit word: remainder of the
    received polynomial mod g(x) (equivalent information to (S1,S3))."""
    padded = np.concatenate(
        [np.asarray(rx48, dtype=np.uint8), np.zeros(0, dtype=np.uint8)]
    )
    full = np.concatenate([np.zeros(15, dtype=np.uint8), padded])
    return _poly_mod(full, GEN_POLY_BITS)
