"""Golden tests: JAX codec (amps_tpu.codec) vs the NumPy oracle."""

import numpy as np
import pytest

from amps_tpu.codec import bch, bits, manchester, words
from amps_tpu.ref import bch_ref, frames_ref, words_ref


# ---------------------------------------------------------------------------
# bits
# ---------------------------------------------------------------------------

def test_expandbits_matches_oracle(rng):
    for nbits in (1, 3, 10, 24):
        vals = rng.integers(0, 1 << nbits, 16)
        got = np.asarray(bits.expandbits(vals.astype(np.uint32), nbits))
        want = np.stack([words_ref.expandbits(nbits, int(v)) for v in vals])
        assert np.array_equal(got, want)


def test_packbits_roundtrip(rng):
    arr = rng.integers(0, 2, (5, 24)).astype(np.uint8)
    packed = np.asarray(bits.packbits(arr))
    want = [words_ref.getbits(a, 0, 24) for a in arr]
    assert np.array_equal(packed, want)


# ---------------------------------------------------------------------------
# BCH
# ---------------------------------------------------------------------------

def test_focc_encode_golden(rng):
    infos = rng.integers(0, 2, (64, 28)).astype(np.uint8)
    got = np.asarray(bch.focc_bch_encode(infos))
    want = np.stack([bch_ref.focc_bch_encode(i) for i in infos])
    assert np.array_equal(got, want)


def test_recc_encode_golden(rng):
    infos = rng.integers(0, 2, (64, 36)).astype(np.uint8)
    got = np.asarray(bch.recc_bch_encode(infos))
    want = np.stack([bch_ref.recc_bch_encode(i) for i in infos])
    assert np.array_equal(got, want)


@pytest.mark.parametrize("nerr", [0, 1, 2])
def test_recc_decode_corrects(rng, nerr):
    infos = rng.integers(0, 2, (32, 36)).astype(np.uint8)
    tx = np.asarray(bch.recc_bch_encode(infos))
    rx = tx.copy()
    for r in rx:
        pos = rng.choice(48, size=nerr, replace=False)
        r[pos] ^= 1
    dec, ok = bch.recc_bch_decode(rx)
    assert np.asarray(ok).all()
    assert np.array_equal(np.asarray(dec), infos)


def test_recc_decode_matches_oracle_on_noise(rng):
    """On random garbage, the valid flag and corrections must agree with the
    oracle's algebraic decoder."""
    rx = rng.integers(0, 2, (48, 48)).astype(np.uint8)
    dec, ok = bch.recc_bch_decode(rx)
    dec, ok = np.asarray(dec), np.asarray(ok)
    for i in range(len(rx)):
        want_dec, want_ok = bch_ref.recc_bch_decode(rx[i])
        assert ok[i] == want_ok
        if want_ok:
            assert np.array_equal(dec[i], want_dec)


def test_focc_decode_roundtrip(rng):
    infos = rng.integers(0, 2, (32, 28)).astype(np.uint8)
    tx = np.asarray(bch.focc_bch_encode(infos))
    rx = tx.copy()
    for r in rx:
        pos = rng.choice(40, size=2, replace=False)
        r[pos] ^= 1
    dec, ok = bch.focc_bch_decode(rx)
    assert np.asarray(ok).all()
    assert np.array_equal(np.asarray(dec), infos)


# ---------------------------------------------------------------------------
# Manchester
# ---------------------------------------------------------------------------

def test_manchester_encode_golden(rng):
    bits_in = rng.integers(0, 2, (4, 100)).astype(np.uint8)
    for sps in (1, 5):
        got = np.asarray(manchester.manchester_encode_symbols(bits_in, sps))
        want = np.stack([frames_ref.manchester_symbols(b, sps) for b in bits_in])
        assert np.array_equal(got, want)


def test_manchester_decode_golden(rng):
    # random sliced symbols incl. invalid pairs; match lib/utils.cc table
    syms = rng.integers(0, 2, (8, 96)).astype(np.uint8)
    got_bits, got_bad = manchester.manchester_decode_bits(syms)
    got_bits, got_bad = np.asarray(got_bits), np.asarray(got_bad)
    for row in range(8):
        want = np.zeros(48, dtype=np.uint8)
        bad = 0
        for i in range(48):
            a, b = syms[row, 2 * i], syms[row, 2 * i + 1]
            if (a, b) == (1, 0):
                want[i] = 0
            elif (a, b) == (0, 1):
                want[i] = 1
            elif (a, b) == (1, 1):
                want[i] = 0
                bad += 1
            else:
                want[i] = 1
                bad += 1
        assert np.array_equal(got_bits[row], want)
        assert got_bad[row] == bad


def test_manchester_encode_decode_roundtrip(rng):
    bits_in = rng.integers(0, 2, 200).astype(np.uint8)
    syms = manchester.manchester_encode_symbols(bits_in, 1)
    hard = manchester.slice_symbols(syms)
    out, bad = manchester.manchester_decode_bits(hard)
    assert np.array_equal(np.asarray(out), bits_in)
    assert int(bad) == 0


# ---------------------------------------------------------------------------
# Words
# ---------------------------------------------------------------------------

def test_word_builders_golden(rng):
    cases = [
        (words.focc_word1(True, 2, 0xABCDEF),
         words_ref.focc_word1(True, 2, 0xABCDEF)),
        (words.focc_word2_general(777, 0, 0, 7),
         words_ref.focc_word2_general(777, 0, 0, 7)),
        (words.focc_word2_voice_channel(1, 333, 0, 355),
         words_ref.focc_word2_voice_channel(1, 333, 0, 355)),
        (words.fvc_word1_general(1, 0, 0, 1),
         words_ref.fvc_word1_general(1, 0, 0, 1)),
        (words.overhead_word_1(0, 16, True, False, False, 3),
         words_ref.overhead_word_1(0, 16, True, False, False, 3)),
        (words.overhead_word_2(0, 1, 1, 1, 1, 0, 23, 1, 1, 23, 0),
         words_ref.overhead_word_2(0, True, True, True, True, 0, 23, True,
                                   True, 23, False)),
        (words.control_filler_word(), words_ref.control_filler_word()),
        (words.access_type_parameters_global_action(0, False),
         words_ref.access_type_parameters_global_action(0, False)),
        (words.registration_increment_global_action(0, 100, False),
         words_ref.registration_increment_global_action(0, 100, False)),
        (words.registration_id(0, 500, True),
         words_ref.registration_id(0, 500, True)),
    ]
    for got, want in cases:
        got = np.asarray(got)
        assert got.shape == (28,)
        assert np.array_equal(got, want), (got, want)


def test_word_builders_batched(rng):
    min1s = rng.integers(0, 1 << 24, 16).astype(np.uint32)
    batch = np.asarray(words.focc_word1(True, 0, min1s))
    assert batch.shape == (16, 28)
    for i, m in enumerate(min1s):
        assert np.array_equal(batch[i], words_ref.focc_word1(True, 0, int(m)))


def test_recc_parsers_golden(rng):
    b36 = rng.integers(0, 2, (8, 36)).astype(np.uint8)
    pa = words.parse_recc_word_a(b36)
    pb = words.parse_recc_word_b(b36)
    for i in range(8):
        wa = words_ref.parse_recc_word_a(b36[i])
        wb = words_ref.parse_recc_word_b(b36[i])
        assert int(pa["MIN1"][i]) == wa["MIN1"]
        assert int(pa["NAWC"][i]) == wa["NAWC"]
        assert int(pa["T"][i]) == int(wa["T"])
        assert int(pa["SCM"][i]) == wa["SCM"]
        assert int(pb["ORDER"][i]) == wb["ORDER"]
        assert int(pb["ORDQ"][i]) == wb["ORDQ"]
        assert int(pb["MSG_TYPE"][i]) == wb["MSG_TYPE"]
        assert int(pb["MIN2"][i]) == wb["MIN2"]
        assert int(pb["SDCC1"][i]) == wb["SDCC1"]


def test_packed_lut_split_components_bf16_exact():
    """The syndrome-LUT lookup runs at DEFAULT matmul precision, where
    the TPU lowers f32 contractions to bf16 MXU input passes.  The r2
    chip incident: packed 2^17-magnitude values rounded to multiples of
    512 — every BCH decode rejected on chip while CPU stayed green
    (tools/soak_tpu.out).  The split-component form keeps every operand
    <= 255 (exact in bf16) and rebuilds the packed value in f32.  CPU
    cannot reproduce the MXU rounding, so guard the property directly:

    1. every component-plane value must survive a bf16 round-trip;
    2. the FULL lookup over all 4096 syndromes, with every contraction
       operand explicitly pre-rounded to bf16 (emulating the MXU input
       pass), must equal the numpy table bit-exactly;
    3. the packed rebuild must stay below f32's 2^24 integer-exact
       range."""
    import jax.numpy as jnp
    from amps_tpu.codec.bch import (_split_component_tables,
                                    packed_lut_lookup,
                                    recc_decode_table_packed)

    table = recc_decode_table_packed()
    comp = _split_component_tables(table.tobytes(), table.shape)
    # 1: bf16-exact component planes (integers <= 256 are representable)
    assert comp.max() <= 255
    assert np.array_equal(
        np.asarray(jnp.asarray(comp).astype(jnp.bfloat16), np.float32),
        comp)
    # 3: packed rebuild headroom
    assert int((comp[..., 0] + 256 * comp[..., 1]
                + 65536 * comp[..., 2]).max()) < 2 ** 24

    # 2: emulate the MXU bf16 input pass end to end
    idx = jnp.arange(4096, dtype=jnp.int32)
    T2 = jnp.asarray(comp).astype(jnp.bfloat16).astype(jnp.float32)
    oh_a = ((idx >> 8)[..., None] == jnp.arange(16)) \
        .astype(jnp.bfloat16).astype(jnp.float32)
    oh_r = ((idx & 0xFF)[..., None] == jnp.arange(256)) \
        .astype(jnp.bfloat16).astype(jnp.float32)
    g1 = jnp.einsum("ard,...r->...ad", T2, oh_r)
    comp_sel = jnp.einsum("...ad,...a->...d", g1, oh_a)
    packed = (comp_sel[..., 0] + 256.0 * comp_sel[..., 1]
              + 65536.0 * comp_sel[..., 2]).astype(jnp.int32)
    assert np.array_equal(np.asarray(packed), table)
    # and the product lookup itself agrees on every syndrome
    assert np.array_equal(np.asarray(packed_lut_lookup(idx, table)), table)


def _all_patterns(n):
    import itertools
    return ([()] + [(i,) for i in range(n)]
            + list(itertools.combinations(range(n), 2)))


def test_bm_cross_check_recc_all_1177_patterns():
    """VERDICT r1 item 6: a second, algorithmically independent decoder
    (Berlekamp-Massey + Chien over GF(2^6), ref/bm_ref.py) agrees with
    BOTH the product syndrome-LUT decoder and the exhaustive-root oracle
    on every one of the 1177 <=2-error patterns of the shortened (48,36)
    reverse code — pinning the IT++ conventions (the 15-zero prefix of
    lib/recc_decode_impl.cc:55-68) without IT++ in the image."""
    import jax.numpy as jnp
    from amps_tpu.ref import bm_ref

    rng = np.random.default_rng(5)
    info = rng.integers(0, 2, 36).astype(np.uint8)
    code = np.asarray(bch_ref.recc_bch_encode(info))
    pats = _all_patterns(48)
    assert len(pats) == 1177
    rx = np.tile(code, (len(pats), 1))
    for r, p in zip(rx, pats):
        for i in p:
            r[i] ^= 1
    dec, ok = bch.recc_bch_decode(jnp.asarray(rx))
    dec, ok = np.asarray(dec), np.asarray(ok)
    assert ok.all()
    assert (dec == info).all()
    for r in rx:
        got, bok = bm_ref.recc_bm_decode(r)
        assert bok and np.array_equal(got, info)


def test_bm_cross_check_focc_all_821_patterns():
    """Same three-way agreement for the forward (40,28) code and its
    23-zero prefix (lib/focc_impl.cc:157-176): all 821 <=2-error
    patterns decode identically under the product LUT decoder and the
    independent BM decoder."""
    import jax.numpy as jnp
    from amps_tpu.ref import bm_ref

    rng = np.random.default_rng(9)
    info = rng.integers(0, 2, 28).astype(np.uint8)
    code = np.asarray(bch_ref.focc_bch_encode(info))
    assert np.array_equal(np.asarray(bch.focc_bch_encode(info)), code)
    pats = _all_patterns(40)
    assert len(pats) == 821
    rx = np.tile(code, (len(pats), 1))
    for r, p in zip(rx, pats):
        for i in p:
            r[i] ^= 1
    dec, ok = bch.focc_bch_decode(jnp.asarray(rx))
    dec, ok = np.asarray(dec), np.asarray(ok)
    assert ok.all()
    assert (dec == info).all()
    for r in rx:
        got, bok = bm_ref.focc_bm_decode(r)
        assert bok and np.array_equal(got, info)


def test_bm_cross_check_uncorrectable_agreement():
    """Beyond t=2 the decoders must still AGREE: any coset has at most
    one weight-<=2 leader (d=5), so a 3-error word either miscorrects
    to the same nearby codeword or is flagged uncorrectable — by both
    the product LUT decoder and the independent BM decoder."""
    import itertools
    import jax.numpy as jnp
    from amps_tpu.ref import bm_ref

    rng = np.random.default_rng(13)
    info = rng.integers(0, 2, 36).astype(np.uint8)
    code = np.asarray(bch_ref.recc_bch_encode(info))
    triples = list(itertools.combinations(range(48), 3))
    rng.shuffle(triples)
    triples = triples[:200]
    rx = np.tile(code, (len(triples), 1))
    for r, p in zip(rx, triples):
        for i in p:
            r[i] ^= 1
    dec, ok = bch.recc_bch_decode(jnp.asarray(rx))
    dec, ok = np.asarray(dec), np.asarray(ok)
    n_flagged = 0
    for i, r in enumerate(rx):
        got, bok = bm_ref.recc_bm_decode(r)
        assert bok == bool(ok[i]), (i, triples[i])
        if bok:
            assert np.array_equal(got, dec[i]), (i, triples[i])
        else:
            n_flagged += 1
    assert n_flagged > 0  # some 3-error patterns are detected
