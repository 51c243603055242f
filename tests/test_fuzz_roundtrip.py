"""Property-style roundtrips with random payloads: every word the TX
side can emit must survive its own air interface and decode bit-exact
on the matching RX side (TX focc -> MS focc decoder; MS recc burst ->
BS correlator+decoder; fvc -> MS fvc decoder), across random busy
flags, queue contents, and word fields."""

import numpy as np
import pytest

from amps_tpu.codec.bch import recc_bch_encode
from amps_tpu.ms import decode_focc_stream, decode_fvc_words
from amps_tpu.rx import correlator, decoder
from amps_tpu.tx import recc_ms
from amps_tpu.tx.focc import FoccStream, STREAM_BOTH
from amps_tpu.tx.fvc import FvcStream


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_focc_random_words_roundtrip(seed):
    rng = np.random.default_rng(seed)
    st = FoccStream(sps=1)
    pushed = []
    for _ in range(6):
        w = rng.integers(0, 2, 28).astype(np.uint8)
        w[0] = 1                       # word-2 shaped (T1T2=1x)
        pushed.append(w)
        st.push_words(STREAM_BOTH, [w])
    if rng.random() < 0.5:
        st.mark_busy(1)
    frames = decode_focc_stream(
        np.asarray(st.next_superframe_symbols(), np.float32), sps=1)
    assert len(frames) == 18
    assert all(f.ok_a and f.ok_b for f in frames)
    got = [f.word_a for f in frames]
    for w in pushed:
        assert any(np.array_equal(g, w) for g in got), w


@pytest.mark.parametrize("seed", [3, 4, 5])
def test_recc_random_words_roundtrip(seed):
    """Random (valid-BCH) RECC word payloads through burst synthesis ->
    trigger -> capture -> decode."""
    rng = np.random.default_rng(seed)
    nwords = int(rng.integers(1, 6))
    infos = rng.integers(0, 2, (nwords, 36)).astype(np.uint8)
    # word contents are arbitrary; encoding makes them valid codewords
    words = [np.asarray(recc_bch_encode(i))[:36] for i in infos]
    # recc burst builder takes the 36 info+parity bits per word
    sps = 3
    syms = recc_ms.burst_symbols(words, dcc=int(rng.integers(0, 4)),
                                 sps=sps)
    lead = np.tile(np.array([1, -1], np.int8), 200)
    stream = np.concatenate(
        [lead, syms,
         np.zeros(correlator.CAPTURE_SYMBOLS * sps, np.int8)]
    ).astype(np.float32)
    starts, valid, q, hard, soft = correlator.find_and_extract(
        stream, sps, max_bursts=1, threshold=0.5)
    assert bool(np.asarray(valid)[0])
    for policy in ("first_ok", "majority"):
        dec = decoder.decode_bursts(np.asarray(hard)[0], policy=policy)
        ok = np.asarray(dec.word_ok)
        got = np.asarray(dec.words)
        for i, w in enumerate(words):
            assert ok[i], (policy, i)
            assert np.array_equal(got[i], np.asarray(w)), (policy, i)


@pytest.mark.parametrize("seed", [6, 7])
def test_fvc_random_words_roundtrip(seed):
    rng = np.random.default_rng(seed)
    nwords = int(rng.integers(1, 4))
    ws = rng.integers(0, 2, (nwords, 28)).astype(np.uint8)
    fvc = FvcStream(sps=3)
    fvc.set_words(ws if nwords > 1 else ws[0], timer=0)
    blk = fvc.next_block(nwords * 1032 * 2 * 3 + 300).astype(np.float32)
    got = decode_fvc_words(blk, sps=3)
    assert len(got) == nwords
    for g, w in zip(got, ws):
        assert np.array_equal(g, w)
