"""TX layer tests: superframe/burst synthesis golden vs oracle + the
testalloc.cc invariants."""

import numpy as np

from amps_tpu.codec import words as W
from amps_tpu.ref import frames_ref, words_ref
from amps_tpu.tx import focc as tx_focc
from amps_tpu.tx import fvc as tx_fvc


def test_focc_superframe_golden():
    """Full 18-frame superframe matches the oracle bit stream exactly."""
    pairs = tx_focc.superframe_word_pairs()
    oracle_pairs = frames_ref.superframe_words()
    assert np.array_equal(pairs, oracle_pairs)
    for sps in (1, 5):
        got = np.asarray(tx_focc.focc_frames_symbols(pairs, sps))
        want = frames_ref.superframe_symbols(oracle_pairs, sps)
        assert np.array_equal(got, want)


def test_focc_registration_superframe_golden():
    pairs = tx_focc.registration_superframe_word_pairs()
    oracle_pairs = frames_ref.registration_superframe_words()
    assert np.array_equal(pairs, oracle_pairs)
    got = np.asarray(tx_focc.focc_frames_symbols(pairs, 1))
    want = frames_ref.superframe_symbols(oracle_pairs, 1)
    assert np.array_equal(got, want)


def test_focc_testalloc_invariants():
    """apps/testalloc.cc:70-97: sps-repeat, non-zero, valid Manchester."""
    sps = 5
    syms = np.asarray(
        tx_focc.focc_frames_symbols(tx_focc.superframe_word_pairs(), sps))
    assert syms.shape == (18 * 463 * 2 * sps,)
    assert not (syms == 0).any()
    runs = syms.reshape(-1, sps)
    assert (runs == runs[:, :1]).all()
    halves = runs[:, 0].reshape(-1, 2)
    assert (halves[:, 0] == -halves[:, 1]).all()


def test_focc_batched_channels():
    pairs = tx_focc.superframe_word_pairs()
    batch = np.stack([pairs, pairs, pairs])  # 3 channels
    got = np.asarray(tx_focc.focc_frames_symbols(batch, 2))
    assert got.shape == (3, 18 * 463 * 2 * 2)
    assert np.array_equal(got[0], got[2])


def test_focc_stream_injection():
    """Queued words replace filler slots, like focc_words_message +
    next_burst_state filler pop."""
    st = tx_focc.FoccStream(sps=1)
    min1, min2 = words_ref.parse_min("5551234567")
    w1 = np.asarray(W.focc_word1(True, 0, min1))
    w2 = np.asarray(W.focc_word2_general(min2, 0, 0, 0))
    st.push_words(tx_focc.STREAM_BOTH, [w1, w2])
    pairs = st.next_word_pairs()
    # first 4 frames unchanged (overhead), slots 4 and 5 carry the page
    assert np.array_equal(pairs[:4], st._template[:4])
    assert np.array_equal(pairs[4, 0], w1) and np.array_equal(pairs[4, 1], w1)
    assert np.array_equal(pairs[5, 0], w2)
    # remaining fillers untouched; queue drained
    assert np.array_equal(pairs[6], st._template[6])
    assert st.queue_depth() == 0
    # next superframe back to template
    assert np.array_equal(st.next_word_pairs(), st._template)


def test_focc_stream_a_b():
    st = tx_focc.FoccStream(sps=1)
    w = np.asarray(W.focc_word2_general(1, 0, 0, 7))
    st.push_words(tx_focc.STREAM_A, [w])
    pairs = st.next_word_pairs()
    assert np.array_equal(pairs[4, 0], w)
    assert np.array_equal(pairs[4, 1], np.asarray(W.control_filler_word()))


def test_fvc_burst_golden():
    w = words_ref.fvc_word1_general(1, 0, 0, 1)
    for sps in (1, 5):
        got = np.asarray(tx_fvc.fvc_burst_symbols(w[None], sps))
        want = frames_ref.fvc_burst_symbols([w], sps)
        assert np.array_equal(got, want)


def test_fvc_stream_repeats_and_timer():
    fired = []
    st = tx_fvc.FvcStream(sps=1, on_command=fired.append)
    w = np.asarray(W.fvc_word1_general(1, 0, 0, 1))
    st.set_words(w, timer=3)
    burst_len = 1032 * 2
    one = st.next_block(burst_len)
    two = st.next_block(burst_len)
    assert np.array_equal(one, two)  # burst repeats forever
    assert fired == []
    st.next_block(burst_len)  # third completion -> timer hits 0
    assert fired == ["fvc off"]
    # idle after clear -> explicit zero fill (reference quirk fixed)
    st.clear()
    assert not st.next_block(100).any()


def test_symbols_from_bitfile(tmp_path):
    # queue_file parity (lib/focc_impl.cc:53-77): '1' -> (-1,+1) pair,
    # '0' -> (+1,-1), invalid bytes skipped
    p = tmp_path / "out.bits"
    p.write_bytes(b"10x1" + bytes([0, 1, 7]))
    syms = tx_focc.symbols_from_bitfile(str(p), sps=1)
    want = np.array([-1, 1, 1, -1, -1, 1, 1, -1, -1, 1], dtype=np.int8)
    assert np.array_equal(syms, want)
    # sps repeat
    syms3 = tx_focc.symbols_from_bitfile(str(p), sps=3)
    assert np.array_equal(syms3, np.repeat(want, 3))


def test_focc_stream_debug_sink(tmp_path):
    # AMPS_DEBUG dump parity (lib/focc_impl.cc:132-135,639-645): the
    # emitted symbol stream appends to the sink, capped at debug_limit
    sink = tmp_path / "debug.bits"
    st = tx_focc.FoccStream(sps=1, debug_sink=str(sink), debug_limit=2000)
    a = np.asarray(st.next_superframe_symbols(), np.int8)
    got = np.frombuffer(sink.read_bytes(), dtype=np.int8)
    assert np.array_equal(got, a[:2000])
    st.next_superframe_symbols()  # over the cap: nothing more written
    assert sink.stat().st_size == 2000


def test_focc_busy_idle_signaling():
    """mark_busy(1): the next superframe's B/I bits all read busy (0),
    message bits unchanged; the following superframe is idle (1) again
    (553 §3.1.1 at superframe granularity — the reference's
    busy_idle_bit is vestigial, lib/amps_common.h:7)."""
    from amps_tpu.codec.manchester import manchester_decode_bits

    st = tx_focc.FoccStream(sps=1)
    st.mark_busy(1)
    bi_pos = np.asarray(tx_focc._FRAME_SRC) < 0          # (463,) mask

    def frames_of(syms):
        hard = (np.asarray(syms) > 0).astype(np.uint8)
        bits, bad = manchester_decode_bits(hard.reshape(-1, 463 * 2))
        assert int(np.asarray(bad).sum()) == 0
        return np.asarray(bits)                          # (18, 463)

    busy = frames_of(st.next_superframe_symbols())
    idle = frames_of(st.next_superframe_symbols())
    assert (busy[:, bi_pos] == 0).all()
    assert (idle[:, bi_pos] == 1).all()
    # message positions are untouched by the B/I flip
    assert np.array_equal(busy[:, ~bi_pos], idle[:, ~bi_pos])


def test_station_marks_busy_on_seizure():
    from amps_tpu.control.station import BaseStation
    from amps_tpu.tx import recc_ms

    bs = BaseStation()
    words = recc_ms.page_response_words("5551234567")
    arr = np.zeros((7, 36), np.uint8)
    ok = np.zeros(7, bool)
    for i, w in enumerate(words):
        arr[i] = w
        ok[i] = True
    assert bs.focc._busy_superframes == 0
    bs.handle_burst(arr, ok)
    assert bs.focc._busy_superframes == 1
