"""SimMobile closed loop: the FULL call lifecycle crosses real air-
interface encodings in both directions — page (FOCC frames) -> page
response (RECC burst through the correlator+decoder) -> voice
assignment (FOCC) -> alert (FVC blank-and-burst) -> ringing/answer
(ST supervision) -> handoff (FVC designation) -> mobile release (1.8 s
ST).  The reference could only do any of this against real phones."""

import numpy as np

from amps_tpu.control.station import BaseStation
from amps_tpu.ms import SimMobile
from amps_tpu.rx import correlator, decoder

SPS = 5


def deliver_recc(bs, syms):
    """Mobile RECC burst symbols -> station via the real RX decode stack."""
    lead = np.tile(np.array([1, -1], np.int8), 300)
    stream = np.concatenate(
        [lead, syms, np.zeros(correlator.CAPTURE_SYMBOLS * SPS, np.int8)]
    ).astype(np.float32)
    starts, valid, q, hard, soft = correlator.find_and_extract(
        stream, SPS, max_bursts=1, threshold=0.5)
    assert bool(np.asarray(valid)[0])
    dec = decoder.decode_bursts(np.asarray(hard)[0])
    bs.handle_burst(np.asarray(dec.words), np.asarray(dec.word_ok))


def fvc_block(bs, n=1032 * 2 * SPS + 500):
    return bs.fvc.next_block(n).astype(np.float32)


def test_full_call_lifecycle_closed_loop():
    bs = BaseStation()
    mob = SimMobile("5551234567", sps=SPS)

    # operator pages the mobile
    bs.handle_command("page 5551234567")
    mob.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    assert "paged" in mob.log
    assert mob.outbox and mob.outbox[0][0] == "page_response"

    # mobile responds on the RECC; station assigns a voice channel
    kind, burst = mob.outbox.pop(0)
    deliver_recc(bs, burst)
    assert bs.supervisors[355].state == "alerting"
    assert bs.focc._busy_superframes == 1   # seizure marked busy

    # mobile hears the (busy) assignment superframe and tunes
    mob.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    assert mob.recc_busy                    # B/I carried over the air
    assert mob.voice_chan == 355 and mob.sat_scc == bs.system.scc
    assert mob.state == "conversation"

    # FVC alert rings the mobile; station sees ST while ringing
    mob.hear_fvc(fvc_block(bs))
    assert mob.state == "ringing"
    lv, pw = mob.supervision_frames(30)
    assert lv[:, 3].max() > 0               # ST on
    bs.push_supervision(355, lv, pw)
    assert bs.supervisors[355].state == "alerting"

    # user answers: ST drops -> station flips to conversation + audio
    mob.answer()
    lv, pw = mob.supervision_frames(30)
    assert lv[:, 3].max() == 0
    bs.push_supervision(355, lv, pw)
    assert bs.supervisors[355].state == "conversation"
    assert (bs.fvc_mute, bs.audio_mute) == (True, False)

    # handoff to channel 356 over the FVC; mobile retunes
    assert bs.handoff(355, 356)
    mob.hear_fvc(fvc_block(bs))
    assert mob.voice_chan == 356
    assert any(s.startswith("handoff") for s in mob.log)
    lv, pw = mob.supervision_frames(50)
    bs.push_supervision(356, lv, pw)
    assert bs.supervisors[356].state == "conversation"

    # mobile hangs up: 1.8 s ST releases the channel at the station
    mob.hang_up()
    lv, pw = mob.supervision_frames(200)
    bs.push_supervision(356, lv, pw)
    assert 356 not in bs.supervisors
    assert [e for e in bs.events if e.kind == "release"]


def test_busy_idle_defers_mobile():
    """A mobile hearing B/I=busy defers its access (553 §3.1.1) and
    retries on its own once a later superframe reads idle — no second
    page needed."""
    bs = BaseStation()
    mob = SimMobile("2135551212", sps=SPS)
    bs.focc.mark_busy(1)
    # single-copy page (repeats=1): only the mobile-side deferred access
    # can save it
    from amps_tpu.codec import words as W
    from amps_tpu.control import fields as F
    from amps_tpu.tx.focc import STREAM_BOTH
    min1, min2 = F.parse_min("2135551212")
    bs.focc.push_words(STREAM_BOTH,
                       [np.asarray(W.focc_word1(True, 0, min1)),
                        np.asarray(W.focc_word2_general(min2, 0, 0, 0))])
    mob.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    assert "recc_busy_defer" in mob.log
    assert not mob.outbox and mob.state == "idle"
    # next superframe is idle (and empty): the deferred access goes out
    # by itself — no repeated page needed
    mob.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    assert "deferred_page_response_sent" in mob.log
    assert mob.outbox and mob.state == "wait_assign"


def test_mobile_to_mobile_call_establishes():
    """The scenario the busy bit used to break: A originates to B.  The
    origination marks the RECC busy, so the page to B rides a busy
    superframe; with page repetition (station) and deferred access
    (mobile), B's leg still establishes."""
    bs = BaseStation()
    a = SimMobile("4155550123", sps=SPS)
    b = SimMobile("2125557890", sps=SPS)

    a.originate("2125557890")
    kind, burst = a.outbox.pop(0)
    deliver_recc(bs, burst)                     # marks busy + queues page
    # superframe 1 (busy): A gets its assignment; B defers the page
    sf = np.asarray(bs.focc.next_superframe_symbols(), np.float32)
    a.hear_focc(sf)
    b.hear_focc(sf)
    assert a.voice_chan == 356
    assert "recc_busy_defer" in b.log and not b.outbox
    # superframe 2 (idle, carries the repeated page): B responds
    sf = np.asarray(bs.focc.next_superframe_symbols(), np.float32)
    b.hear_focc(sf)
    assert b.outbox, b.log
    kind, burst = b.outbox.pop(0)
    deliver_recc(bs, burst)
    # B hears its own voice assignment on the next idle superframe
    b.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    b.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    assert b.voice_chan == 355                  # page-response channel
    assert b.state in ("conversation", "ringing")


def test_mobile_origination_and_registration():
    bs = BaseStation()
    mob = SimMobile("4155550123", esn=0xDEADBEEF, sps=SPS)
    mob.register()
    kind, burst = mob.outbox.pop(0)
    deliver_recc(bs, burst)
    # station confirms with an audit order the mobile understands
    mob.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    assert "audit_confirmed" in mob.log
    assert mob.recc_busy                    # seizure marked the RECC busy

    mob.originate("16505551234")            # defers: RECC still busy
    assert "originate_blocked" in mob.log and not mob.outbox
    # next superframe is idle; retry goes out
    mob.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    assert not mob.recc_busy
    mob.originate("16505551234")
    kind, burst = mob.outbox.pop(0)
    deliver_recc(bs, burst)
    mob.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    assert mob.voice_chan == 356            # origination channel
    assert mob.state == "conversation"
    # loopback page command was emitted for the dialed number
    assert any(e.kind == "command" and "page 16505551234" in str(e.payload)
               for e in bs.events)


def test_ms_focc_decode_over_rf():
    """The MS FOCC decoder works from the real FM discriminator output
    (arbitrary symbol timing + filter ISI), not just clean symbols: a
    superframe through fm_modulate -> rx_frontend decodes every full
    frame BCH-clean, including the injected page words."""
    from amps_tpu import PipelineConfig
    from amps_tpu.codec import words as W
    from amps_tpu.control import fields
    from amps_tpu.ms import parse_focc_word
    from amps_tpu.ms.focc_rx import decode_focc_stream
    from amps_tpu.rx.frontend import rx_frontend
    from amps_tpu.tx.focc import FoccStream, STREAM_BOTH
    from amps_tpu.tx.modulator import fm_modulate

    pipe = PipelineConfig()
    st = FoccStream(sps=pipe.sps)
    min1, min2 = fields.parse_min("5551234567")
    st.push_words(STREAM_BOTH, [np.asarray(W.focc_word1(True, 0, min1)),
                                np.asarray(W.focc_word2_general(min2, 0, 0,
                                                                0))])
    syms = np.asarray(st.next_superframe_symbols())
    iq, _ = fm_modulate(syms.astype(np.int8), pipe)
    demod, _ = rx_frontend(np.asarray(iq), pipe, center_freq=0.0)
    frames = decode_focc_stream(np.asarray(demod), sps=10)
    assert len(frames) >= 17                # group delay eats <1 frame
    assert all(f.ok_a and f.ok_b for f in frames)
    parsed = [parse_focc_word(f.word_a) for f in frames]
    assert [p for p in parsed if p["type"] == "word1" and p["MIN1"] == min1]
    assert [p for p in parsed
            if p["type"] == "word2_order" and p["MIN2"] == min2]


def test_fvc_decode_odd_parity_and_multiword():
    """The FVC decoder survives blocks cut at odd symbol boundaries
    (both Manchester pair parities are scanned) and never merges a
    multi-word burst into one chimera vote (hits cluster per word)."""
    from amps_tpu.codec import words as W
    from amps_tpu.ms import decode_fvc_words
    from amps_tpu.tx.fvc import FvcStream

    alert = np.asarray(W.fvc_word1_general(1, 0, 0, 1))
    release = np.asarray(W.fvc_word1_general(1, 0, 0, 3))

    fvc = FvcStream(sps=SPS)
    fvc.set_words(np.stack([alert, release]), timer=0)
    blk = fvc.next_block(2 * 1032 * 2 * SPS + 501).astype(np.float32)

    got = decode_fvc_words(blk, sps=SPS)
    assert len(got) == 2
    assert np.array_equal(got[0], alert) and np.array_equal(got[1], release)

    # odd symbol boundary: drop one leading symbol worth of samples
    got_odd = decode_fvc_words(blk[SPS:], sps=SPS)
    assert len(got_odd) == 2
    assert np.array_equal(got_odd[0], alert)
    assert np.array_equal(got_odd[1], release)


def test_fvc_decode_survives_missing_sync_hit():
    """A single corrupted word-sync inside a burst (gap 2x88 between
    hits) must NOT split the word's repeats into two separately-voted
    clusters: same-phase (mod 88) hits merge, so the word decodes
    exactly once (ADVICE r1: a 5/5 split either double-emits the word
    or drops both halves below the vote threshold)."""
    from amps_tpu.codec import words as W
    from amps_tpu.ms import decode_fvc_words
    from amps_tpu.tx.fvc import FvcStream

    word = np.asarray(W.fvc_word1_general(1, 0, 0, 1))
    fvc = FvcStream(sps=1)
    fvc.set_words(word)
    blk = fvc.next_block(2200).astype(np.float32)
    # invert the 6th word-sync's 22 Manchester symbols: 10 hits, one
    # 176-bit gap splitting them 5/5
    s6 = 101 + 5 * (11 + 40 + 37)
    blk[2 * s6: 2 * (s6 + 11)] *= -1
    got = decode_fvc_words(blk, sps=1, min_repeats=5)
    assert len(got) == 1, [g.tolist() for g in got]
    assert np.array_equal(got[0], word)


def test_rvc_release_st_duration_exact_at_small_blocks():
    """Review finding (r4): rvc_baseband must transmit the FULL 1.9 s
    release-ST run regardless of block size — the old ceil-based frame
    accounting lost up to one 10 ms frame per block, shorting the run
    below the 1.8 s release threshold at small blocks (the station
    then mis-released via the fade timeout)."""
    import numpy as np
    from amps_tpu.ms.mobile import SimMobile, CONVERSATION

    fs, sens = 60_000.0, 0.8
    mob = SimMobile("5551234567", sps=3)
    mob.sat_scc = 1
    mob.voice_chan = 355
    mob.state = CONVERSATION
    mob.hang_up()
    carrier = 0
    for _ in range(200):                      # 200 x 1024 = 3.4 s
        out = mob.rvc_baseband(1024, fs, sens)
        n_on = int((np.abs(out).max(axis=1) > 0).sum())
        carrier += n_on
        if n_on == 0:
            break
    # >= 1.8 s of carrier+ST actually transmitted (1.9 s nominal)
    assert carrier >= int(1.85 * fs), carrier / fs
    assert carrier <= int(1.95 * fs), carrier / fs
