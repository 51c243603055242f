"""Control-plane tests: RECC dispatch, command processor, TCP server, and
the closed-loop call flow (burst in -> words on the FOCC out)."""

import asyncio

import numpy as np
import pytest

from amps_tpu.codec.bch import recc_bch_encode, recc_bch_decode
from amps_tpu.control import fields
from amps_tpu.control.server import CommandServer
from amps_tpu.control.station import BaseStation
from amps_tpu.ref import words_ref
from amps_tpu.tx import recc_ms


def _decoded(words36):
    """Simulate the device decode output for clean words."""
    words = np.zeros((7, 36), dtype=np.uint8)
    ok = np.zeros(7, dtype=bool)
    for i, w in enumerate(words36):
        words[i] = w
        ok[i] = True
    # pad slots: garbage decode of dotting is typically not ok; leave False
    return words, ok


def _events(st, kind):
    return [e.payload for e in st.events if e.kind == kind]


def test_fields_match_oracle(rng):
    bits = rng.integers(0, 2, 36).astype(np.uint8)
    wa = fields.RxWordA.parse(bits)
    ref = words_ref.parse_recc_word_a(bits)
    assert (wa.MIN1, wa.NAWC, wa.T, wa.SCM) == (
        ref["MIN1"], ref["NAWC"], ref["T"], ref["SCM"])
    wb = fields.RxWordB.parse(bits)
    refb = words_ref.parse_recc_word_b(bits)
    assert (wb.ORDER, wb.ORDQ, wb.MSG_TYPE, wb.MIN2) == (
        refb["ORDER"], refb["ORDQ"], refb["MSG_TYPE"], refb["MIN2"])
    for s in ("5551234567", "0005550000"):
        m = fields.parse_min(s)
        assert m == words_ref.parse_min(s)
        assert fields.calc_min(*m) == s


def test_page_response_dispatch():
    st = BaseStation()
    words, ok = _decoded(recc_ms.page_response_words("5551234567"))
    st.handle_burst(words, ok)
    focc = _events(st, "focc_words")
    assert len(focc) == 1
    w1, w2 = focc[0]
    min1, min2 = fields.parse_min("5551234567")
    assert np.array_equal(w1, words_ref.focc_word1(True, 0, min1))
    assert np.array_equal(
        w2, words_ref.focc_word2_voice_channel(1, min2, 0, 355))
    # FVC alert with 35-repeat timer; mutes flip to data
    fvc = _events(st, "fvc_words")
    assert len(fvc) == 1
    aw, timer = fvc[0]
    assert np.array_equal(aw, words_ref.fvc_word1_general(1, 0, 0, 1))
    assert timer == 35
    assert st.fvc_mute is False and st.audio_mute is True
    # words actually queued for the next superframe
    assert st.focc.queue_depth() == 2


def test_registration_dispatch():
    st = BaseStation()
    words, ok = _decoded(recc_ms.registration_words("2135551212",
                                                    esn=0xDEADBEEF))
    st.handle_burst(words, ok)
    focc = _events(st, "focc_words")
    assert len(focc) == 1
    w1, w2 = focc[0]
    min1, min2 = fields.parse_min("2135551212")
    assert np.array_equal(w1, words_ref.focc_word1(True, 0, min1))
    assert np.array_equal(w2, words_ref.focc_word2_general(min2, 0, 0, 7))
    dbg = " ".join(_events(st, "debug"))
    assert "ESN=deadbeef" in dbg


def test_origination_dispatch_and_page_loopback():
    st = BaseStation()
    words, ok = _decoded(recc_ms.origination_words("5551234567", "5551230000"))
    st.handle_burst(words, ok)
    focc = _events(st, "focc_words")
    # origination response + the loopback 'page 5551230000' words
    assert len(focc) == 2
    min1, min2 = fields.parse_min("5551234567")
    w1, w2 = focc[0]
    assert np.array_equal(
        w2, words_ref.focc_word2_voice_channel(1, min2, 0, 356))
    # loopback page of the dialed number
    pmin1, pmin2 = fields.parse_min("5551230000")
    p1, p2 = focc[1]
    assert np.array_equal(p1, words_ref.focc_word1(True, 0, pmin1))
    assert np.array_equal(p2, words_ref.focc_word2_general(pmin2, 0, 0, 0))
    assert st.fvc_mute is True and st.audio_mute is False
    assert _events(st, "command") == ["page 5551230000"]


def test_origination_intercept_for_leading_zero():
    st = BaseStation()
    words, ok = _decoded(recc_ms.origination_words("5551234567", "0"))
    st.handle_burst(words, ok)
    w1, w2 = _events(st, "focc_words")[0]
    min1, min2 = fields.parse_min("5551234567")
    # intercept order (ORDER=9), not a voice assignment
    assert np.array_equal(w2, words_ref.focc_word2_general(min2, 0, 0, 9))


def test_invalid_word_a_dropped():
    st = BaseStation()
    words, ok = _decoded(recc_ms.page_response_words("5551234567"))
    ok[0] = False
    st.handle_burst(words, ok)
    assert _events(st, "focc_words") == []
    assert "invalid Word A" in " ".join(_events(st, "debug"))


def test_unknown_message_warns():
    st = BaseStation()
    w = recc_ms.page_response_words("5551234567")
    # T=1 with a nonsense order
    w[0] = recc_ms.ms_word_a(1, True, False, True, False, 0,
                             fields.parse_min("5551234567")[0])
    w[1] = recc_ms.ms_word_b(0, 0, 5, 0x15, False, False, 0, 0, 0, 0, 1)
    words, ok = _decoded(w)
    st.handle_burst(words, ok)
    assert _events(st, "focc_words") == []
    assert "unknown RECC message" in " ".join(_events(st, "debug"))


def test_command_processor():
    st = BaseStation()
    st.handle_command("fvc on")
    assert st.fvc_mute is False and st.audio_mute is True
    st.handle_command("fvc off")
    assert st.fvc_mute is True and st.audio_mute is False
    st.handle_command("fvc alert")
    (aw, timer), = _events(st, "fvc_words")
    assert np.array_equal(aw, words_ref.fvc_word1_general(1, 0, 0, 1))
    st.handle_command("page 5551234567")
    w1, w2 = _events(st, "focc_words")[-1]
    min1, min2 = fields.parse_min("5551234567")
    assert np.array_equal(w2, words_ref.focc_word2_general(min2, 0, 0, 0))
    st.handle_command("page bogus!")
    assert "invalid MIN" in " ".join(_events(st, "debug"))
    st.handle_command("frobnicate")
    assert "invalid command" in " ".join(_events(st, "debug"))


def test_closed_loop_call_flow():
    """MS burst bits -> device BCH decode -> dispatch -> FOCC superframe
    carries the voice assignment (the §3.2 chain, host segment)."""
    st = BaseStation()
    ms_words = recc_ms.page_response_words("5551234567")
    # encode + decode through the real codec (device path)
    coded = np.asarray(recc_bch_encode(np.stack(ms_words)))
    dec, ok = recc_bch_decode(coded)
    words = np.zeros((7, 36), np.uint8)
    okv = np.zeros(7, bool)
    words[:2] = np.asarray(dec)
    okv[:2] = np.asarray(ok)
    st.handle_burst(words, okv)
    pairs = st.focc.next_word_pairs()
    # slots 4,5 carry word1/word2 of the assignment
    min1, min2 = fields.parse_min("5551234567")
    assert np.array_equal(pairs[4, 0], words_ref.focc_word1(True, 0, min1))
    assert np.array_equal(
        pairs[5, 0], words_ref.focc_word2_voice_channel(1, min2, 0, 355))


@pytest.mark.parametrize("port", [64652])
def test_tcp_command_server(port):
    async def run():
        st = BaseStation()
        srv = CommandServer(st, port=port)
        await srv.start()
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        writer.write(b"page 5551234567\n")
        await writer.drain()
        # debug reply reaches the operator socket
        data = await asyncio.wait_for(reader.read(100), timeout=5)
        assert b"paging" in data
        writer.write(b"garbage\n")
        await writer.drain()
        data = await asyncio.wait_for(reader.read(100), timeout=5)
        assert b"invalid command" in data
        writer.close()
        await srv.stop()
        assert len([e for e in st.events if e.kind == "focc_words"]) == 1

    asyncio.run(run())


def test_handoff_moves_call():
    """Intra-station handoff (extension): the designation word rides the
    old channel's FVC, supervision resumes on the new channel in the
    same call state, and the retune SAT gap does not drop the call."""
    from amps_tpu.control.fields import FvcVoiceChannel
    from amps_tpu.control.station import BaseStation
    from amps_tpu.tx import recc_ms

    bs = BaseStation()
    words = recc_ms.page_response_words("5551234567")
    arr = np.zeros((7, 36), np.uint8)
    ok = np.zeros(7, bool)
    for i, w in enumerate(words):
        arr[i] = w
        ok[i] = True
    bs.handle_burst(arr, ok)                   # alerting on 355
    ring = np.zeros((30, 4), np.float32)
    ring[:, 1] = 0.05                          # SAT (SCC=1)
    ring[:, 3] = 0.05                          # ST: ringing
    pw = np.full(30, 1e-3, np.float32)
    bs.push_supervision(355, ring, pw)
    answered = ring.copy()
    answered[:, 3] = 0.0                       # ST drops: answered
    bs.push_supervision(355, answered, pw)
    assert bs.supervisors[355].state == "conversation"

    assert bs.handoff(355, 356)
    assert 355 not in bs.supervisors
    assert bs.supervisors[356].state == "conversation"
    ho = [e for e in bs.events if e.kind == "handoff"]
    assert ho and ho[-1].payload == (355, 356)
    w28, timer = [e.payload for e in bs.events if e.kind == "fvc_words"][-1]
    p = FvcVoiceChannel.parse(np.asarray(w28))
    assert not p.is_order
    assert (p.SCC, p.PSCC, p.CHAN) == (bs.system.scc, bs.system.scc, 356)
    assert timer == bs.system.fvc_alert_repeats
    assert (bs.fvc_mute, bs.audio_mute) == (False, True)  # burst on old ch

    # mobile retune gap (0.3 s no carrier) then SAT back: call holds
    gap = np.zeros((30, 4), np.float32)
    bs.push_supervision(356, gap, np.zeros(30, np.float32))
    sat = np.zeros((30, 4), np.float32)
    sat[:, 1] = 0.05
    bs.push_supervision(356, sat, pw)
    assert bs.supervisors[356].state == "conversation"

    # no active call on 355 anymore: refused
    assert not bs.handoff(355, 357)
    # operator-command surface
    bs.handle_command("handoff 356 355")
    assert 356 not in bs.supervisors and bs.supervisors[355].state == \
        "conversation"


def test_noise_burst_gate():
    """A BCH-aliased noise capture (high Manchester bad counts) is
    dropped before call control; a clean burst with the same words is
    dispatched."""
    from amps_tpu.tx import recc_ms

    bs = BaseStation()
    words = recc_ms.page_response_words("5551234567")
    arr = np.zeros((7, 36), np.uint8)
    ok = np.zeros(7, bool)
    for i, w in enumerate(words):
        arr[i] = w
        ok[i] = True
    noisy_bad = np.array([3, 118, 121, 0, 0, 0, 0, 0], np.int32)
    bs.handle_burst(arr, ok, bad_symbols=noisy_bad)
    assert not bs.supervisors                    # dropped
    assert any("noise burst" in str(e.payload) for e in bs.events)
    clean_bad = np.zeros(8, np.int32)
    bs.handle_burst(arr, ok, bad_symbols=clean_bad)
    assert 355 in bs.supervisors                 # dispatched


def test_per_channel_fvc_concurrent_calls():
    """per_channel_fvc: every voice channel has its OWN FVC stream and
    mute pair, so CONCURRENT calls signal independently — the shared-
    FVC limitations (handoff refusal while other calls are active,
    release orders audible on other calls' channels) are lifted, and
    voice-channel assignment picks a free channel instead of the
    reference's hardcoded 355/356."""
    from amps_tpu.config import SystemConfig
    from amps_tpu.ms.fvc_rx import decode_fvc_words

    sys_cfg = SystemConfig(voice_channels=(355, 356, 357))
    st = BaseStation(sys_cfg, per_channel_fvc=True)

    # call 1: page response -> first free channel (355), alert rides
    # 355's own stream
    words, ok = _decoded(recc_ms.page_response_words("5551234567"))
    st.handle_burst(words, ok)
    assert 355 in st.supervisors
    assert st.fvc_mute_for(355) is False        # alert active on 355
    syms = st.fvc_for(355).next_block(4000 * st._sps)
    dec = decode_fvc_words(syms, st._sps)
    assert dec, "alert burst must decode from 355's stream"

    # call 2 while call 1 is alerting: next free channel (356)
    words2, ok2 = _decoded(recc_ms.origination_words(
        "4155559876", "7025551000"))
    st.handle_burst(words2, ok2)
    assert 356 in st.supervisors and 355 in st.supervisors
    # origination goes straight to conversation: 356 carries audio,
    # while 355 still carries its alert data — INDEPENDENT mute pairs
    assert st.fvc_mute_for(356) is True and st.audio_mute_for(356) is False
    assert st.fvc_mute_for(355) is False and st.audio_mute_for(355) is True

    # handoff of call 2 while call 1 is active: allowed (per-channel
    # streams), designation rides 356's OWN stream
    assert st.handoff(356, 357) is True
    assert 357 in st.supervisors and 355 in st.supervisors
    d356 = st.fvc_for(356).next_block(4000 * st._sps)
    assert decode_fvc_words(d356, st._sps), "designation on 356's stream"
    # 355's stream still carries the ALERT, not the designation
    a355 = st.fvc_for(355).next_block(4000 * st._sps)
    w355 = decode_fvc_words(a355, st._sps)
    assert w355 and fields.FvcVoiceChannel.parse(w355[0]).is_order

    # release call 1: order rides 355 only; call 2 (now 357) untouched
    st.release_call(355, "test")
    assert 355 not in st.supervisors and 357 in st.supervisors
    r355 = st.fvc_for(355).next_block(4000 * st._sps)
    assert decode_fvc_words(r355, st._sps), "release order on 355"
    assert st.fvc_mute_for(357) is True        # conversation continues

    # plan exhaustion: a third new call finds no free channel
    st.supervisors[355] = st.supervisors[357]   # occupy all three
    st.supervisors[356] = st.supervisors[357]
    words3, ok3 = _decoded(recc_ms.page_response_words("9165554321"))
    n_focc = len(_events(st, "focc_words"))
    st.handle_burst(words3, ok3)
    assert len(_events(st, "focc_words")) == n_focc   # dropped, no assign


def test_per_channel_fvc_slots_carry_independent_bursts():
    """RF level: two VoiceFvcSlot sources bound to different voice
    channels emit DIFFERENT FVC bursts simultaneously (the shared-FVC
    station would put one burst on both)."""
    from amps_tpu.config import SystemConfig
    from amps_tpu.ms.fvc_rx import decode_fvc_words
    from amps_tpu.runtime.sources import VoiceFvcSlot
    from amps_tpu.codec import words as W
    from amps_tpu.dsp.fm import quadrature_demod

    sys_cfg = SystemConfig(voice_channels=(355, 356))
    st = BaseStation(sys_cfg, sps=3, per_channel_fvc=True)
    alert = W.fvc_word1_general(sys_cfg.scc, 0, 0, 1)
    release = W.fvc_word1_general(sys_cfg.scc, 0, 0, 3)
    st._set_fvc(alert, timer=5, chan=355)
    st._set_mutes(fvc_mute=False, audio_mute=True, chan=355)
    st._set_fvc(release, timer=5, chan=356)
    st._set_mutes(fvc_mute=False, audio_mute=True, chan=356)

    s355 = VoiceFvcSlot(st, chan=355)
    s356 = VoiceFvcSlot(st, chan=356)
    n = 4000 * 3
    got = {}
    for chan, slot in ((355, s355), (356, s356)):
        bb = slot(n)                       # FM baseband
        # drop the discriminator's seed sample; the FVC decoder's own
        # dotting alignment handles symbol timing at sps
        demod = np.asarray(quadrature_demod(bb)[0])[1:]
        hard = np.where(demod >= 0, 1, -1).astype(np.int8)
        ws = decode_fvc_words(hard, 3)
        assert ws, chan
        got[chan] = np.asarray(ws[0])
    order = lambda w: int("".join(str(int(b)) for b in w[23:28]), 2)
    assert order(got[355]) == 1            # alert
    assert order(got[356]) == 3            # release


def test_intercept_origination_survives_exhausted_plan():
    """Review finding (r4): an intercept origination (leading '0')
    needs NO voice channel, so per-channel-FVC plan exhaustion must not
    drop it — the reference always delivers the intercept order."""
    from amps_tpu.config import SystemConfig

    st = BaseStation(SystemConfig(voice_channels=(355,)),
                     per_channel_fvc=True)
    # occupy the whole plan
    words, ok = _decoded(recc_ms.page_response_words("5551234567"))
    st.handle_burst(words, ok)
    assert 355 in st.supervisors
    n_focc = len(_events(st, "focc_words"))
    words2, ok2 = _decoded(recc_ms.origination_words(
        "4155559876", "0123456789"))
    st.handle_burst(words2, ok2)
    focc = _events(st, "focc_words")
    # intercept order + the unconditional 'page <digits>' loopback
    # (the reference emits both, lib/recc_decode_impl.cc:255-269)
    assert len(focc) == n_focc + 2, len(focc)
    w2 = focc[-2][1]
    order = int("".join(str(int(b)) for b in np.asarray(w2)[23:28]), 2)
    assert order == 9, order                  # intercept order


def test_operator_release_command():
    """Extension command 'release <chan>': operator-initiated teardown
    of an active call (FVC release order + supervisor removal); invalid
    or idle channels get a usage/no-call debug reply."""
    st = BaseStation()
    words, ok = _decoded(recc_ms.page_response_words("5551234567"))
    st.handle_burst(words, ok)
    assert 355 in st.supervisors
    st.handle_command("release 355")
    assert 355 not in st.supervisors
    assert any(k == "release" and p == (355, "operator release")
               for k, p in ((e.kind, e.payload) for e in st.events))
    # the release order rode the FVC with the self-terminating timer
    (_, _), (rel, timer) = _events(st, "fvc_words")
    assert np.array_equal(rel, words_ref.fvc_word1_general(1, 0, 0, 3))
    assert timer == st.system.fvc_alert_repeats
    st.handle_command("release 999")
    assert "no active call" in " ".join(
        str(p) for p in _events(st, "debug"))
    st.handle_command("release nope")
    assert "usage: release" in " ".join(
        str(p) for p in _events(st, "debug"))


def test_released_channel_not_reassigned_until_fvc_off():
    """Advisor finding (r4): in per_channel_fvc mode a released
    channel's FVC stream is still repeating the release order (its
    timerhack 'fvc off' has not fired); assigning a new call there
    would replace the pending burst and the released mobile might never
    hear its release.  The channel must stay out of the assignment pool
    until the timer fires, then become assignable again."""
    from amps_tpu.config import SystemConfig

    sys_cfg = SystemConfig(voice_channels=(355, 356, 357))
    st = BaseStation(sys_cfg, per_channel_fvc=True)

    # call A on 355, then release it — the release order is now pending
    words, ok = _decoded(recc_ms.page_response_words("5551234567"))
    st.handle_burst(words, ok)
    assert 355 in st.supervisors
    st.release_call(355, "test release")
    assert 355 not in st.supervisors
    assert st.fvc_mute_for(355) is False       # order still repeating

    # a new call must NOT land on 355 while its release is pending
    words_b, ok_b = _decoded(recc_ms.page_response_words("9165554321"))
    st.handle_burst(words_b, ok_b)
    assert 355 not in st.supervisors
    assert 356 in st.supervisors

    # drive 355's stream until the timerhack fires its 'fvc off'
    burst_len = 1032 * 2 * st._sps
    st.fvc_for(355).next_block(burst_len * st.system.fvc_alert_repeats)
    assert st.fvc_mute_for(355) is True        # order delivered

    # 355 is assignable again (356 busy; free-first picks 355)
    words_c, ok_c = _decoded(recc_ms.page_response_words("7025551000"))
    st.handle_burst(words_c, ok_c)
    assert 355 in st.supervisors


def test_intercept_does_not_touch_global_mutes_on_per_channel_station():
    """Advisor finding (r4): an intercept origination on a
    per_channel_fvc station used to flip the GLOBAL mute pair (state no
    mapped per-channel slot consults) and emit global mute events.  It
    must leave the global pair — and every per-channel pair — alone."""
    from amps_tpu.config import SystemConfig

    st = BaseStation(SystemConfig(voice_channels=(355, 356)),
                     per_channel_fvc=True)
    g_fvc, g_audio = st.fvc_mute, st.audio_mute
    n_mute_events = sum(1 for e in st.events
                        if e.kind in ("fvc_mute", "audio_mute"))
    words, ok = _decoded(recc_ms.origination_words(
        "4155559876", "0123456789"))            # leading '0' -> intercept
    st.handle_burst(words, ok)
    assert st.fvc_mute is g_fvc and st.audio_mute is g_audio
    assert not st.fvc_mutes and not st.audio_mutes
    assert sum(1 for e in st.events
               if e.kind in ("fvc_mute", "audio_mute")) == n_mute_events
    # the intercept order itself still went out
    focc = _events(st, "focc_words")
    w2 = focc[-2][1]
    order = int("".join(str(int(b)) for b in np.asarray(w2)[23:28]), 2)
    assert order == 9
    # a shared-slot station keeps the legacy global reset (parity)
    st2 = BaseStation()
    st2.fvc_mute, st2.audio_mute = False, True
    st2.handle_burst(words, ok)
    assert st2.fvc_mute is True and st2.audio_mute is False


@pytest.mark.parametrize("port", [64653])
def test_tcp_command_split_across_segments_and_newline_delimited_debug(port):
    """r5 review findings: (a) a command split across two TCP segments
    must execute as ONE command (line-buffered framing, not
    segment-boundary framing); (b) every debug broadcast is
    newline-delimited so operator clients can parse line-oriented
    output; (c) an unterminated trailing command is flushed at EOF."""
    async def run():
        st = BaseStation()
        srv = CommandServer(st, port=port)
        await srv.start()
        reader, writer = await asyncio.open_connection("127.0.0.1", port)
        # one command, two segments, split mid-MIN
        writer.write(b"page 55512")
        await writer.drain()
        await asyncio.sleep(0.05)
        writer.write(b"34567\npage 415")
        await writer.drain()
        data = await asyncio.wait_for(reader.read(200), timeout=5)
        assert b"paging" in data and data.endswith(b"\n")
        # the second command is still incomplete: one page executed
        assert len([e for e in st.events if e.kind == "focc_words"]) == 1
        # EOF flushes the trailing unterminated command
        writer.write(b"5559876")
        await writer.drain()
        writer.write_eof()
        await asyncio.sleep(0.2)
        assert len([e for e in st.events if e.kind == "focc_words"]) == 2
        writer.close()
        await srv.stop()

    asyncio.run(run())


def _burst_from(words_list):
    words = np.zeros((7, 36), np.uint8)
    ok = np.zeros(7, bool)
    for i, w in enumerate(words_list):
        words[i] = w
        ok[i] = True
    return words, ok


def test_shared_fvc_assignment_never_clobbers_live_call():
    """r5 review finding: in shared-FVC mode a second page response used
    to get plan[0] unconditionally, REPLACING the live call's
    supervisor (orphaning it with no release ever sent).  Now the
    preferred channel falls over to the other plan channel, and a third
    call is dropped with a debug."""
    from amps_tpu.tx import recc_ms

    st = BaseStation()
    for m in ("5551234567", "4155559876", "2125550000"):
        st.handle_burst(*_burst_from(recc_ms.page_response_words(m)))
    # call 1 on 355, call 2 falls over to 356, call 3 dropped
    assert sorted(st.supervisors) == [355, 356]
    sup1 = st.supervisors[355]
    assert any("no free voice channel" in str(e.payload)
               for e in st.events if e.kind == "debug")
    # a further response must not replace the live supervisor either
    st.handle_burst(*_burst_from(
        recc_ms.page_response_words("5551234567")))
    assert st.supervisors[355] is sup1


def test_origination_bad_called_word_dropped_and_bad_word_c_tolerated():
    """r5 review finding: words beyond A/B were parsed without their
    word_ok gates — a failed called-address word dialed garbage digits
    (the station would assign a channel and page a WRONG number).  Now
    a failed called word drops the origination; a failed word C merely
    loses the (informational) ESN."""
    from amps_tpu.tx import recc_ms

    wl = recc_ms.origination_words("5551234567", "5551230000",
                                   esn=0xDEAD)
    assert len(wl) == 5                     # A, B, C, called x2

    # failed called-address word: dropped, no page, no channel assigned
    st = BaseStation()
    words, ok = _burst_from(wl)
    ok[3] = False
    st.handle_burst(words, ok)
    assert not st.supervisors
    assert not [e for e in st.events if e.kind == "command"]
    assert any("called-address word failed" in str(e.payload)
               for e in st.events if e.kind == "debug")

    # failed word C: served without the ESN
    st2 = BaseStation()
    words2, ok2 = _burst_from(wl)
    ok2[2] = False
    st2.handle_burst(words2, ok2)
    cmds = [e.payload for e in st2.events if e.kind == "command"]
    assert cmds == ["page 5551230000"]
    assert any("word C failed decode" in str(e.payload)
               for e in st2.events if e.kind == "debug")
