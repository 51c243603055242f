"""Checkpoint/resume: a resumed receiver produces the identical stream of
burst reports as an uninterrupted one."""

import numpy as np
import pytest

from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.runtime.state import (load_receiver, load_transmitter,
                                    save_receiver, save_transmitter)
from amps_tpu.runtime.streamer import (MultichannelReceiver,
                                       MultichannelTransmitter)
from amps_tpu.tx import recc_ms

SPEC = MultichannelSpec(num_channels=8, taps_per_phase=8)


def _stream():
    from amps_tpu.dsp import channelizer as chz
    from amps_tpu.dsp.fm import fm_modulate_symbols

    words = recc_ms.page_response_words("5551234567")
    syms = recc_ms.burst_symbols(words, 0, SPEC.chan_sps)
    sens = 2 * np.pi * SPEC.pipe.deviation_hz / SPEC.pipe.chan_rate
    bb, _ = fm_modulate_symbols(syms.astype(np.int8), sens)
    hops = 36000
    Y = np.zeros((hops, 8, 2), np.float32)
    Y[16000:16000 + len(np.asarray(bb)), 2] = np.asarray(bb)
    x, _ = chz.synthesize(Y, SPEC.chz_spec, chz.synthesizer_init(SPEC.chz_spec))
    return np.asarray(x)


def test_receiver_checkpoint_resume(tmp_path):
    x = _stream()
    half = (len(x) // 2 // SPEC.chz_spec.hop) * SPEC.chz_spec.hop

    rx_full = MultichannelReceiver(SPEC, threshold=0.5)
    full = rx_full.push(x[:half]) + rx_full.push(x[half:])

    rx_a = MultichannelReceiver(SPEC, threshold=0.5)
    got_a = rx_a.push(x[:half])
    ckpt = str(tmp_path / "rx.npz")
    save_receiver(ckpt, rx_a)
    rx_b = MultichannelReceiver(SPEC, threshold=0.5)
    load_receiver(ckpt, rx_b)
    got_b = rx_b.push(x[half:])

    resumed = got_a + got_b
    assert len(resumed) == len(full) == 1
    assert resumed[0].channel == full[0].channel == 2
    assert resumed[0].abs_symbol == full[0].abs_symbol
    assert np.array_equal(resumed[0].words, full[0].words)


def test_transmitter_checkpoint_resume(tmp_path):
    from amps_tpu.codec import words as W
    from amps_tpu.tx.focc import STREAM_BOTH

    tx_a = MultichannelTransmitter(SPEC, control_channels=[1])
    tx_a.next_block()
    tx_a.focc[1].push_words(STREAM_BOTH, [np.asarray(W.control_filler_word())])
    ckpt = str(tmp_path / "tx.npz")
    save_transmitter(ckpt, tx_a)

    tx_b = MultichannelTransmitter(SPEC, control_channels=[1])
    load_transmitter(ckpt, tx_b)
    assert tx_b.focc[1].queue_depth() == 1
    a = np.asarray(tx_a.next_block())
    b = np.asarray(tx_b.next_block())
    assert np.array_equal(a, b)


def test_station_checkpoint_resume(tmp_path):
    """A resumed BaseStation continues the exact FOCC/FVC symbol streams
    and the supervision timeline of an uninterrupted one."""
    from amps_tpu.control.station import BaseStation
    from amps_tpu.runtime.state import load_station, save_station

    def make_burst():
        words = recc_ms.page_response_words("5551234567")
        arr = np.zeros((7, 36), np.uint8)
        ok = np.zeros(7, bool)
        for i, w in enumerate(words):
            arr[i] = w
            ok[i] = True
        return arr, ok

    def ring_frames(n):  # SAT (scc=1) + ST present: mobile ringing
        lv = np.zeros((n, 4), np.float32)
        lv[:, 1] = 0.05
        lv[:, 3] = 0.05
        return lv, np.full(n, 1e-3, np.float32)

    def drive_to_checkpoint(bs):
        arr, ok = make_burst()
        bs.handle_burst(arr, ok)                 # page response -> alert
        bs.handle_command("page 2135551212")     # second FOCC queue entry
        part = bs.fvc.next_block(4000)           # mid-burst offset
        lv, pw = ring_frames(50)                 # 0.5 s of ringing
        bs.push_supervision(355, lv, pw)
        return part

    bs_full = BaseStation()
    part_full = drive_to_checkpoint(bs_full)

    bs_a = BaseStation()
    part_a = drive_to_checkpoint(bs_a)
    assert np.array_equal(part_a, part_full)
    ckpt = str(tmp_path / "station.npz")
    save_station(ckpt, bs_a)
    bs_b = BaseStation()
    load_station(ckpt, bs_b)
    assert (bs_b.fvc_mute, bs_b.audio_mute) == \
        (bs_full.fvc_mute, bs_full.audio_mute)

    # continued FOCC superframes pop the same queued pairs
    for _ in range(3):
        a = np.asarray(bs_full.focc.next_superframe_symbols())
        b = np.asarray(bs_b.focc.next_superframe_symbols())
        assert np.array_equal(a, b)

    # continued FVC stream (offset + repeat timer) is bit-identical
    assert np.array_equal(bs_full.fvc.next_block(6000),
                          bs_b.fvc.next_block(6000))
    assert bs_full.fvc._timer == bs_b.fvc._timer
    assert bs_full.fvc._off == bs_b.fvc._off

    # supervision resumes mid-alert: ST drop -> answer at the same time
    lv, pw = ring_frames(10)
    lv[:, 3] = 0.0                              # ST drops: answered
    for bs in (bs_full, bs_b):
        bs.push_supervision(355, lv, pw)
    ans_full = [e for e in bs_full.supervisors[355].events
                if e.kind == "answer"]
    ans_b = [e for e in bs_b.supervisors[355].events if e.kind == "answer"]
    assert len(ans_full) == len(ans_b) == 1
    assert abs(ans_full[0].t - ans_b[0].t) < 1e-9
    assert bs_full.supervisors[355].state == bs_b.supervisors[355].state \
        == "conversation"
    # the answer flipped both stations' mutes identically (fvc off)
    assert (bs_full.fvc_mute, bs_full.audio_mute) == \
        (bs_b.fvc_mute, bs_b.audio_mute) == (True, False)


def test_resilient_receiver_recovers_from_push_failure():
    """Elastic recovery (runtime/resilient.py): the receiver 'dies'
    mid-stream (push raises), is rebuilt from the last snapshot, and
    the replayed stream delivers the exact reports of an uninterrupted
    run, exactly once."""
    from amps_tpu.runtime.resilient import ResilientReceiver

    x = _stream()
    P = SPEC.chz_spec.hop
    blk = 4096 * P
    blocks = [x[i:i + blk] for i in range(0, (len(x) // blk) * blk, blk)]

    def make():
        return MultichannelReceiver(SPEC, threshold=0.5)

    # uninterrupted baseline
    rx_ref = make()
    want = []
    for b in blocks:
        want += rx_ref.push(b)

    # failing run: the 5th push dies twice before recovery succeeds
    res = ResilientReceiver(make, checkpoint_blocks=3)
    calls = {"n": 0, "fail_at": 5, "fails_left": 2}
    orig_cls_push = MultichannelReceiver.push

    def flaky_push(self, b):
        calls["n"] += 1
        if calls["n"] == calls["fail_at"] and calls["fails_left"] > 0:
            calls["fails_left"] -= 1
            calls["n"] -= 1          # the retry re-counts this push
            raise RuntimeError("injected device loss")
        return orig_cls_push(self, b)

    MultichannelReceiver.push = flaky_push
    try:
        got = []
        for b in blocks:
            got += res.push(b)
    finally:
        MultichannelReceiver.push = orig_cls_push

    assert res.recoveries >= 1
    assert len(got) == len(want) == 1
    assert got[0].channel == want[0].channel
    assert got[0].abs_symbol == want[0].abs_symbol
    assert np.array_equal(got[0].words, want[0].words)


def test_resilient_final_failure_leaves_ring_clean():
    """If every retry fails, the failed block is popped from the replay
    ring before re-raising: a caller that catches and re-pushes the
    same block must not double-append it (a later recovery would then
    replay it twice, breaking exactly-once delivery)."""
    from amps_tpu.runtime.resilient import ResilientReceiver

    class Boom(Exception):
        pass

    class FakeRx:
        depth, on_burst, sps = 1, None, 3
        _hist = np.zeros((4, 2)); _parity = 0
        _carry = np.zeros((2, 6)); _prev = np.zeros((2, 2))
        _abs_base = 0; _last_seen = np.zeros(2, np.int64)
        _pw_carry = np.zeros((2, 6), np.float32); _sup_carry = None

        def push(self, blk):
            raise Boom()

        def flush(self):
            return []

    rr = ResilientReceiver(lambda: FakeRx(), max_retries=1)
    with pytest.raises(Boom):
        rr.push(np.zeros((8, 2), np.float32))
    assert rr._ring == []


def test_sharded_receiver_checkpoint_resume():
    """Mid-stream checkpoint -> FRESH ShardedReceiver -> restore: the
    resumed sharded stream reports bit-identically to an uninterrupted
    receiver on the same blocks (the sharded mirror of the
    MultichannelReceiver checkpoint test)."""
    import jax
    from amps_tpu.eval.traffic import MobileEvent, synthesize_reverse_band
    from amps_tpu.parallel.mesh import make_mesh, MeshSpec
    from amps_tpu.parallel.pipeline import MultichannelSpec
    from amps_tpu.parallel.stream import ShardedReceiver
    from amps_tpu.runtime.state import (load_sharded_receiver,
                                        save_sharded_receiver)

    spec = MultichannelSpec(num_channels=8, taps_per_phase=8)
    Phop, tsize, csize = 4, 2, 2
    nh_row, nblocks = 12480, 3
    block_hops = tsize * nh_row
    total = nblocks * block_hops
    events = [MobileEvent("page_response", 2, 5000, "4155559876"),
              # spans the checkpoint boundary at block 1 -> 2
              MobileEvent("origination", 5, 2 * block_hops - 4000,
                          "5551234567", "7025551000", esn=11)]
    x = synthesize_reverse_band(events, spec, total, noise_sigma=0.001)
    mesh = make_mesh(MeshSpec(time=tsize, chan=csize), jax.devices()[:4])

    def mk():
        return ShardedReceiver(mesh, spec, max_bursts=4, threshold=0.55,
                               policy="first_ok", min_rssi=0.05)

    ref_rx = mk()
    ref = []
    for b in range(nblocks):
        ref += ref_rx.push(x[b * block_hops * Phop:(b + 1) * block_hops * Phop])
    ref += ref_rx.flush()

    rx = mk()
    got = rx.push(x[:block_hops * Phop]) \
        + rx.push(x[block_hops * Phop: 2 * block_hops * Phop])
    save_sharded_receiver("/tmp/sharded_ckpt.npz", rx)
    rx2 = mk()
    load_sharded_receiver("/tmp/sharded_ckpt.npz", rx2)
    got += rx2.push(x[2 * block_hops * Phop:])
    got += rx2.flush()

    assert len(got) == len(ref) == len(events)
    for a, b in zip(ref, got):
        assert a.channel == b.channel and a.abs_symbol == b.abs_symbol
        assert np.array_equal(a.words, b.words)
        assert np.array_equal(a.word_ok, b.word_ok)
        assert a.dcc == b.dcc and abs(a.rssi - b.rssi) < 1e-5


def test_sharded_supervision_carry_survives_checkpoint():
    """The sharded receiver's sub-frame supervision leftover is part of
    the checkpoint: a resumed stream produces the same supervision
    frame sequence (and therefore the same SAT/ST timers) as an
    uninterrupted one."""
    import jax
    import jax.numpy as jnp
    from amps_tpu.dsp import channelizer as chz
    from amps_tpu.dsp.fm import fm_modulate
    from amps_tpu.parallel.mesh import make_mesh, MeshSpec
    from amps_tpu.parallel.pipeline import MultichannelSpec
    from amps_tpu.parallel.stream import ShardedReceiver
    from amps_tpu.runtime.state import (load_sharded_receiver,
                                        save_sharded_receiver)

    spec = MultichannelSpec(num_channels=8, taps_per_phase=8)
    Phop, tsize, csize = 4, 2, 2
    fs = float(spec.pipe.chan_rate)
    sens = 2.0 * np.pi * spec.pipe.deviation_hz / fs
    nh_row = 11520
    block_hops = tsize * nh_row
    nblocks = 3
    n = nblocks * block_hops
    SLOT = 5
    t = np.arange(n) / fs
    m = 0.05 * np.cos(2 * np.pi * 6000.0 * t)        # SAT only
    Y = np.zeros((n, 8, 2), np.float32)
    Y[:, SLOT] = np.asarray(fm_modulate(jnp.asarray(m, jnp.float32),
                                        sens)[0])
    x, _ = chz.synthesize(jnp.asarray(Y), spec.chz_spec,
                          chz.synthesizer_init(spec.chz_spec))
    x = np.asarray(x)
    blk = block_hops * Phop

    def run(split):
        frames = []
        rx = ShardedReceiver(mesh, spec, supervision_slots=(SLOT,),
                             on_supervision=lambda s, lv, pw:
                             frames.append((lv.copy(), pw.copy())))
        for b in range(nblocks):
            rx.push(x[b * blk:(b + 1) * blk])
            if split and b == 0:
                save_sharded_receiver("/tmp/sharded_sup_ckpt.npz", rx)
                rx2 = ShardedReceiver(
                    mesh, spec, supervision_slots=(SLOT,),
                    on_supervision=lambda s, lv, pw:
                    frames.append((lv.copy(), pw.copy())))
                load_sharded_receiver("/tmp/sharded_sup_ckpt.npz", rx2)
                rx = rx2
        return frames

    mesh = make_mesh(MeshSpec(time=tsize, chan=csize), jax.devices()[:4])
    ref = run(split=False)
    got = run(split=True)
    assert len(ref) == len(got)
    for (lv_a, pw_a), (lv_b, pw_b) in zip(ref, got):
        assert lv_a.shape == lv_b.shape
        assert np.allclose(lv_a, lv_b, atol=1e-5)
        assert np.allclose(pw_a, pw_b, atol=1e-5)


def test_resilient_receiver_supervision_exactly_once():
    """Review finding (r4): recovery replay must not re-deliver
    supervision frames of already-delivered blocks — burst reports have
    positional dedup, supervision frames do not, and a double delivery
    advances SAT/ST timers twice.  A failing run must deliver exactly
    the uninterrupted run's frame count (and the same levels)."""
    import jax.numpy as jnp
    from amps_tpu.dsp import channelizer as chz
    from amps_tpu.dsp.fm import fm_modulate
    from amps_tpu.runtime.resilient import ResilientReceiver
    from amps_tpu.runtime.streamer import MultichannelReceiver

    spec = SPEC
    M = spec.num_channels
    P = spec.chz_spec.hop
    fs = float(spec.pipe.chan_rate)
    sens = 2.0 * np.pi * spec.pipe.deviation_hz / fs
    n = 8 * 4096
    t = np.arange(n) / fs
    m = 0.05 * np.cos(2 * np.pi * 6000.0 * t)
    Y = np.zeros((n, M, 2), np.float32)
    Y[:, 5] = np.asarray(fm_modulate(jnp.asarray(m, jnp.float32), sens)[0])
    x, _ = chz.synthesize(jnp.asarray(Y), spec.chz_spec,
                          chz.synthesizer_init(spec.chz_spec))
    x = np.asarray(x)
    blk = 4096 * P
    blocks = [x[i:i + blk] for i in range(0, n * P, blk)]

    def run(flaky):
        frames = []

        def make():
            return MultichannelReceiver(
                spec, threshold=0.5, supervision_slots=(5,),
                on_supervision=lambda s, lv, pw:
                frames.append((np.asarray(lv), np.asarray(pw))))

        res = ResilientReceiver(make, checkpoint_blocks=3)
        calls = {"n": 0}
        orig = MultichannelReceiver.push

        def flaky_push(self, b):
            calls["n"] += 1
            if flaky and calls["n"] == 5:
                raise RuntimeError("injected device loss")
            return orig(self, b)

        MultichannelReceiver.push = flaky_push
        try:
            for b in blocks:
                res.push(b)
        finally:
            MultichannelReceiver.push = orig
        return frames

    ref = run(flaky=False)
    got = run(flaky=True)
    assert len(got) == len(ref), (len(got), len(ref))
    for (lv_a, pw_a), (lv_b, pw_b) in zip(ref, got):
        assert np.allclose(lv_a, lv_b, atol=1e-5)
        assert np.allclose(pw_a, pw_b, atol=1e-5)


def test_resilient_receiver_callback_exception_is_not_a_device_failure():
    """Advisor finding (r4): a supervision-callback exception used to be
    caught by the retry loop as a device failure, triggering a
    rebuild+replay that re-delivered the block's supervision frames
    (double-advancing SAT/ST timers).  It must propagate to the caller
    with NO recovery, and every frame must still be delivered exactly
    once."""
    import jax.numpy as jnp
    from amps_tpu.dsp import channelizer as chz
    from amps_tpu.dsp.fm import fm_modulate
    from amps_tpu.runtime.resilient import ResilientReceiver
    from amps_tpu.runtime.streamer import MultichannelReceiver

    spec = SPEC
    M = spec.num_channels
    P = spec.chz_spec.hop
    fs = float(spec.pipe.chan_rate)
    sens = 2.0 * np.pi * spec.pipe.deviation_hz / fs
    n = 8 * 4096
    t = np.arange(n) / fs
    m = 0.05 * np.cos(2 * np.pi * 6000.0 * t)
    Y = np.zeros((n, M, 2), np.float32)
    Y[:, 5] = np.asarray(fm_modulate(jnp.asarray(m, jnp.float32), sens)[0])
    x, _ = chz.synthesize(jnp.asarray(Y), spec.chz_spec,
                          chz.synthesizer_init(spec.chz_spec))
    x = np.asarray(x)
    blk = 4096 * P
    blocks = [x[i:i + blk] for i in range(0, n * P, blk)]

    def run(poison_at):
        frames = []

        def cb(s, lv, pw):
            frames.append((np.asarray(lv), np.asarray(pw)))
            if len(frames) == poison_at:
                raise RuntimeError("station handler bug")

        def make():
            return MultichannelReceiver(
                spec, threshold=0.5, supervision_slots=(5,),
                on_supervision=cb)

        res = ResilientReceiver(make, checkpoint_blocks=3)
        raised = 0
        for b in blocks:
            try:
                res.push(b)
            except RuntimeError as e:
                assert "station handler bug" in str(e)
                # the block's burst reports ride on the exception: they
                # are already marked delivered (positional dedup), so a
                # return-value consumer would otherwise lose them
                assert isinstance(e.burst_reports, list)
                raised += 1
        return frames, res.recoveries, raised

    ref, rec0, raised0 = run(poison_at=0)       # never raises
    assert rec0 == 0 and raised0 == 0 and len(ref) > 2
    got, recoveries, raised = run(poison_at=2)
    # the exception surfaced exactly once, no rebuild happened, and the
    # frame sequence is identical (each delivered exactly once — the
    # poisoned frame was recorded before the callback raised)
    assert raised == 1
    assert recoveries == 0
    assert len(got) == len(ref)
    for (lv_a, pw_a), (lv_b, pw_b) in zip(ref, got):
        assert np.allclose(lv_a, lv_b, atol=1e-5)
        assert np.allclose(pw_a, pw_b, atol=1e-5)
