"""Full-system closed loop over channelized RF in BOTH directions: the
mobile hears its FOCC frames and FVC bursts from the transmitter's
actual wideband output (polyphase synthesis -> analysis -> FM demod),
and its RECC bursts travel through the synthesis bank into the real
streaming receiver.  One test drives a complete call: page -> response
-> assignment -> alert -> ring -> answer -> handoff -> mobile release.
This is the reference's whole-flowgraph role (ampsbs.grc) with the
phones simulated in software."""

import numpy as np

from amps_tpu.control.station import BaseStation
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fm_modulate_symbols, quadrature_demod
from amps_tpu.ms import SimMobile
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.runtime.sources import VoiceFvcSlot
from amps_tpu.runtime.streamer import (MultichannelReceiver,
                                       MultichannelTransmitter)

SPEC = MultichannelSpec(num_channels=8, taps_per_phase=8)
SPS = SPEC.chan_sps
FOCC_SLOT = 1
FVC_SLOT = 4          # carries AMPS channel 355's forward voice/FVC
REVERSE_SLOT = 3      # the mobile's reverse channel in the RX bank


def test_full_call_over_channelized_rf():
    station = BaseStation(sps=SPS)
    tx = MultichannelTransmitter(SPEC, control_channels=[FOCC_SLOT])
    station.focc = tx.focc[FOCC_SLOT]
    tx.set_channel_source(FVC_SLOT, VoiceFvcSlot(station))

    rx = MultichannelReceiver(
        SPEC, threshold=0.5, min_rssi=0.05,
        on_burst=lambda r: station.handle_burst(r.words, r.word_ok,
                                                r.bad_symbols))
    mob = SimMobile("5551234567", sps=SPS)
    ana_state = {"s": chz.analyzer_init(SPEC.chz_spec)}

    def forward():
        """One TX superframe of wideband RF -> the mobile's ears."""
        blk = np.asarray(tx.next_block())
        Y, ana_state["s"] = chz.analyze(blk, SPEC.chz_spec, ana_state["s"])
        Y = np.asarray(Y)                       # (hops, M, 2)
        focc_demod = np.asarray(quadrature_demod(Y[:, FOCC_SLOT])[0])
        mob.hear_focc(focc_demod, sps=SPS)
        fvc_demod = np.asarray(quadrature_demod(Y[:, FVC_SLOT])[0])
        mob.hear_fvc(fvc_demod, sps=SPS)

    def reverse():
        """Mobile outbox -> reverse RF -> the station's receiver."""
        while mob.outbox:
            kind, syms = mob.outbox.pop(0)
            bb, _ = fm_modulate_symbols(
                syms.astype(np.int8),
                2 * np.pi * SPEC.pipe.deviation_hz / SPEC.pipe.chan_rate)
            bb = np.asarray(bb)
            hops = len(bb) + 4000
            Y = np.zeros((hops, SPEC.num_channels, 2), np.float32)
            Y[2000: 2000 + len(bb), REVERSE_SLOT] = bb
            x, _ = chz.synthesize(Y, SPEC.chz_spec,
                                  chz.synthesizer_init(SPEC.chz_spec))
            x = np.asarray(x)
            P = SPEC.chz_spec.hop
            rx.push(x[: (len(x) // P) * P])

    # operator pages; the mobile hears it over RF and responds over RF
    station.handle_command("page 5551234567")
    forward()
    assert "paged" in mob.log
    reverse()
    assert station.supervisors[355].state == "alerting"

    # assignment (and B/I busy) arrive over the next superframe; the
    # FVC alert rides slot 4 of the same wideband block
    forward()
    assert mob.voice_chan == 355
    assert mob.state == "ringing", mob.log

    # ringing (ST) -> station holds alerting; answer -> conversation
    station.push_supervision(355, *mob.supervision_frames(30))
    assert station.supervisors[355].state == "alerting"
    mob.answer()
    station.push_supervision(355, *mob.supervision_frames(30))
    assert station.supervisors[355].state == "conversation"
    assert (station.fvc_mute, station.audio_mute) == (True, False)

    # operator handoff: designation rides slot 4 (channel 355's FVC)
    station.handle_command("handoff 355 356")
    forward()
    assert mob.voice_chan == 356, mob.log
    station.push_supervision(356, *mob.supervision_frames(50))
    assert station.supervisors[356].state == "conversation"

    # mobile hangs up: 1.8 s ST -> station releases
    mob.hang_up()
    station.push_supervision(356, *mob.supervision_frames(200))
    assert 356 not in station.supervisors
    assert [e for e in station.events if e.kind == "release"]
    assert mob.log == ["paged", "assigned 355", "ringing", "answered",
                       "handoff 355->356", "hang_up"], mob.log
