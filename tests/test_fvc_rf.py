"""FVC-over-RF end-to-end: the station alerts a mobile on a voice
channel; the 'mobile' decodes the FVC word from the wideband RF."""

import numpy as np
import jax.numpy as jnp

from amps_tpu.codec.bch import focc_bch_decode
from amps_tpu.codec.manchester import manchester_decode_bits
from amps_tpu.control.station import BaseStation
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.ref import words_ref
from amps_tpu.runtime.sources import VoiceFvcSlot
from amps_tpu.runtime.streamer import MultichannelTransmitter

SPEC = MultichannelSpec(num_channels=8, taps_per_phase=8)
WSYNC = np.array([1, 1, 1, 0, 0, 0, 1, 0, 0, 1, 0], np.uint8)


def _mobile_decode_fvc(demod, sps):
    """Find a [wsync + 40-bit word] in an FVC symbol stream."""
    nsym = len(demod) // sps
    # integrate-and-dump at each phase; pick the phase with most energy
    best = None
    for p in range(sps):
        m = demod[p: p + nsym * sps - sps].reshape(-1, sps).mean(-1)
        hard = (m >= 0).astype(np.uint8)
        bits, _ = manchester_decode_bits(hard[: len(hard) - len(hard) % 2])
        bits = np.asarray(bits)
        # scan for word sync
        for off in range(len(bits) - 51):
            if np.array_equal(bits[off: off + 11], WSYNC):
                rx40 = bits[off + 11: off + 51]
                dec, ok = focc_bch_decode(rx40[None])
                if bool(np.asarray(ok)[0]):
                    return np.asarray(dec)[0]
    return None


def test_fvc_alert_over_rf():
    st = BaseStation(sps=SPEC.chan_sps)
    tx = MultichannelTransmitter(SPEC, control_channels=[1])
    st.focc = tx.focc[1]
    slot = VoiceFvcSlot(st)
    tx.set_channel_source(2, slot)   # voice channel on slot 2

    # page response -> station alerts the mobile (FVC on, audio muted)
    from amps_tpu.tx import recc_ms
    words, ok = np.zeros((7, 36), np.uint8), np.zeros(7, bool)
    for i, w in enumerate(recc_ms.page_response_words("5551234567")):
        words[i] = w
        ok[i] = True
    st.handle_burst(words, ok)
    assert st.fvc_mute is False

    rf = np.asarray(tx.next_block())
    ych, _ = chz.analyze(rf, SPEC.chz_spec,
                         chz.analyzer_init(SPEC.chz_spec), chmajor=True)
    y2 = np.asarray(ych)[2]
    demod, _ = quadrature_demod(jnp.asarray(y2[None]))
    demod = np.asarray(demod)[0]
    info28 = _mobile_decode_fvc(demod[2000:40000], SPEC.chan_sps)
    assert info28 is not None, "no FVC word decoded from RF"
    want = words_ref.fvc_word1_general(st.system.scc, 0, 0, 1)  # alert
    assert np.array_equal(info28, want)
