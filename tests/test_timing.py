"""Timing-recovery robustness: the correlation-peak timing must decode
bursts at ANY sample phase (the property that justifies replacing the
reference's per-sample Mueller&Müller feedback loop, SURVEY.md §3.5)."""

import numpy as np
import pytest

from amps_tpu import PipelineConfig
from amps_tpu.rx import correlator, decoder
from amps_tpu.rx.frontend import rx_frontend
from amps_tpu.tx import recc_ms
from amps_tpu.tx.modulator import fm_modulate

PIPE = PipelineConfig()


@pytest.mark.parametrize("shift", [0, 1, 3, 7, 9, 14])
def test_decode_at_any_sample_phase(shift):
    """Shift the whole RF capture by `shift` samples at 400 ksps (i.e.
    arbitrary timing phase vs the receiver's block grid): burst still
    found and decoded bit-exact."""
    words = recc_ms.page_response_words("5551234567")
    syms = recc_ms.burst_symbols(words, 0, PIPE.sps)
    idle = np.tile(np.array([1, -1], np.int8), 400)
    stream = np.concatenate([idle, syms, np.tile(
        np.array([1, -1], np.int8), 2000)]).astype(np.int8)
    iq, _ = fm_modulate(stream, PIPE)
    iq = np.asarray(iq)
    # integer shift at the 400 ksps rate = fractional shift of the
    # 200 ksps decimated grid and of the 10-sample symbol grid
    iq = np.concatenate([np.zeros((shift, 2), np.float32), iq])[
        : len(iq) - len(iq) % 2 + (len(iq) % 2)]
    n = len(iq) - len(iq) % 2
    demod, _ = rx_frontend(iq[:n], PIPE, center_freq=0.0)
    demod = np.asarray(demod)
    sps = 10
    pad = np.zeros(correlator.CAPTURE_SYMBOLS * sps, np.float32)
    starts, valid, q, hard, _ = correlator.find_and_extract(
        np.concatenate([demod, pad]), sps, 1, 0.5)
    assert np.asarray(valid)[0], f"no burst at shift {shift}"
    dec = decoder.decode_bursts(np.asarray(hard)[0])
    assert np.asarray(dec.word_ok)[:2].all(), f"decode failed at {shift}"
    got = np.asarray(dec.words)
    assert np.array_equal(got[0], words[0])
    assert np.array_equal(got[1], words[1])
