"""Checkpoint/resume: a resumed receiver produces the identical stream of
burst reports as an uninterrupted one."""

import numpy as np

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
