"""bf16 channel-transform option: decode quality unaffected."""

import numpy as np
import jax.numpy as jnp

from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fm_modulate_symbols, quadrature_demod
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.rx import correlator, decoder
from amps_tpu.tx import recc_ms


def test_bf16_transform_still_decodes():
    spec = MultichannelSpec(num_channels=8, taps_per_phase=8)
    sps = spec.chan_sps
    words = recc_ms.page_response_words("5551234567")
    syms = recc_ms.burst_symbols(words, 0, sps)
    sens = 2 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
    bb, _ = fm_modulate_symbols(syms.astype(np.int8), sens)
    hops = 24000
    Y = np.zeros((hops, 8, 2), np.float32)
    Y[2000:2000 + len(np.asarray(bb)), 3] = np.asarray(bb)
    x, _ = chz.synthesize(Y, spec.chz_spec,
                          chz.synthesizer_init(spec.chz_spec))

    L, P = spec.chz_spec.ntaps, spec.chz_spec.hop
    x_ext = np.concatenate([np.zeros((L - P, 2), np.float32),
                            np.asarray(x)])
    h = jnp.asarray(chz.prototype_taps(8, 8))
    y32 = chz._analyze_block_chmajor(x_ext, h, 8, 8, jnp.int32(0), False)
    y16 = chz._analyze_block_chmajor(x_ext, h, 8, 8, jnp.int32(0), True)
    # transforms agree to bf16 precision
    err = np.abs(np.asarray(y32) - np.asarray(y16)).max()
    assert err < 0.03, err
    # and the burst still decodes bit-exact through the bf16 path
    demod, _ = quadrature_demod(jnp.asarray(y16)[3])
    demod = np.asarray(demod)
    pad = np.zeros(correlator.CAPTURE_SYMBOLS * sps, np.float32)
    starts, valid, q, hard, _ = correlator.find_and_extract(
        np.concatenate([demod, pad]), sps, 1, 0.5)
    assert np.asarray(valid)[0]
    dec = decoder.decode_bursts(np.asarray(hard)[0])
    assert np.asarray(dec.word_ok)[:2].all()
    assert np.array_equal(np.asarray(dec.words)[0], words[0])


def test_io_bf16_pipeline_still_decodes():
    """io_bf16 (bf16 data plane) decodes a planted burst bit-exact."""
    from amps_tpu.parallel.pipeline import rx_multichannel_block

    spec = MultichannelSpec(num_channels=16, fold="bank", io_bf16=True)
    _run_bf16_pipeline(spec)


def test_corr_bf16_pipeline_still_decodes():
    """corr_bf16 (bf16 correlation/quality plane) decodes bit-exact."""
    from amps_tpu.parallel.pipeline import rx_multichannel_block

    spec = MultichannelSpec(num_channels=16, fold="bank", io_bf16=True,
                            corr_bf16=True)
    _run_bf16_pipeline(spec)


def _run_bf16_pipeline(spec):
    from amps_tpu.parallel.pipeline import rx_multichannel_block
    sps = spec.chan_sps
    words = recc_ms.page_response_words("5551234567")
    syms = recc_ms.burst_symbols(words, 0, sps)
    sens = 2 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
    bb, _ = fm_modulate_symbols(syms.astype(np.int8), sens)
    hops = 16384
    Y = np.zeros((hops, 16, 2), np.float32)
    Y[2000:2000 + len(np.asarray(bb)), 5] = np.asarray(bb)
    x, _ = chz.synthesize(jnp.asarray(Y), spec.chz_spec,
                          chz.synthesizer_init(spec.chz_spec))
    out = rx_multichannel_block(jnp.asarray(np.asarray(x)), spec,
                                max_bursts=1)
    assert np.asarray(out["valid"])[5, 0]
    assert np.asarray(out["word_ok"])[5, 0, :2].all()
    assert np.array_equal(np.asarray(out["words"])[5, 0, 0], words[0])
    assert np.array_equal(np.asarray(out["words"])[5, 0, 1], words[1])
