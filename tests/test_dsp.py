"""DSP primitive tests: filter design, mixers, streaming equivalence."""

import numpy as np

from amps_tpu.dsp.fir import fir_filter, fir_filter_iq, freq_xlating_fir
from amps_tpu.dsp.windows import compute_ntaps, firdes_low_pass
from amps_tpu.rx.frontend import rx_lpf_taps


def test_firdes_ntaps_matches_gr():
    # GR firdes: ntaps = att/(22*trans/fs), odd. Blackman att=74.
    assert compute_ntaps(400_000, 4_500, "blackman") == 299
    assert compute_ntaps(400_000, 5_000, "hamming") == 193
    assert len(rx_lpf_taps()) == 299


def test_firdes_dc_gain():
    taps = firdes_low_pass(3.0, 400e3, 10e3, 4.5e3, "blackman")
    assert abs(taps.sum() - 3.0) < 1e-5
    # stopband: response at 50 kHz is tiny
    w = np.exp(-2j * np.pi * 50e3 / 400e3 * np.arange(len(taps)))
    assert abs((taps * w).sum()) < 1e-3


def test_freq_xlating_recovers_offset_signal():
    """A tone at -160 kHz (the reference rx_offset) is translated to DC
    and survives decimation — the grc/ampsbs.grc:1815 configuration."""
    fs = 400e3
    n = 40960
    t = np.arange(n) / fs
    f0 = -160e3
    sig = np.stack([np.cos(2 * np.pi * f0 * t),
                    np.sin(2 * np.pi * f0 * t)], -1).astype(np.float32)
    taps = rx_lpf_taps()
    y, hist, nxt = freq_xlating_fir(sig, taps, f0, fs, 2)
    y = np.asarray(y)[400:]  # skip transient
    # DC: constant phasor with gain ~= 3 (lpf gain)
    mag = np.hypot(y[:, 0], y[:, 1])
    assert abs(mag.mean() - 3.0) < 0.05
    assert mag.std() < 0.02
    phase = np.unwrap(np.arctan2(y[:, 1], y[:, 0]))
    slope = np.polyfit(np.arange(len(phase)), phase, 1)[0]
    assert abs(slope) < 1e-3  # no residual rotation


def test_streaming_fir_equivalence():
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, 4096).astype(np.float32)
    taps = firdes_low_pass(1.0, 1.0, 0.1, 0.05, "hamming")
    y1, _ = fir_filter(x, taps)
    st = None
    parts = []
    for i in range(0, 4096, 512):
        y, st = fir_filter(x[i:i + 512], taps, history=st)
        parts.append(np.asarray(y))
    y2 = np.concatenate(parts)
    assert np.allclose(np.asarray(y1), y2, atol=1e-5)


def test_streaming_freq_xlating_phase_continuity():
    fs = 400e3
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (8192, 2)).astype(np.float32)
    taps = firdes_low_pass(1.0, fs, 10e3, 5e3, "hamming")
    y1, _, _ = freq_xlating_fir(x, taps, -100e3, fs, 2)
    st, idx = None, 0
    parts = []
    for i in range(0, 8192, 2048):
        y, st, idx = freq_xlating_fir(x[i:i + 2048], taps, -100e3, fs, 2,
                                      history=st, phase_idx0=idx)
        parts.append(np.asarray(y))
    y2 = np.concatenate(parts)
    assert np.allclose(np.asarray(y1), y2, atol=2e-4)


def test_fsk_manchester_baseband_bitexact():
    # the 2-template fast path must match the generic accumulate->expj
    # modulator bit-for-bit (same f32 phase values, same expj)
    from amps_tpu.codec.manchester import manchester_encode_symbols
    from amps_tpu.dsp.fm import fm_modulate_symbols, fsk_manchester_baseband
    rng = np.random.default_rng(3)
    bits = rng.integers(0, 2, (4, 200)).astype(np.uint8)
    for sps, accum0 in ((3, 0), (5, 0), (3, 7), (1, -2)):
        syms = manchester_encode_symbols(bits, sps)
        want, acc_w = fm_modulate_symbols(syms, 0.8378, accum0)
        got, acc_g = fsk_manchester_baseband(bits, sps, 0.8378, accum0)
        assert np.array_equal(np.asarray(got), np.asarray(want)), sps
        assert np.array_equal(np.asarray(acc_g),
                              np.asarray(acc_w).astype(np.int32))
