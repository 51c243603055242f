"""Blank-and-burst slot source tests."""

import wave

import numpy as np

from amps_tpu.control.station import BaseStation
from amps_tpu.runtime.sources import VoiceFvcSlot, WavAudioSource
from amps_tpu.rx.voice import detect_scc
from amps_tpu.dsp.fm import quadrature_demod


def _demod_norm(iq, pipe):
    import jax.numpy as jnp
    d, _ = quadrature_demod(jnp.asarray(iq))
    sens = 2 * np.pi * pipe.deviation_hz / pipe.chan_rate
    return np.asarray(d) / sens


def test_blank_and_burst_switching():
    st = BaseStation()
    slot = VoiceFvcSlot(st, audio_source=lambda n: np.zeros(n, np.float32))
    n = 12000
    # initial state: fvc muted -> voice + SAT
    iq = slot(n)
    assert iq.shape == (n, 2)
    scc, levels = detect_scc(_demod_norm(iq[2000:], st.pipe)[None],
                             st.pipe.chan_rate)
    assert int(np.asarray(scc)[0]) == st.system.scc
    # alert turns FVC data on ('fvc alert' then 'fvc on' mutes audio)
    st.handle_command("fvc alert")
    st.handle_command("fvc on")
    iq2 = slot(n)
    d = _demod_norm(iq2, st.pipe)
    # FSK data: discriminator output is near +/-1 (not a 6 kHz tone)
    frac_saturated = (np.abs(np.abs(d[100:]) - 1.0) < 0.45).mean()
    assert frac_saturated > 0.8
    # back to voice
    st.handle_command("fvc off")
    iq3 = slot(n)
    scc3, _ = detect_scc(_demod_norm(iq3[2000:], st.pipe)[None],
                         st.pipe.chan_rate)
    assert int(np.asarray(scc3)[0]) == st.system.scc


def test_wav_audio_source(tmp_path):
    path = str(tmp_path / "t.wav")
    rate = 16000
    tone = (0.5 * np.sin(2 * np.pi * 440 * np.arange(800) / rate))
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes((tone * 32767).astype(np.int16).tobytes())
    src = WavAudioSource(path)
    a = src(2000)  # loops past the 800-sample file
    assert a.shape == (2000,)
    assert np.allclose(a[:800], a[800:1600], atol=2e-4)  # looped
    assert np.abs(a).max() > 0.4
