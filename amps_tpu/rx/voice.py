"""Reverse-voice-channel (RVC) monitor: NBFM demod + deemphasis + SAT.

The reference's ampsbs_rvc.grc variant taps a reverse voice channel
(second freq_xlating_fir at -100 kHz -> NBFM RX -> re-broadcast,
SURVEY.md §2 'RVC monitor variant').  Here a channelizer slot's riq
baseband at 60 ksps demodulates to audio at 16 kHz (matching the
reference's audio rate) with the SAT tone measured and stripped.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from jax import lax

from amps_tpu.config import PipelineConfig, SystemConfig
from amps_tpu.dsp.fm import quadrature_demod
from amps_tpu.dsp.windows import firdes_low_pass


def deemphasis(audio, fs: float, tau: float = 75e-6, state=0.0):
    """Single-pole FM deemphasis (inverse of tx.voice.preemphasis's
    shelf in the audio band): y[n] = a*x[n] + (1-a)*y[n-1]."""
    audio = jnp.asarray(audio, jnp.float32)
    a = jnp.float32(1.0 - np.exp(-1.0 / (fs * tau)))

    def scan_fn(y_prev, xn):
        y = a * xn + (1.0 - a) * y_prev
        return y, y

    yl, out = lax.scan(scan_fn, jnp.asarray(state, jnp.float32), audio)
    return out, yl


def nbfm_demod_audio(iq, system: Optional[SystemConfig] = None,
                     pipe: Optional[PipelineConfig] = None):
    """riq (n, 2) at chan_rate -> (audio (n*audio/chan,), sat_power dict).

    audio is deemphasized, lowpassed to 3 kHz and decimated to
    audio_rate; SAT measured before the audio lowpass.
    """
    system = system or SystemConfig()
    pipe = pipe or PipelineConfig()
    demod, _ = quadrature_demod(jnp.asarray(iq))
    sens = 2.0 * np.pi * pipe.deviation_hz / pipe.chan_rate
    demod = demod / jnp.float32(sens)        # normalize to modulating signal
    sat = sat_levels(demod, pipe.chan_rate)
    # audio LPF 3 kHz then decimate chan_rate -> audio_rate
    from math import gcd
    g = gcd(pipe.chan_rate, pipe.audio_rate)
    down = pipe.chan_rate // g               # 15
    up = pipe.audio_rate // g                # 4
    taps = firdes_low_pass(1.0, pipe.chan_rate * up, 3000.0, 1000.0,
                           "hamming")
    from amps_tpu.dsp.fir import polyphase_interpolate
    y, _ = polyphase_interpolate(demod, taps * up, up)
    audio = y[..., ::down]
    audio, _ = deemphasis(audio, pipe.audio_rate)
    return audio, sat


def sat_levels(demod, fs: float, block: Optional[int] = None):
    """Goertzel-style SAT detection: projection of the FM-demodulated
    signal onto the three SAT frequencies (5970/6000/6030 Hz).

    Returns dict scc -> amplitude estimate.  Implemented as two dot
    products per tone (cos/sin) — one fused matvec on device.
    """
    demod = jnp.asarray(demod, jnp.float32)
    n = demod.shape[-1]
    t = jnp.arange(n) / fs
    freqs = {0: 5970.0, 1: 6000.0, 2: 6030.0}
    out = {}
    for scc, f in freqs.items():
        c = jnp.cos(2.0 * np.pi * f * t)
        s = jnp.sin(2.0 * np.pi * f * t)
        re = jnp.sum(demod * c, axis=-1) * (2.0 / n)
        im = jnp.sum(demod * s, axis=-1) * (2.0 / n)
        out[scc] = jnp.sqrt(re * re + im * im)
    return out


def detect_scc(demod, fs: float):
    """Pick the SAT color code with the largest projection."""
    levels = sat_levels(demod, fs)
    arr = jnp.stack([levels[0], levels[1], levels[2]], axis=-1)
    return jnp.argmax(arr, axis=-1), arr
