"""Voice-channel synthesis: NBFM audio + SAT tone.

Reference path (grc/ampsbs.grc, SURVEY.md §2 'Voice path + SAT'): WAV
16 kHz audio + 6 kHz SAT cosine (amplitude 0.05, SCC-dependent
5970/6000/6030 Hz) -> analog_nbfm_tx (preemphasis tau 75 µs, max
deviation 8 kHz) -> resample to the channel rate -> mixer.  Here the
output is riq baseband at the channelizer per-channel rate (60 ksps),
ready to drop into a synthesis-bank slot; blank-and-burst replaces this
signal with FVC data when the station unmutes FVC (the mute pair of
grc/ampsbs.grc blocks_mute_xx).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import jax.numpy as jnp
from jax import lax

from amps_tpu.config import PipelineConfig, SystemConfig
from amps_tpu.dsp.fir import polyphase_interpolate
from amps_tpu.dsp.fm import fm_modulate
from amps_tpu.dsp.windows import firdes_low_pass


def preemphasis(audio, fs: float, tau: float = 75e-6, state=0.0):
    """FM preemphasis: first-order high-shelf (bilinear transform of
    H(s) = 1 + s*tau), normalized to unity gain at DC — the role of GR's
    fm_preemph inside nbfm_tx.  Sequential 1-pole IIR via scan (audio
    rates are tiny next to IQ rates).

    Returns (filtered, final state).
    """
    audio = jnp.asarray(audio, jnp.float32)
    # digital: y[n] = b0 x[n] + b1 x[n-1] - a1 y[n-1]
    k = 2.0 * fs * tau
    # H(z) from bilinear transform of (1 + s tau) with gain 1 at DC,
    # pole added at fh = 0.925 * fs/2 to keep it proper (GR convention)
    fh = 0.925 * fs / 2.0
    kh = np.tan(np.pi * fh / fs)
    b0 = (1.0 + k) / (1.0 + kh)
    b1 = (1.0 - k) / (1.0 + kh)
    a1 = (1.0 - kh) / (1.0 + kh)

    def scan_fn(carry, xn):
        x_prev, y_prev = carry
        y = b0 * xn + b1 * x_prev + a1 * y_prev
        return (xn, y), y

    (xl, yl), out = lax.scan(scan_fn, (jnp.float32(0.0),
                                       jnp.asarray(state, jnp.float32)),
                             audio)
    # normalize DC gain to 1: H(1) = (b0+b1)/(1-a1)
    dc = (b0 + b1) / (1.0 - a1)
    return out / jnp.float32(dc), yl


def rational_resample(x, up: int, down: int, fs_in: float):
    """x at fs_in -> fs_in * up / down via polyphase interp + decimate."""
    cutoff = 0.45 * min(fs_in, fs_in * up / down)
    taps = firdes_low_pass(1.0, fs_in * up, cutoff, 0.1 * cutoff, "hamming")
    y, _ = polyphase_interpolate(jnp.asarray(x, jnp.float32), taps * up, up)
    return y[..., ::down]


def voice_channel_baseband(audio, system: Optional[SystemConfig] = None,
                           pipe: Optional[PipelineConfig] = None,
                           sat: bool = True, phase0: float = 0.0,
                           t0: float = 0.0):
    """Audio (n,) at audio_rate -> riq baseband (n * chan_rate/audio_rate, 2)
    at the channelizer per-channel rate, NBFM modulated with SAT.

    SAT is summed into the modulating signal scaled so it produces its
    share of deviation (reference: amp 0.05 on the 6 kHz cosine,
    grc/ampsbs.grc:360,967).
    """
    system = system or SystemConfig()
    pipe = pipe or PipelineConfig()
    audio = jnp.asarray(audio, jnp.float32)
    emph, _ = preemphasis(audio, pipe.audio_rate)
    # resample audio_rate (16k) -> chan_rate (60k): ratio 15/4
    from math import gcd
    g = gcd(pipe.chan_rate, pipe.audio_rate)
    up, down = pipe.chan_rate // g, pipe.audio_rate // g
    m = rational_resample(emph, up, down, pipe.audio_rate)
    if sat:
        n = m.shape[-1]
        t = (jnp.arange(n) / pipe.chan_rate) + t0
        m = m + pipe.sat_amplitude * jnp.cos(
            2.0 * np.pi * system.sat_freq_hz * t).astype(jnp.float32)
    sens = 2.0 * np.pi * pipe.deviation_hz / pipe.chan_rate
    iq, phase_end = fm_modulate(m, sens, phase0)
    return iq, phase_end
