"""TX modulator chain: ±1 symbols -> FSK baseband -> interpolated IQ.

Reference chain (grc/ampsbs.grc): char_to_float -> frequency_modulator_fc
(sensitivity 2π·8000/100000) -> pfb_interpolator_ccf x4 with
firdes.low_pass(1, 400e3, 10e3, 5e3) taps -> per-channel mixer.  Here the
whole chain is one jitted function, batched over channels.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp

from amps_tpu.config import PipelineConfig
from amps_tpu.dsp.fm import fm_modulate_symbols
from amps_tpu.dsp.fir import polyphase_interpolate_iq
from amps_tpu.dsp.windows import firdes_low_pass


def fsk_baseband(symbols, pipe: Optional[PipelineConfig] = None,
                 phase_accum0=0):
    """±1 symbols at sym_rate -> complex FSK baseband at sym_rate.

    Returns (iq, accumulator) for streaming continuity."""
    pipe = pipe or PipelineConfig()
    sens = 2.0 * np.pi * pipe.deviation_hz / pipe.sym_rate
    return fm_modulate_symbols(symbols, sens, phase_accum0)


@functools.cache
def tx_interp_taps(tx_rate: int = 400_000) -> np.ndarray:
    """The reference's TX interpolation LPF (grc/ampsbs.grc:2227)."""
    return firdes_low_pass(1.0, tx_rate, 10_000.0, 5_000.0, "hamming")


@functools.partial(jax.jit, static_argnames=("interp",))
def _interp_jit(iq, taps, interp, history):
    return polyphase_interpolate_iq(iq, taps, interp, history)


def fm_modulate(symbols, pipe: Optional[PipelineConfig] = None,
                phase_accum0=0, interp_history=None):
    """Full TX chain for one block: symbols at sym_rate -> IQ at tx_rate.

    symbols: (..., n) int8.  Returns (iq riq (..., n*interp, 2), state)
    where state = (phase accumulator, interp filter history).
    """
    pipe = pipe or PipelineConfig()
    assert pipe.tx_rate % pipe.sym_rate == 0
    interp = pipe.tx_rate // pipe.sym_rate
    iq, accum = fsk_baseband(symbols, pipe, phase_accum0)
    taps = jnp.asarray(tx_interp_taps(pipe.tx_rate))
    out, hist = _interp_jit(iq, taps, interp, interp_history)
    return out, (accum, hist)
