"""Shared DSP kernels: filter design, FIR/decimators, FM primitives,
polyphase channelizers."""

from amps_tpu.dsp.windows import firdes_low_pass  # noqa: F401
from amps_tpu.dsp import iq  # noqa: F401
from amps_tpu.dsp.fm import (  # noqa: F401
    fm_modulate_symbols,
    fm_modulate,
    quadrature_demod,
)
from amps_tpu.dsp.fir import (  # noqa: F401
    fir_filter,
    fir_filter_iq,
    freq_xlating_fir,
    polyphase_interpolate,
    polyphase_interpolate_iq,
)
