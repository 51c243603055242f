"""Forward-link transmitters: FOCC superframes, FVC bursts, FSK modulator,
voice+SAT synthesis."""

from amps_tpu.tx.focc import (  # noqa: F401
    focc_frames_symbols,
    FoccStream,
    superframe_word_pairs,
    registration_superframe_word_pairs,
)
from amps_tpu.tx.fvc import fvc_burst_symbols, FvcStream  # noqa: F401
from amps_tpu.tx.modulator import fm_modulate, fsk_baseband  # noqa: F401
