"""Reverse-link receiver: RX front end, block-parallel timing recovery,
RECC burst correlator, and word decoder."""

from amps_tpu.rx.frontend import rx_frontend, RxFrontendState  # noqa: F401
from amps_tpu.rx.correlator import (  # noqa: F401
    trigger_template,
    find_bursts,
    extract_burst_symbols,
)
from amps_tpu.rx.decoder import decode_burst, decode_bursts  # noqa: F401
