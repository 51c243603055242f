from amps_tpu.utils.logging import get_logger, log_debug, log_warning  # noqa: F401
from amps_tpu.utils.profiling import RateMeter, trace  # noqa: F401
