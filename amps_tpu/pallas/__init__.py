"""Pallas TPU kernels for the hot ops.

Each kernel has a pure-XLA reference implementation elsewhere in the
package; kernels are opt-in (used by the bench/runtime when
``amps_tpu.pallas.enabled()``) and bit-compared against the XLA path in
tests (interpreter mode on CPU, compiled on TPU).
"""

import jax


def enabled() -> bool:
    """Pallas kernels target real TPUs only."""
    try:
        return jax.devices()[0].platform.startswith(("tpu", "axon"))
    except Exception:
        return False
