"""Pure-NumPy oracle for golden vectors.

A tiny, deliberately straightforward re-statement of the reference's L0/L1
semantics (word builders, shortened BCH(63,51,t=2), Manchester, frame
layout).  Used ONLY by tests to generate golden vectors against which the
vectorized JAX implementations in ``amps_tpu.codec``/``amps_tpu.tx`` are
checked.  Kept independent of JAX on purpose: a bug must not be shared.
"""

from amps_tpu.ref import bch_ref, words_ref, frames_ref  # noqa: F401
