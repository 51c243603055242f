"""Profiling: samples/s rate meters + jax.profiler trace helper.

The reference has no tracing at all (SURVEY.md §5); here every streaming
stage can wrap itself in a RateMeter and hot sections in ``trace`` for
TensorBoard-compatible device profiles.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, Optional


class RateMeter:
    """Exponential-moving-average samples/s counter."""

    def __init__(self, name: str, alpha: float = 0.2):
        self.name = name
        self.alpha = alpha
        self.rate = 0.0
        self.total = 0
        self._t_last: Optional[float] = None

    def update(self, n_samples: int) -> None:
        now = time.perf_counter()
        self.total += n_samples
        if self._t_last is not None:
            dt = now - self._t_last
            if dt > 0:
                inst = n_samples / dt
                self.rate = (self.alpha * inst
                             + (1 - self.alpha) * (self.rate or inst))
        self._t_last = now

    def __repr__(self) -> str:
        return f"RateMeter({self.name}: {self.rate/1e6:.2f} Msamples/s)"


_METERS: Dict[str, RateMeter] = {}


def meter(name: str) -> RateMeter:
    if name not in _METERS:
        _METERS[name] = RateMeter(name)
    return _METERS[name]


@contextlib.contextmanager
def trace(label: str, device: bool = True):
    """Annotate a section for jax.profiler traces (no-op if unavailable)."""
    try:
        import jax.profiler
        ctx = jax.profiler.TraceAnnotation(label)
    except Exception:
        ctx = contextlib.nullcontext()
    with ctx:
        yield


def start_server(port: int = 9999):
    """Start the jax.profiler server (for tensorboard capture)."""
    import jax.profiler
    return jax.profiler.start_server(port)
