"""SDR I/O adapters: the uhd_usrp_source/sink seam of the reference.

The reference talks to radios through GR's UHD blocks
(grc/ampsbs.grc uhd_usrp_sink @880.59 MHz / uhd_usrp_source, SURVEY.md
§2 rows 'FM modulator chain' / 'RECC receiver front end').  This
framework keeps radio I/O behind two tiny interfaces so the same
executor runs against files, the native SPSC ring (fed by an external
radio process), a simulator, or — where a SoapySDR/UHD Python module
exists — real hardware:

  IQSource.read(n)  -> (n, 2) float32 riq block (or None at end)
  IQSink.write(blk) -> consume an (n, 2) float32 riq block

Raw format on files/rings is interleaved float32 I,Q — the same raw
format the reference's file-source test graphs use (grc/recctest.grc).

No SoapySDR/UHD library is baked into this image; ``soapy_source``
raises ImportError with instructions unless the module is present
(stub-or-gate policy).
"""

from __future__ import annotations

import time
from typing import Optional

import numpy as np


class IQSource:
    def read(self, n: int) -> Optional[np.ndarray]:
        raise NotImplementedError

    def close(self) -> None:
        pass


class IQSink:
    def write(self, block: np.ndarray) -> None:
        raise NotImplementedError

    def close(self) -> None:
        pass


class FileIQSource(IQSource):
    """Raw interleaved float32 I/Q file (the recctest.grc replay seam)."""

    def __init__(self, path: str, repeat: bool = False):
        self._f = open(path, "rb")
        self.repeat = repeat

    def read(self, n: int) -> Optional[np.ndarray]:
        raw = np.fromfile(self._f, dtype=np.float32, count=2 * n)
        if len(raw) < 2 and self.repeat:
            self._f.seek(0)
            raw = np.fromfile(self._f, dtype=np.float32, count=2 * n)
        if len(raw) < 2:
            return None
        return raw[: (len(raw) // 2) * 2].reshape(-1, 2)

    def close(self) -> None:
        self._f.close()


class FileIQSink(IQSink):
    def __init__(self, path: str):
        self._f = open(path, "wb")

    def write(self, block: np.ndarray) -> None:
        np.asarray(block, np.float32).tofile(self._f)

    def close(self) -> None:
        self._f.close()


class RingIQSource(IQSource):
    """Reads riq blocks from a native SPSC ring (runtime.native_rt.Ring)
    written by an external radio process; blocks until enough samples
    arrive or ``timeout_s`` passes (then returns what it has, or None).
    """

    def __init__(self, ring, timeout_s: float = 1.0):
        self.ring = ring
        self.timeout_s = timeout_s
        self._eof = False

    def read(self, n: int) -> Optional[np.ndarray]:
        if self._eof:
            return None
        want = n * 8  # float32 I+Q
        deadline = time.monotonic() + self.timeout_s
        while self.ring.readable < want and time.monotonic() < deadline:
            time.sleep(0.001)
        avail = min(self.ring.readable, want) // 8 * 8
        if avail == 0:
            return None
        raw = np.frombuffer(self.ring.read(avail), np.float32)
        return raw.reshape(-1, 2).copy()

    def mark_eof(self) -> None:
        self._eof = True


class RingIQSink(IQSink):
    """Writes riq blocks into a native SPSC ring read by an external
    radio process; blocks on backpressure."""

    def __init__(self, ring, timeout_s: float = 5.0):
        self.ring = ring
        self.timeout_s = timeout_s

    def write(self, block: np.ndarray) -> None:
        data = np.asarray(block, np.float32).tobytes()
        deadline = time.monotonic() + self.timeout_s
        off = 0
        while off < len(data):
            wrote = self.ring.write(data[off:])
            off += wrote
            if wrote == 0:
                if time.monotonic() > deadline:
                    raise TimeoutError("ring sink backpressure timeout")
                time.sleep(0.001)


def soapy_source(args: str = "", rate: float = 400e3,
                 freq: float = 835.59e6, gain: float = 30.0):
    """Real-hardware source via SoapySDR, if the module is installed.

    (Not baked into this image; external deployments install SoapySDR
    and get the reference's USRP/HackRF coverage — README.md:87.)"""
    try:
        import SoapySDR  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise ImportError(
            "SoapySDR python module not available in this environment; "
            "use FileIQSource/RingIQSource, or install SoapySDR") from e
    raise NotImplementedError(
        "wire SoapySDR streaming here for hardware deployments")


def source_reader(src: IQSource, block_samples: int):
    """Adapt an IQSource to the executor's rx_source callable."""
    def reader():
        return src.read(block_samples)
    return reader


def sink_writer(sink: IQSink):
    """Adapt an IQSink to the executor's tx_sink callable."""
    def writer(block):
        sink.write(block)
    return writer
