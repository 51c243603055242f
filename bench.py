"""Benchmark: wideband IQ Msamples/s/chip through the full RX pipeline
(polyphase channelize -> FM demod -> RECC trigger correlate -> burst
extract -> batched BCH decode), the BASELINE.json headline metric.

vs_baseline: ratio to the 30 Msamples/s a chip must sustain to demodulate
1000 simultaneous 30 kHz AMPS channels in real time (the north-star
target); >= 1.0 means the >=1000-channel real-time goal is met on one
chip.

Prints ONE JSON line.  Runs on the real TPU (the axon platform is the
environment default).
"""

import json
import sys
import time

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    from amps_tpu.parallel.pipeline import (MultichannelSpec,
                                            rx_multichannel_block)

    M = 128                      # channels in the bank
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8)
    n = 1 << 22                  # wideband samples per block (~4M)
    assert n % spec.chz_spec.hop == 0
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))

    def run(xb):
        out = rx_multichannel_block(xb, spec, max_bursts=2)
        return out["quality"], out["word_ok"]

    # warmup / compile; force a host read (the axon runtime's
    # block_until_ready alone does not always synchronize)
    q, ok = run(x)
    float(jnp.sum(q))

    iters = 20
    t0 = time.perf_counter()
    for _ in range(iters):
        q, ok = run(x)
    float(jnp.sum(q))  # sync: drains the device stream
    dt = time.perf_counter() - t0

    msps = n * iters / dt / 1e6
    realtime_channels = msps * 1e6 / 30_000.0
    result = {
        "metric": "IQ Msamples/s/chip (channelize+RECC demod+decode)",
        "value": round(msps, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(msps / 30.0, 3),
        "detail": {
            "num_channels_in_bank": M,
            "block_samples": n,
            "iters": iters,
            "seconds": round(dt, 3),
            "equivalent_realtime_30kHz_channels": int(realtime_channels),
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
