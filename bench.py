"""Benchmark: wideband IQ Msamples/s/chip through the full RX pipeline
(polyphase channelize -> FM demod -> RECC trigger correlate -> burst
extract -> batched BCH decode), the BASELINE.json headline metric.

Headline configuration: a 1024-channel bank — the literal ">=1000
simultaneous AMPS channels" north star.  vs_baseline is the ratio to the
30.72 Msamples/s that 1024 x 30 kHz channels need for real time; >= 1.0
means the goal is met on one chip.

Prints ONE JSON line.  Runs on the real TPU (the axon platform is the
environment default).
"""

import json
import subprocess
import sys
import time

import numpy as np


def _wait_for_tpu(budget_s: float = 2700.0) -> bool:
    """Wait for the chip with ONE never-killed prober subprocess.

    Killing a process that is blocked on a wedged chip RE-wedges it
    (CLAUDE.md), so the prober is left to block until the chip recovers
    and then exits cleanly; we poll its liveness without signaling it.
    """
    code = ("import jax, jax.numpy as jnp;"
            "print(float(jnp.sum(jnp.arange(8.0))))")
    proc = subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE,
                            stderr=subprocess.DEVNULL)
    t0 = time.time()
    while time.time() - t0 < budget_s:
        rc = proc.poll()
        if rc is not None:
            out = proc.stdout.read() if proc.stdout else b""
            return b"28.0" in out
        time.sleep(15)
    print("tpu prober still blocked after budget; proceeding anyway "
          "(prober left running, not killed)", file=sys.stderr)
    return False


def _throughput(spec, n, iters=128, use_pallas=False):
    # iters=128: the tunneled chip has a per-dispatch overhead that only
    # amortizes with a deep async queue (tools/profile_rx12.out — a
    # trivial op costs 2.1 ms/call at 12 queued iters but 0.28 ms at
    # 192; RX@1024ch reads 653 Msps at 12 iters vs 918 at 192).  The
    # steady-state number is the honest one: a real deployment streams
    # continuously with the double-buffered receiver, never one block
    # per round trip.
    import jax
    import jax.numpy as jnp
    from amps_tpu.parallel.pipeline import rx_multichannel_block

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))

    def run(xb):
        return rx_multichannel_block(xb, spec, max_bursts=2,
                                     use_pallas=use_pallas)["quality"]

    q = run(x)
    float(jnp.sum(q))  # sync: axon's block_until_ready alone is not enough
    t0 = time.perf_counter()
    for _ in range(iters):
        q = run(x)
    float(jnp.sum(q))
    dt = time.perf_counter() - t0
    return n * iters / dt / 1e6


def _tx_throughput(spec, frames=3, iters=128):
    """Full TX path (superframe bits -> FSK baseband -> synthesis
    channelizer -> wideband), Msamples/s of produced wideband IQ."""
    import functools
    import jax
    import jax.numpy as jnp
    from amps_tpu.parallel.pipeline import tx_multichannel_block

    rng = np.random.default_rng(0)
    M = spec.num_channels
    wp = jnp.asarray(rng.integers(0, 2, (M, frames, 2, 28)).astype(np.uint8))
    nwide = frames * 463 * 2 * spec.chan_sps * (M // 2)
    run = jax.jit(functools.partial(tx_multichannel_block, spec=spec))
    x = run(wp)
    float(jnp.sum(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        x = run(wp)
    float(jnp.sum(x))
    dt = time.perf_counter() - t0
    return nwide * iters / dt / 1e6


def _throughput_batched(spec, g, n, iters=128):
    """G independent small banks in one program (the M=128 utilization
    fix, VERDICT r1 item 9): Msps of TOTAL wideband consumed."""
    import jax.numpy as jnp
    from amps_tpu.parallel.pipeline import rx_multichannel_block_batched

    rng = np.random.default_rng(0)
    xs = jnp.asarray(rng.normal(0, 0.1, (g, n, 2)).astype(np.float32))

    def run(xb):
        return rx_multichannel_block_batched(xb, spec,
                                             max_bursts=2)["quality"]

    q = run(xs)
    float(jnp.sum(q))
    t0 = time.perf_counter()
    for _ in range(iters):
        q = run(xs)
    float(jnp.sum(q))
    dt = time.perf_counter() - t0
    return g * n * iters / dt / 1e6


def _closed_loop_guard(nblocks=32, frames=2, rounds=5):
    """Closed-loop regression guard (VERDICT r4 item 3): same-process
    INTERLEAVED A/B of the bench closed-loop config against the PINNED
    known-good recipe (docs/PERF.md 'Closed-loop regression guard').
    Chip throughput drifts 2-26% between sessions at identical code
    (CLAUDE.md), so cross-round comparisons of the raw closed-loop
    number are unanswerable — but drift cancels in a same-process
    interleaved ratio, so `closed_loop_vs_pinned_ratio` moving outside
    its documented band flags a REAL relative regression of the
    current build.  Returns (current_msps, pinned_msps) medians."""
    import jax.numpy as jnp
    from amps_tpu.parallel.pipeline import MultichannelSpec
    from amps_tpu.runtime.streamer import make_closed_loop_stream

    # pinned recipe: the r3/r4 closed-loop configuration (f32 analysis
    # transform).  Do not change it without re-baselining the band in
    # docs/PERF.md — its stability across rounds is the whole point.
    cur_spec = MultichannelSpec(num_channels=1024, taps_per_phase=8,
                                fold="bank", io_bf16=True, corr_bf16=True,
                                transform_bf16=True)
    pin_spec = MultichannelSpec(num_channels=1024, taps_per_phase=8,
                                fold="bank", io_bf16=True, corr_bf16=True,
                                transform_bf16=False)
    rng = np.random.default_rng(0)
    wp = jnp.asarray(rng.integers(0, 2,
                                  (cur_spec.num_channels, frames, 2, 28))
                     .astype(np.uint8))
    runs = {}
    for name, spec in (("current", cur_spec), ("pinned", pin_spec)):
        run, block_samples = make_closed_loop_stream(spec, nblocks, frames)
        _, q, _ = run(wp)
        float(q)                      # compile + warm
        runs[name] = (run, block_samples)
    meas = {"current": [], "pinned": []}
    for _ in range(rounds):
        for name in ("current", "pinned"):     # A/B/A/B interleave
            run, bs = runs[name]
            t0 = time.perf_counter()
            _, q, _ = run(wp)
            float(q)
            meas[name].append(nblocks * bs
                              / (time.perf_counter() - t0) / 1e6)
    return (float(np.median(meas["current"])),
            float(np.median(meas["pinned"])))


def _paced_realtime(seconds=20):
    """Short wall-clock pacing leg (VERDICT r4 item 2): the 1024-ch
    receiver under true 30.72 Msps arrival pacing via the executor;
    the full >= 60 s artifact is tools/realtime_pace_tpu.out."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "realtime_pace_tpu", "/root/repo/tools/realtime_pace_tpu.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    res = mod.leg_rx(seconds=seconds)
    return {k: res[k] for k in
            ("blocks", "block_dt_ms", "latency_ms", "deadline_misses",
             "underruns_1_block_buffer", "rt_headroom_p99",
             "exactly_once_per_period")}


def main():
    # the axon chip wedges for minutes-to-hours after any client crash;
    # patiently wait (never kill a blocked prober — that re-wedges it)
    _wait_for_tpu()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    from amps_tpu.parallel.pipeline import MultichannelSpec

    n = 1 << 22
    # fold="bank": permutation-absorbed two-bank analyzer; io_bf16: bf16
    # data plane with f32-accumulated matmuls; corr_bf16: bf16 trigger-
    # correlation/quality plane — the validated production path (decode
    # bit-parity: tests/test_bf16.py; the optimization record on this
    # chip is in tools/profile_rx*.out / profile_dec*.out)
    # transform_bf16 at M=1024: +4% (tools/profile_rx27.out) and decode
    # bit-exactness re-proven on chip by the 112-event soak under the
    # flag (tools/soak_tbf16.out); at M=256 it measured -1%, so only the
    # 1024 config adopts it
    m1024 = _throughput(MultichannelSpec(num_channels=1024,
                                         taps_per_phase=8,
                                         fold="bank", io_bf16=True,
                                         corr_bf16=True,
                                         transform_bf16=True), n)
    m256 = _throughput(MultichannelSpec(num_channels=256,
                                        taps_per_phase=8,
                                        fold="bank", io_bf16=True,
                                        corr_bf16=True), n)
    m128 = _throughput(MultichannelSpec(num_channels=128,
                                        taps_per_phase=8,
                                        fold="bank", io_bf16=True,
                                        corr_bf16=True), n)
    # 8 independent 128-channel bands batched into one program: the
    # realistic narrow-band deployment shape, and the fix for the
    # single small bank leaving the chip half-idle
    m128b = _throughput_batched(MultichannelSpec(num_channels=128,
                                                 taps_per_phase=8,
                                                 fold="bank", io_bf16=True,
                                                 corr_bf16=True),
                                g=8, n=n // 8)

    tx1024 = _tx_throughput(MultichannelSpec(num_channels=1024,
                                             taps_per_phase=8))

    # sustained closed loop: 32 consecutive full-duplex blocks, one
    # dispatch, device-resident state (VERDICT r1 item 5) — measured
    # INTERLEAVED against the pinned recipe so the ratio is drift-free
    # (VERDICT r4 item 3; docs/PERF.md 'Closed-loop regression guard')
    loop1024, loop_pinned = _closed_loop_guard(nblocks=32, frames=2)

    try:
        paced = _paced_realtime(seconds=20)
    except Exception as e:  # pacing must never sink the bench line
        paced = {"error": repr(e)[:200]}

    realtime_rate = 1024 * 0.03  # Msps for a 1024-ch wideband
    result = {
        "metric": "IQ Msamples/s/chip (1024-ch channelize+RECC demod+decode)",
        "value": round(m1024, 2),
        "unit": "Msamples/s",
        "vs_baseline": round(m1024 / realtime_rate, 3),
        "detail": {
            "block_samples": n,
            "realtime_factor_1024ch": round(m1024 / realtime_rate, 2),
            "throughput_256ch_bank_msps": round(m256, 2),
            "throughput_128ch_bank_msps": round(m128, 2),
            "throughput_128ch_x8_batched_msps": round(m128b, 2),
            "equivalent_realtime_30kHz_channels_1024": int(m1024 / 0.03),
            "equivalent_realtime_30kHz_channels_best": int(
                max(m1024, m256, m128) / 0.03),
            "throughput_tx_1024ch_msps": round(tx1024, 2),
            "sustained_closed_loop_1024ch_msps": round(loop1024, 2),
            "closed_loop_realtime_factor": round(
                loop1024 / realtime_rate, 2),
            "closed_loop_pinned_msps": round(loop_pinned, 2),
            "closed_loop_vs_pinned_ratio": round(loop1024 / loop_pinned, 3),
            "realtime_pacing_20s": paced,
            "device": str(jax.devices()[0]),
        },
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
