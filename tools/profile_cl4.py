"""Chunked closed-loop measurement (VERDICT r3 item 7): split the
nblocks scan into C back-to-back donated-state jitted invocations
(streamer.make_closed_loop_stream(chunks=C)) so the host enqueues all
chunks before the first finishes — probing whether the queue-depth
dispatch amortization the standalone block numbers enjoy can be
recovered for the sustained closed loop.

Also reconciles the r3 discrepancy (803.6 Msps interleaved in
profile_cl2 vs 994.6 in the bench): every variant is measured BOTH
bench-style (one timed invocation after one warm run — bench.py's
protocol) and multi-round interleaved in THIS one process.
"""
import json, statistics, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.runtime.streamer import make_closed_loop_stream

OUT = open("/root/repo/tools/profile_cl4.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)

NBLOCKS, FRAMES = 32, 2
spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True, transform_bf16=True)
emit(event="start", device=str(jax.devices()[0]), nblocks=NBLOCKS,
     frames=FRAMES, variants=[1, 2, 4, 8])

rng = np.random.default_rng(0)
wp = jnp.asarray(rng.integers(0, 2, (1024, FRAMES, 2, 28)).astype(np.uint8))

runs = {}
for chunks in (1, 2, 4, 8):
    t0 = time.perf_counter()
    run, block_samples = make_closed_loop_stream(spec, NBLOCKS, FRAMES,
                                                 chunks=chunks)
    v, q, wok = run(wp)          # compile + warm
    float(q)
    emit(event="compiled", chunks=chunks,
         s=round(time.perf_counter() - t0, 1))
    runs[chunks] = (run, block_samples)

def msps(run, block_samples):
    t0 = time.perf_counter()
    v, q, wok = run(wp)
    float(q)
    return NBLOCKS * block_samples / (time.perf_counter() - t0) / 1e6

# bench-style: single timed invocation right after the warm run
for chunks, (run, bs) in runs.items():
    emit(event="bench_style", chunks=chunks, msps=round(msps(run, bs), 1))

# interleaved rounds (the only comparison that survives session drift)
rounds = {c: [] for c in runs}
for r in range(5):
    for chunks, (run, bs) in runs.items():
        rounds[chunks].append(round(msps(run, bs), 1))
for chunks, vals in rounds.items():
    emit(event="interleaved", chunks=chunks, rounds=vals,
         median=round(statistics.median(vals), 1))
emit(event="done")
