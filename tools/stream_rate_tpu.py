"""Sustained streaming-receiver rate on chip: device-resident wideband,
pipeline_depth=4 (report syncs overlap device compute), 32 blocks."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax, jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.runtime.streamer import MultichannelReceiver

OUT = open("/root/repo/tools/stream_rate_tpu.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)

spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
blk = 1 << 22
x = jax.random.normal(jax.random.PRNGKey(0), (blk, 2), jnp.float32) * 0.1
float(jnp.sum(x[:8]))
for depth in (1, 4):
    rx = MultichannelReceiver(spec, threshold=0.6, min_rssi=0.05,
                              pipeline_depth=depth)
    rx.push(x)   # warm compile
    rx.flush()
    rx = MultichannelReceiver(spec, threshold=0.6, min_rssi=0.05,
                              pipeline_depth=depth)
    n_blocks = 32
    t0 = time.perf_counter()
    for _ in range(n_blocks):
        rx.push(x)
    rx.flush()
    dt = time.perf_counter() - t0
    emit(depth=depth, blocks=n_blocks,
         msps=round(n_blocks * blk / dt / 1e6, 1),
         ms_per_block=round(dt / n_blocks * 1e3, 2))
