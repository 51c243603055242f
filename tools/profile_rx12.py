"""RX throughput vs iteration count: quantify the tunnel dispatch
overhead that profile_tx4 exposed (trivial op 2.1 ms @12 iters -> 0.62
@48).  Is the bench's iters=12 number ~2x under the steady state?"""
import json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block

OUT = open("/root/repo/tools/profile_rx12.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)

emit(event="start", device=str(jax.devices()[0]))
n = 1 << 22
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))
tiny = jnp.zeros((8, 128), jnp.float32)
triv = jax.jit(lambda t: t + 1.0)

for M in (1024, 256):
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank")
    def run(xb):
        return rx_multichannel_block(xb, spec, max_bursts=2)["quality"]
    q = run(x); float(jnp.sum(q))
    for iters in (12, 48, 96, 192):
        t0 = time.perf_counter()
        for _ in range(iters):
            q = run(x)
        float(jnp.sum(q))
        dt = (time.perf_counter() - t0) / iters
        emit(event="rx", M=M, iters=iters, ms=dt*1e3, msps=n/dt/1e6)

r = triv(tiny); float(jnp.sum(r))
for iters in (48, 192):
    t0 = time.perf_counter()
    for _ in range(iters):
        r = triv(tiny)
    float(jnp.sum(r))
    emit(event="trivial", iters=iters,
         ms=(time.perf_counter()-t0)/iters*1e3)
emit(event="done")
