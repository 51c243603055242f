"""Round-5 settlement of the analyze-stage Pallas lever (VERDICT r4
item 1): drift-controlled same-process interleaved A/B of the full RX
pipeline at the BENCH shape (M=1024, Nh=8192, bench dtypes) across

  xla   — the production path (fold="bank" split transform)
  v1    — fused analyze+demod kernel (pallas/rx_front_kernel.py)
  v2pad — fused analyze+demod+phases kernel (pallas/rx_phases_kernel),
          padded 8192 -> 8448 hops; compiles at the bench shape now
          that the odd-bank sign identity shed 4 MB of scoped VMEM

Protocol: >= 96 queued iterations per timing (per-dispatch overhead
amortization, CLAUDE.md), 5 interleaved A/B/A/B rounds, medians.
Decision rule (VERDICT): adopt a kernel if it wins >= 5% over xla;
otherwise this file + its .out is the final rejection artifact.

Run ALONE on the chip (nohup, no timeout kill); the v2 Mosaic compile
takes ~10 min via the remote helper.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")
import numpy as np
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402

from amps_tpu.parallel.pipeline import (MultichannelSpec,  # noqa: E402
                                        rx_multichannel_block)

OUT = open("/root/repo/tools/profile_pl7.out", "a", buffering=1)


def emit(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


N = 1 << 22
ITERS = 96
ROUNDS = 5
SPEC = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True, transform_bf16=True)
VARIANTS = [("xla", False), ("v1", "v1"), ("v2pad", "v2pad")]

rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (N, 2)).astype(np.float32))


def make_run(up):
    def run():
        return rx_multichannel_block(x, SPEC, max_bursts=2,
                                     use_pallas=up)["quality"]
    return run


emit(event="start", device=str(jax.devices()[0]), n=N, iters=ITERS,
     rounds=ROUNDS)
runs = {}
for name, up in VARIANTS:
    t0 = time.perf_counter()
    try:
        r = make_run(up)
        q = r()
        float(jnp.sum(q))            # compile + warm
    except Exception as e:           # compile failure must not kill A/B
        emit(event="compile", variant=name, error=repr(e)[:500])
        continue
    emit(event="compile", variant=name,
         warm_s=round(time.perf_counter() - t0, 1))
    runs[name] = r

meas = {name: [] for name in runs}
for rd in range(ROUNDS):
    for name, r in runs.items():
        q = r()
        float(jnp.sum(q))            # flush queue before timing
        t0 = time.perf_counter()
        for _ in range(ITERS):
            q = r()
        float(jnp.sum(q))
        dt = time.perf_counter() - t0
        msps = N * ITERS / dt / 1e6
        meas[name].append(round(msps, 1))
        emit(event="round", rd=rd, variant=name, msps=round(msps, 1))

med = {name: float(np.median(v)) for name, v in meas.items()}
base = med.get("xla")
emit(event="verdict", medians=med, samples=meas,
     vs_xla={n: round(m / base, 4) for n, m in med.items()} if base
     else None)
