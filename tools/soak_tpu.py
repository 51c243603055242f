"""Real-TPU correctness-at-scale soak: a 1024-channel reverse band
carrying ~100 mobile bursts streams through MultichannelReceiver ON THE
CHIP; every event must be detected on its channel and decode bit-exact,
while sustaining the bench-class streaming rate (host IO included)."""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from amps_tpu.eval.traffic import random_events, synthesize_reverse_band
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.runtime.streamer import MultichannelReceiver

OUT = open("/root/repo/tools/soak_tpu.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)

spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
P = spec.chz_spec.hop
total_hops = 32768                      # 4 blocks of 2^22 wideband samples
emit(event="start", device=str(jax.devices()[0]), M=1024,
     total_hops=total_hops)

t0 = time.time()
events = random_events(112, spec, total_hops, seed=11)
x = synthesize_reverse_band(events, spec, total_hops, noise_sigma=0.02)
emit(event="synthesized", n_events=len(events), wideband=len(x),
     host_synth_s=round(time.time() - t0, 1))

rx = MultichannelReceiver(spec, threshold=0.6, max_bursts=6, min_rssi=0.05)
blk = (1 << 22)
# warm up compile on the first block shape
reports = []
t0 = time.perf_counter()
off = 0
while off < len(x):
    end = min(off + blk, len(x))
    end -= (end - off) % P
    if end <= off:
        break
    reports += rx.push(x[off:end])
    off = end
dt = time.perf_counter() - t0
rate = off / dt / 1e6

by_key = {}
for r in reports:
    by_key.setdefault(r.channel, []).append(r)
found, exact = 0, 0
for ev in events:
    cands = by_key.get(ev.channel, [])
    if not cands:
        continue
    found += 1
    want = np.stack(ev.words())
    got = min(cands, key=lambda r: abs(r.abs_symbol - ev.start_hop // 3))
    nw = want.shape[0]
    if (np.asarray(got.word_ok)[:nw].all()
            and np.array_equal(np.asarray(got.words)[:nw], want)):
        exact += 1
emit(event="done", n_events=len(events), n_reports=len(reports),
     found=found, exact=exact, wall_s=round(dt, 2),
     streaming_msps=round(rate, 1),
     note="includes host->device transfer + python streaming loop + cold compile")
