"""Scaling artifact: (a) structural validation of the sharded BS step on
a virtual 8-device CPU mesh at every size, (b) an analytic ICI
communication model for real multi-chip scaling (real pods are not
reachable from this environment; the model uses the measured single-chip
step time and counts the step's actual collective bytes).

Writes tools/scaling_analysis.json, summarized in docs/SCALING.md.
"""
import os
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                           " --xla_force_host_platform_device_count=8")
import sys; sys.path.insert(0, "/root/repo")
import json
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

# ---- (a) structural run: every mesh size executes the full step -------
from amps_tpu.eval.scaling import weak_scaling

res = weak_scaling(sizes=[1, 2, 4, 8])
print("virtual CPU mesh (8 virtual devices on shared cores: total "
      "throughput should stay ~flat; per-device 'efficiency' is "
      "trivially ~1/N here and meaningless — this run validates the "
      "collective structure at every size, not speed):")
for size, r in sorted(res.items()):
    print(f"  time={size}: total {r['samples_per_sec']/1e6:7.2f} Msps  "
          f"per-dev {r['per_device']/1e6:7.2f}")

# ---- (b) analytic model ------------------------------------------------
M, T = 1024, 8
RX_MSPS = float(os.environ.get("RX_MSPS", "2304"))   # bench headline
Phop = M // 2
SPS = 3
f32, bf16 = 4, 2
ICI = 100e9        # conservative per-link ICI bandwidth (B/s)

# Fixed halo per time-shard boundary: analysis filter tail (L-Phop
# wideband samples, riq f32) + demod/correlation overlap (trigger +
# capture window per channel, bf16 on the io_bf16 plane).
halo_bytes = ((M * T - Phop) * 2 * f32
              + (74 + 3374) * SPS * M * bf16)

print(f"\n[weak scaling] each chip serving its own 1024-channel band "
      f"segment is comm-free on the data plane (control only): 100%.")
print(f"[weak scaling] time-sharding one continuous band: halo is a "
      f"FIXED {halo_bytes/1e6:.1f} MB per boundary per step; "
      f"efficiency = t_comp/(t_comp + halo/ICI) vs per-chip block size:")
weak_rows = []
for log2n in (22, 24, 26):
    n = 1 << log2n
    t_comp = n / (RX_MSPS * 1e6)
    eff = t_comp / (t_comp + halo_bytes / ICI)
    weak_rows.append({"block": n, "eff": eff})
    print(f"  block 2^{log2n} ({n/1e6:5.1f} Ms, {t_comp*1e3:6.2f} ms/chip)"
          f": {eff*100:5.1f}%")

print(f"\n[strong scaling] N chips cooperating on ONE block (latency "
      f"scaling) pay the hop<->channel resharding: all_gather of the TX "
      f"baseband + all_to_all of the RX channelized plane, each ~the "
      f"block size x (N-1)/N per chip; zero overlap assumed (XLA "
      f"overlaps collectives with compute inside the single jit):")
n = 1 << 22
n_hops = n // Phop
t_chip = n / (RX_MSPS * 1e6)
strong_rows = []
for N in (2, 4, 8):
    gather = M * n_hops * 2 * f32 * (N - 1) / N
    a2a = 2 * M * n_hops * bf16 * (N - 1) / N
    t_comm = (gather + a2a + halo_bytes) / ICI
    t_n = t_chip / N + t_comm
    eff = t_chip / (N * t_n)
    strong_rows.append({"n_chips": N, "speedup": t_chip / t_n, "eff": eff})
    print(f"  N={N}: speedup {t_chip/t_n:4.2f}x  efficiency {eff*100:5.1f}%"
          f"  (comm {t_comm*1e3:5.2f} ms vs comp {t_chip/N*1e3:5.2f} ms)")
print("=> scale out by sharding CHANNEL BANKS / TIME, not by splitting "
      "one block: the channelizer's all-to-all resharding is inherent "
      "to cooperative polyphase analysis (every output channel needs "
      "every input sample), so single-block strong scaling is ICI-bound.")

with open("/root/repo/tools/scaling_analysis.json", "w") as f:
    json.dump({"virtual": {str(k): v for k, v in res.items()},
               "halo_bytes": halo_bytes, "ici_Bps": ICI,
               "weak_time_sharded": weak_rows,
               "strong_single_block": strong_rows,
               "rx_msps": RX_MSPS}, f, indent=1)
print("wrote tools/scaling_analysis.json")
