"""Generate docs/BER.md: RECC link curve (detection + word success vs
per-sample SNR), first_ok vs majority policy."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from amps_tpu.eval.ber import recc_link_curve

snrs = [10.0, 6.0, 2.0, 0.0, -2.0, -4.0, -6.0, -8.0, -10.0, -12.0]
curve = recc_link_curve(snrs, trials=256, seed=1)
curve_maj = recc_link_curve(snrs, trials=256, seed=1, policy="majority")

lines = [
    "# RECC link quality (loopback, synthesized channel)",
    "",
    "Detection and word-success rates vs per-sample complex SNR for the",
    "block-parallel receiver (correlation-peak timing, threshold 0.5,",
    "5-repeat BCH decode; 256 noise trials/point, seed 1;",
    "amps_tpu/eval/ber.py).  SNR(dB) = -10 log10(sigma_c^2) for a",
    "unit-modulus FSK burst at 3 samples/symbol — the Manchester symbol",
    "integrate-and-dump adds ~4.8 dB processing gain and the 48,36 BCH",
    "plus 5 repeats add coding margin below that.",
    "",
    "The reference publishes no BER numbers (its acceptance bar is",
    "'decodes with real phones'); this curve pins OUR receiver so",
    "sensitivity regressions fail loudly (tests/test_ber.py guards the",
    "shape).",
    "",
    "| SNR/sample (dB) | detect rate | word success (first_ok) "
    "| word success (majority) |",
    "|---|---|---|---|",
]
for s in snrs:
    r = curve[s]
    m = curve_maj[s]
    lines.append(f"| {s:+.0f} | {r['detect_rate']:.3f} "
                 f"| {r['word_success_rate']:.3f} "
                 f"| {m['word_success_rate']:.3f} |")
lines += [
    "",
    "Majority (bit-wise vote across the 5 repeats before BCH, the",
    "spec-recommended combining and the streaming receiver's default)",
    "converts essentially every detection into a decoded word; first_ok",
    "is the reference-exact sequential fallback",
    "(lib/recc_decode_impl.cc:100-107).  Detection (the normalized",
    "correlation threshold) is the sensitivity limiter either way — as",
    "in the reference, whose byte-exact memmem trigger fails at even",
    "higher SNR than a 0.5-threshold correlator.",
    "",
]
# preserve hand-maintained sections (CFO, fading) below the AWGN table
marker = "## Carrier frequency offset tolerance"
old = open("/root/repo/docs/BER.md").read()
tail = old[old.index(marker):] if marker in old else ""
open("/root/repo/docs/BER.md", "w").write("\n".join(lines) + tail)
print("written docs/BER.md (tail sections preserved)")
for s in snrs:
    print(s, curve[s])
