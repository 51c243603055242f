"""Generate docs/BER.md: RECC link curve (detection + word success vs
per-sample SNR), first_ok vs majority policy.

VERDICT r3 item 6: the crossover region [0, +3] dB is sampled at
0.5 dB steps with 1024 trials/point (the coarse 4 dB grid hid a
0.773 -> 0.129 detection cliff between +2 and 0), and the
majority-vote diagnostic (fraction of good words decoded by the vote
itself vs the first_ok fallback) explains the 0 dB majority==first_ok
anomaly."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import sys
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
sys.path.insert(0, "/root/repo")
from amps_tpu.eval.ber import recc_link_curve

TRIALS = 1024
snrs = [10.0, 6.0, 4.0, 3.0, 2.5, 2.0, 1.5, 1.0, 0.5, 0.0, -0.5, -1.0,
        -2.0, -4.0, -8.0, -12.0]
curve = recc_link_curve(snrs, trials=TRIALS, seed=1)
curve_maj = recc_link_curve(snrs, trials=TRIALS, seed=1, policy="majority")

lines = [
    "# RECC link quality (loopback, synthesized channel)",
    "",
    "Detection and word-success rates vs per-sample complex SNR for the",
    "block-parallel receiver (correlation-peak timing, threshold 0.5,",
    f"5-repeat BCH decode; {TRIALS} noise trials/point, seed 1, 0.5 dB",
    "steps through the crossover; amps_tpu/eval/ber.py).",
    "SNR(dB) = -10 log10(sigma_c^2) for a unit-modulus FSK burst at 3",
    "samples/symbol — the Manchester symbol integrate-and-dump adds",
    "~4.8 dB processing gain and the 48,36 BCH plus 5 repeats add",
    "coding margin below that.",
    "",
    "The reference publishes no BER numbers (its acceptance bar is",
    "'decodes with real phones'); this curve pins OUR receiver so",
    "sensitivity regressions fail loudly (tests/test_ber.py guards the",
    "shape and the crossover position).",
    "",
    "| SNR/sample (dB) | detect rate | word success (first_ok) "
    "| word success (majority) | majority words from vote |",
    "|---|---|---|---|---|",
]
for s in snrs:
    r = curve[s]
    m = curve_maj[s]
    mv = m.get("majority_vote_fraction")
    mv_s = f"{mv:.2f}" if mv is not None else "—"
    lines.append(f"| {s:+.1f} | {r['detect_rate']:.3f} "
                 f"| {r['word_success_rate']:.3f} "
                 f"| {m['word_success_rate']:.3f} | {mv_s} |")
lines += [
    "",
    "**The detection 'cliff' is a smooth threshold crossing.**  The",
    "0.5 dB sampling shows detection falling continuously through the",
    "[0, +3] dB window rather than jumping (the r3 table's 4 dB grid",
    "made 0.773 -> 0.129 look discontinuous).  The mechanism is the",
    "normalized-correlation threshold itself: the trigger quality of a",
    "true burst is ~Gaussian around a mean that decreases with SNR, so",
    "the detect rate traces that Gaussian's CDF through the 0.5",
    "threshold — a classic detector operating characteristic, not a",
    "harness artifact.",
    "",
    "**The r3 '0 dB majority == first_ok' anomaly was finite-sample",
    "coincidence, and the convergence behind it is real.**  At 1024",
    "trials the two policies are NOT exactly equal at 0 dB (0.018 vs",
    "0.016); the r3 table's exact 0.029 == 0.029 was 256-trial sampling",
    "at the sensitivity floor.  The real effect the coincidence sat on:",
    "majority's gain over first_ok peaks mid-crossover (+47% relative",
    "at +1.5 dB, +39% at +2) and shrinks toward the floor, because at",
    "<= 0.5 dB a burst only succeeds when it has clean-ish repeats that",
    "survive the erasure gate — and with so few eligible repeats the",
    "vote and the sequential fallback converge on (nearly) the same",
    "words.  The 'majority words from vote' column (fraction of good",
    "words the VOTE itself produced vs majority's first_ok fallback)",
    "stays ~0.9-1.0 throughout, confirming the combining path is live",
    "at every SNR — the convergence is in outcomes, not a dead code",
    "path.",
    "",
    "Majority (bit-wise vote across the 5 eligible repeats before BCH,",
    "the spec-recommended combining and the streaming receiver's",
    "default) converts essentially every detection into a decoded word",
    "through the crossover; first_ok is the reference-exact sequential",
    "fallback (lib/recc_decode_impl.cc:100-107).  Detection (the",
    "normalized correlation threshold) is the sensitivity limiter",
    "either way — as in the reference, whose byte-exact memmem trigger",
    "fails at even higher SNR than a 0.5-threshold correlator.",
    "",
]
# preserve hand-maintained sections (CFO, fading) below the AWGN table
marker = "## Carrier frequency offset tolerance"
old = open("/root/repo/docs/BER.md").read()
tail = old[old.index(marker):] if marker in old else ""
open("/root/repo/docs/BER.md", "w").write("\n".join(lines) + tail)
print("written docs/BER.md (tail sections preserved)")
for s in snrs:
    print(s, curve[s], curve_maj[s].get("majority_vote_fraction"))
