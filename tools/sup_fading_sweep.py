"""Supervision robustness under Rayleigh fading (round 4): the voice
soaks use clean tones + AWGN; a real reverse voice channel FADES.  This
sweep measures, per (doppler, SNR): the per-frame SAT-ok rate, the
LONGEST continuous SAT-loss run (what the 5 s fade timeout must ride
out), and the false-ST frame rate (spurious signaling is call-control
poison — a phantom 1.8 s run would release a live call).

Writes tools/sup_fading_sweep.out and regenerates the docs/BER.md
supervision section.  CPU (the measurement math is the production
supervision_levels path; chip parity is covered by the voice soaks).
"""
import json
import os
import sys

sys.path.insert(0, "/root/repo")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp  # noqa: E402

from amps_tpu.config import PipelineConfig  # noqa: E402
from amps_tpu.control.supervision import SupervisionConfig  # noqa: E402
from amps_tpu.dsp.fm import fm_modulate, quadrature_demod  # noqa: E402
from amps_tpu.eval import channel  # noqa: E402
from amps_tpu.rx.voice import supervision_levels  # noqa: E402

OUT = open("/root/repo/tools/sup_fading_sweep.out", "a", buffering=1)


def emit(**kw):
    OUT.write(json.dumps(kw) + "\n")
    print(kw, flush=True)


pipe = PipelineConfig()
fs = float(pipe.chan_rate)
sens = 2.0 * np.pi * pipe.deviation_hz / fs
cfg = SupervisionConfig()
DUR = 20.0
n = int(DUR * fs)
t = np.arange(n) / fs
FRAME = int(fs * cfg.frame_s)

# conversation-state RVC: SAT (SCC=1) + voice, NO ST transmitted
m = (0.05 * np.cos(2 * np.pi * 6000.0 * t)
     + 0.3 * np.cos(2 * np.pi * 1000.0 * t)).astype(np.float32)
iq_clean = np.asarray(fm_modulate(jnp.asarray(m), sens)[0])

emit(event="start", dur_s=DUR, frame_ms=cfg.frame_s * 1e3,
     gates=dict(sat_on_ratio=cfg.sat_on_ratio, margin_db=cfg.sat_margin_db,
                st_on_ratio=cfg.st_on_ratio, st_guard_ratio=cfg.st_guard_ratio,
                min_power=cfg.min_power, max_power=cfg.max_power,
                carrier_guard_max=cfg.carrier_guard_max))

rng = np.random.default_rng(5)
results = []
for fd in (5.0, 77.0):
    gain = channel.rayleigh_gain(n, fs, fd, rng)
    faded = np.asarray(channel.apply_gain(iq_clean, gain), np.float32)
    for snr_db in (20.0, 10.0, 6.0):
        sigma = np.sqrt(10.0 ** (-snr_db / 10.0) / 2.0)
        iq = faded + rng.normal(0, sigma, faded.shape).astype(np.float32)
        demod = np.asarray(quadrature_demod(jnp.asarray(iq))[0]) / sens
        lv, pw = supervision_levels(jnp.asarray(demod), FRAME, fs)
        lv, pw = np.asarray(lv), np.asarray(pw)
        margin = 10.0 ** (cfg.sat_margin_db / 20.0)
        carrier = ((pw > cfg.min_power) & (pw < cfg.max_power)
                   & (lv[:, 4] < cfg.carrier_guard_max))
        others = np.maximum(lv[:, 0], lv[:, 2])
        sat_ok = (carrier & (lv[:, 1] > cfg.sat_on_ratio * cfg.sat_nominal)
                  & (lv[:, 1] > others * margin))
        st_on = (carrier & (lv[:, 3] > cfg.st_on_ratio * cfg.st_nominal)
                 & (lv[:, 3] > cfg.st_guard_ratio * lv[:, 4]))
        # longest continuous runs, in seconds: SAT loss (what the 5 s
        # fade timeout must ride out) and false ST (a run reaching the
        # 0.25 s flash minimum would fake user signaling)
        def longest(mask):
            worst = run = 0
            for v in mask:
                run = run + 1 if v else 0
                worst = max(worst, run)
            return worst
        rec = dict(fd_hz=fd, snr_db=snr_db,
                   sat_ok_rate=round(float(sat_ok.mean()), 3),
                   longest_sat_loss_s=round(longest(~sat_ok) * cfg.frame_s, 2),
                   false_st_rate=round(float(st_on.mean()), 4),
                   longest_st_run_s=round(longest(st_on) * cfg.frame_s, 2),
                   frames=int(len(sat_ok)))
        results.append(rec)
        emit(event="point", **rec)

# ---- regenerate the BER.md supervision section ------------------------
lines = [
    "",
    "## Supervision under Rayleigh fading",
    "",
    "Conversation-state RVC (SAT SCC=1 + voice, no ST) through Clarke",
    "fading + AWGN, measured with the production gates (guard-bin",
    "carrier gate, SAT margin, ST dominance; tools/sup_fading_sweep.py,",
    f"{DUR:.0f} s per point).  The question the 553 §2.4.2 fade timeout",
    "must answer: how long do fades LOOK like SAT loss, and does fading",
    "ever fake signaling-tone frames?",
    "",
    "| fd (Hz) | SNR (dB) | SAT-ok frames | longest SAT loss | false-ST frames | longest ST run |",
    "|---|---|---|---|---|---|",
]
for r in results:
    lines.append(f"| {r['fd_hz']:.0f} | {r['snr_db']:.0f} "
                 f"| {r['sat_ok_rate']:.3f} "
                 f"| {r['longest_sat_loss_s']:.2f} s "
                 f"| {r['false_st_rate']:.4f} "
                 f"| {r['longest_st_run_s']:.2f} s |")
lines += [
    "",
    "Even at 6 dB under fast fading the longest continuous SAT loss",
    "stays far below the 5 s release timeout (deep fades are short at",
    "77 Hz, and at walking pace the envelope rarely stays in a null",
    "for seconds), so fading alone cannot drop a live call.  Fade",
    "EDGES do produce isolated false-ST frames (the discriminator",
    "noise burst while power/guard still read carrier-ish), but they",
    "never STRING: the longest false-ST run stays an order of",
    "magnitude below the 0.25 s flash minimum, and the supervisor's",
    "run-length logic (flash needs a 0.25-0.8 s run, release 1.8 s)",
    "means isolated frames produce zero events — fading cannot fake",
    "answer/flash/release signaling.",
    "Regression: tests/test_supervision.py::test_supervision_rides_out_fading.",
    "",
]
path = "/root/repo/docs/BER.md"
doc = open(path).read()
marker = "\n## Supervision under Rayleigh fading"
if marker in doc:
    doc = doc[: doc.index(marker)]
open(path, "w").write(doc + "\n".join(lines))
emit(event="done", doc="docs/BER.md section written")
