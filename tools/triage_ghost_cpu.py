"""CPU repro of the two gate-surviving stream64 anomalies: rebuild the
exact first 16384 hops of the seed-41 band, demod channels 328 and
1000, and inspect quality / trigger_errors around the reported
positions (abs_sym 290 on 328, 413 on 1000)."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp

from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fm_modulate_symbols, quadrature_demod_planar
from amps_tpu.eval import channel as chanimp
from amps_tpu.eval.traffic import random_events
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.rx import correlator
from amps_tpu.tx import recc_ms

spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
P = spec.chz_spec.hop
total_hops = 2048 * 64
PRE_HOPS = 16384
rng = np.random.default_rng(41)
events = random_events(150, spec, total_hops, seed=41)
pipe = spec.pipe
fs = float(pipe.chan_rate)
sens = 2 * np.pi * pipe.deviation_hz / fs
Y = np.zeros((PRE_HOPS, spec.num_channels, 2), np.float32)
for ev in events:
    dcc = int(rng.integers(0, 4))
    syms = recc_ms.burst_symbols(ev.words(), dcc=dcc, sps=spec.chan_sps)
    bb, _ = fm_modulate_symbols(syms.astype(np.int8), sens)
    bb = np.asarray(bb)
    cfo = float(rng.uniform(-2100.0, 2100.0))
    ph = 2 * np.pi * cfo * np.arange(len(bb)) / fs
    c, s = np.cos(ph).astype(np.float32), np.sin(ph).astype(np.float32)
    bb = np.stack([bb[:, 0] * c - bb[:, 1] * s,
                   bb[:, 0] * s + bb[:, 1] * c], -1)
    fd = float(rng.uniform(2.0, 80.0))
    bb = np.asarray(chanimp.apply_gain(
        bb, chanimp.rayleigh_gain(len(bb), fs, fd, rng)), np.float32)
    if ev.start_hop < PRE_HOPS:
        n = min(len(bb), PRE_HOPS - ev.start_hop)
        Y[ev.start_hop: ev.start_hop + n, ev.channel] = bb[:n]
x, _ = chz.synthesize(jnp.asarray(Y), spec.chz_spec,
                      chz.synthesizer_init(spec.chz_spec))
# full-shape noise so the prefix matches the on-chip run exactly
noise = jax.random.normal(jax.random.PRNGKey(2), (total_hops * P, 2),
                          jnp.float32)
x = x + 0.01 * noise[: x.shape[0]]
print("synthesized", x.shape)

ypl, _ = chz.analyze(x, spec.chz_spec, chz.analyzer_init(spec.chz_spec),
                     chmajor=True, planar=True)
for chan, pos_sym, label in ((328, 290, "j40"), (1000, 413, "j119"),
                             (328, 636 + 82, "true84")):
    demod, _ = quadrature_demod_planar(ypl[0, chan][None],
                                       ypl[1, chan][None])
    d = jnp.asarray(demod[0], jnp.bfloat16)     # io_bf16 parity
    phases = correlator.symbol_phase_streams(d, 3)
    starts, valid, quality = correlator.find_bursts_phases(
        phases[None], 3, max_bursts=6, threshold=0.55, out_bf16=True)
    st = np.asarray(starts)[0]; q = np.asarray(quality)[0]
    v = np.asarray(valid)[0]
    errs = np.asarray(correlator.trigger_errors(
        phases[None], jnp.asarray(starts), 3))[0]
    print(f"[{label}] chan {chan}: candidates "
          f"{[(int(s), round(float(qq),3), bool(vv), int(e)) for s,qq,vv,e in zip(st,q,v,errs)]}")
    probe = jnp.asarray([[pos_sym * 3, (pos_sym + 1) * 3, pos_sym * 3 + 1,
                          pos_sym * 3 + 2, (pos_sym - 1) * 3,
                          (636 + 82) * 3]], jnp.int32)
    e2 = np.asarray(correlator.trigger_errors(phases[None], probe, 3))[0]
    print(f"[{label}] trigger_errors at probes {np.asarray(probe)[0].tolist()}: {e2.tolist()}")
