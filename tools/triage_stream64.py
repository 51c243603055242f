"""Triage re-run of the 64-block streaming soak (VERDICT r2 item 1).

Reproduces tools/soak_stream64_tpu.py EXACTLY (same seeds, same rng
draw order, same receiver settings, same checkpoint/restore) but dumps
every report and every event with full detail, then attributes each
report's decoded words to the event that actually transmitted them —
separating (a) dedup/accounting artifacts from (b) genuine misdecodes
from (c) adjacent-channel FM-capture ghosts.
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fm_modulate_symbols
from amps_tpu.eval import channel as chanimp
from amps_tpu.eval.traffic import random_events
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.runtime.state import load_receiver, save_receiver
from amps_tpu.runtime.streamer import MultichannelReceiver
from amps_tpu.tx import recc_ms

OUT = open("/root/repo/tools/triage_stream64.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)

spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
P = spec.chz_spec.hop
BLOCK_HOPS = 2048
NBLOCKS = 64
total_hops = BLOCK_HOPS * NBLOCKS
rng = np.random.default_rng(41)
events = random_events(150, spec, total_hops, seed=41)
emit(event="start", device=str(jax.devices()[0]), n_events=len(events))

pipe = spec.pipe
fs = float(pipe.chan_rate)
sens = 2 * np.pi * pipe.deviation_hz / fs
Y = jnp.zeros((total_hops, spec.num_channels, 2), jnp.float32)
meta = []
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
    gain = chanimp.rayleigh_gain(len(bb), fs, fd, rng)
    bb = chanimp.apply_gain(bb, gain)
    n = min(len(bb), total_hops - ev.start_hop)
    Y = Y.at[ev.start_hop: ev.start_hop + n, ev.channel].set(
        jnp.asarray(bb[:n]))
    g = np.asarray(gain, np.float32)
    mag = np.abs(g[:, 0] + 1j * g[:, 1]) if g.ndim == 2 else np.abs(g)
    meta.append((ev, dcc, cfo, fd,
                 float(mag.min()), float(mag.mean()), float(mag.max())))
x, _ = chz.synthesize(Y, spec.chz_spec, chz.synthesizer_init(spec.chz_spec))
x = x + 0.01 * jax.random.normal(jax.random.PRNGKey(2), x.shape, jnp.float32)
del Y
float(jnp.sum(x[:8]))
emit(event="synthesized", samples=int(x.shape[0]))


def make_rx():
    return MultichannelReceiver(spec, threshold=0.55, max_bursts=6,
                                min_rssi=0.02)


rx = make_rx()
reports = []
t0 = time.perf_counter()
for b in range(NBLOCKS):
    if b == 32:
        save_receiver("/tmp/triage64_ckpt.npz", rx)
        rx = make_rx()
        load_receiver("/tmp/triage64_ckpt.npz", rx)
    reports += rx.push(x[b * BLOCK_HOPS * P:(b + 1) * BLOCK_HOPS * P])
reports += rx.flush()
dt = time.perf_counter() - t0
emit(event="streamed", wall_s=round(dt, 2), n_reports=len(reports))

# ---- full dumps -----------------------------------------------------------
# event table: index, channel, start symbol, word rows for identity matching
ev_words = []
for i, (ev, dcc, cfo, fd, gmin, gmean, gmax) in enumerate(meta):
    w = np.stack(ev.words())
    ev_words.append(w)
    emit(event="ev", i=i, kind=ev.kind, chan=int(ev.channel),
         start_hop=int(ev.start_hop), start_sym=int(ev.start_hop) // 3,
         nw=int(w.shape[0]), dcc=dcc, cfo=round(cfo), fd=round(fd, 1),
         fade_min=round(gmin, 4), fade_mean=round(gmean, 3),
         fade_max=round(gmax, 3))

# report table: position, quality, rssi + identity = which event's words
# these are (match on ALL transmitted rows, any channel)
for j, r in enumerate(reports):
    got = np.asarray(r.words)
    ident = []
    for i, w in enumerate(ev_words):
        nw = w.shape[0]
        if all(np.array_equal(got[t], w[t]) for t in range(nw)):
            ident.append(i)
    emit(event="rep", j=j, chan=int(r.channel), abs_sym=int(r.abs_symbol),
         quality=round(float(r.quality), 4), rssi=round(float(r.rssi), 4),
         dcc=int(r.dcc), word_ok=np.asarray(r.word_ok).astype(int).tolist(),
         bad=np.asarray(r.bad_symbols).astype(int).tolist(),
         words_match_events=ident)
emit(event="done")
