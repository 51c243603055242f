"""ON-CHIP probe of the stream64 v2 gate escape: rebuild the exact
seed-41 prefix, run the streaming RX stage chain block by block with
the receiver's exact dtypes, and dump candidates + trigger_errors for
channels 328 and 1000 — isolating where chip numerics diverge from the
CPU repro (which gates both ghosts correctly)."""
import json, sys
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fm_modulate_symbols, quadrature_demod_planar
from amps_tpu.eval import channel as chanimp
from amps_tpu.eval.traffic import random_events
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.rx import correlator
from amps_tpu.tx import recc_ms

OUT = open("/root/repo/tools/probe_gate_tpu.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)

spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
M, sps = 1024, spec.chan_sps
P = spec.chz_spec.hop
total_hops = 2048 * 64
PRE_HOPS = 16384
rng = np.random.default_rng(41)
events = random_events(150, spec, total_hops, seed=41)
pipe = spec.pipe; fs = float(pipe.chan_rate)
sens = 2 * np.pi * pipe.deviation_hz / fs
Y = np.zeros((PRE_HOPS, M, 2), np.float32)
for ev in events:
    dcc = int(rng.integers(0, 4))
    syms = recc_ms.burst_symbols(ev.words(), dcc=dcc, sps=sps)
    bb, _ = fm_modulate_symbols(syms.astype(np.int8), sens)
    bb = np.asarray(bb)
    cfo = float(rng.uniform(-2100.0, 2100.0))
    ph = 2 * np.pi * cfo * np.arange(len(bb)) / fs
    c, s = np.cos(ph).astype(np.float32), np.sin(ph).astype(np.float32)
    bb = np.stack([bb[:, 0]*c - bb[:, 1]*s, bb[:, 0]*s + bb[:, 1]*c], -1)
    fd = float(rng.uniform(2.0, 80.0))
    bb = np.asarray(chanimp.apply_gain(
        bb, chanimp.rayleigh_gain(len(bb), fs, fd, rng)), np.float32)
    if ev.start_hop < PRE_HOPS:
        n = min(len(bb), PRE_HOPS - ev.start_hop)
        Y[ev.start_hop: ev.start_hop + n, ev.channel] = bb[:n]
x, _ = chz.synthesize(jnp.asarray(Y), spec.chz_spec,
                      chz.synthesizer_init(spec.chz_spec))
noise = jax.random.normal(jax.random.PRNGKey(2), (total_hops * P, 2),
                          jnp.float32)
x = x + 0.01 * noise[: x.shape[0]]
float(jnp.sum(x[:8]))
emit(event="synthesized", n=int(x.shape[0]), device=str(jax.devices()[0]))

T = spec.taps_per_phase
L = M * T
OVR = (correlator.TRIGGER_SYMBOLS + correlator.CAPTURE_SYMBOLS) * sps
h = jnp.asarray(chz.prototype_taps(M, T))
split = chz.default_split(M)


@jax.jit
def step(xb, hist, parity, carry, prev):
    ypl = chz._analyze_block_chmajor(
        jnp.concatenate([hist, xb], axis=0), h, M, T, parity,
        False, split, "bank", planar=True)
    demod_new, (lr, li) = quadrature_demod_planar(
        ypl[0], ypl[1], 1.0, (prev[:, 0], prev[:, 1]))
    demod = jnp.concatenate([carry, demod_new], axis=-1)
    dsp = demod.astype(jnp.bfloat16)
    phases = correlator.symbol_phase_streams(dsp, sps)
    starts, valid, quality = correlator.find_bursts_phases(
        phases, sps, 6, 0.55, out_bf16=True)
    terr = correlator.trigger_errors(phases, starts, sps)
    Nh = demod_new.shape[-1]
    return (starts, valid, quality, terr,
            jnp.concatenate([hist, xb], axis=0)[-(L - M // 2):],
            (parity + Nh) % 2, demod[:, -OVR:],
            jnp.stack([lr, li], axis=-1), phases)


hist = jnp.zeros((L - M // 2, 2), jnp.float32)
parity = jnp.int32(0)
carry = jnp.zeros((M, OVR), jnp.float32)
prev = jnp.zeros((M, 2), jnp.float32)
for b in range(7):
    xb = x[b * 2048 * P:(b + 1) * 2048 * P]
    (starts, valid, quality, terr, hist, parity, carry, prev,
     phases) = step(xb, hist, parity, carry, prev)
    st, v, q, te = (np.asarray(starts), np.asarray(valid),
                    np.asarray(quality, np.float32), np.asarray(terr))
    for ch in (328, 1000):
        cands = [(int(st[ch, k]), round(float(q[ch, k]), 3),
                  bool(v[ch, k]), int(te[ch, k])) for k in range(6)]
        emit(event="block", b=b, chan=ch, cands=cands)
    if b == 5:
        # direct probes at the ghost positions in block-5 window coords
        for ch, abs_sym in ((328, 290), (1000, 413)):
            wpos = abs_sym * 3 - (b * 2048 - OVR)
            pr = jnp.asarray([[wpos, wpos + 1, wpos + 2]], jnp.int32)
            e = np.asarray(correlator.trigger_errors(
                phases[ch][None], pr, sps))[0]
            emit(event="probe", chan=ch, abs_sym=abs_sym, wpos=int(wpos),
                 errs=e.tolist())
emit(event="done")
