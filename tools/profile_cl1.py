"""Closed-loop gap profiling (VERDICT r2 item 4): where do the extra
~0.9 ms/block go between the fused full-duplex scan (924.8 Msps r2) and
the serial TX+RX ideal (~1240)?

Builds a family of scans that truncate the closed-loop body after each
stage — synthesis only / +analysis / +demod+phases / +find / full — all
with carried state, measured round-robin interleaved (chip drift rule,
CLAUDE.md) at deep repetition.  Also measures a bf16-wideband variant
(synthesis output cast to bf16 before analysis — the judge-suggested
lever) and standalone TX/RX one-shots for reference.
"""
import json, sys, time
sys.path.insert(0, "/root/repo")
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from jax import lax

from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fsk_manchester_baseband, quadrature_demod_planar
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.rx import correlator, decoder
from amps_tpu.tx.focc import focc_frame_bits, superframe_word_pairs

OUT = open("/root/repo/tools/profile_cl1.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)

spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
M, T = 1024, 8
sps = spec.chan_sps
L, P = M * T, M // 2
split = chz.default_split(M)
h = jnp.asarray(chz.prototype_taps(M, T))
sens = 2.0 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
ovr = (correlator.TRIGGER_SYMBOLS + correlator.CAPTURE_SYMBOLS) * sps
frames = 2
n_hops = frames * 463 * 2 * sps
block_samples = n_hops * P
NBLOCKS = 24
emit(event="start", device=str(jax.devices()[0]), M=M, frames=frames,
     block_samples=block_samples, nblocks=NBLOCKS)


def make_scan(upto: str, wb_bf16: bool = False):
    """Closed-loop scan truncated after `upto`; returns jitted run."""

    @jax.jit
    def run(word_pairs):
        bits = focc_frame_bits(word_pairs)
        bb, _ = fsk_manchester_baseband(bits, sps, sens)
        Y = jnp.swapaxes(bb, 0, 1)
        state0 = {
            "syn_carry": jnp.zeros((L - P, 2), jnp.float32),
            "hist": jnp.zeros((L - P, 2), jnp.float32),
            "carry": jnp.zeros((M, min(ovr, n_hops)), jnp.float32),
            "pw_carry": jnp.zeros((M, min(ovr, n_hops)), jnp.float32),
            "prev": jnp.zeros((M, 2), jnp.float32),
            "parity": jnp.zeros((), jnp.int32),
        }

        def body(st, _):
            x, syn_tail = chz._synthesize_block(
                Y, h, M, T, st["parity"], st["syn_carry"], False, split)
            st2 = dict(st)
            st2["syn_carry"] = syn_tail
            st2["parity"] = (st["parity"] + n_hops) % 2
            if upto == "tx":
                return st2, jnp.sum(jnp.abs(x[:64, 0]))
            if wb_bf16:
                x = x.astype(jnp.bfloat16)
            x_ext = jnp.concatenate(
                [st["hist"].astype(x.dtype), x], axis=0)
            ypl = chz._analyze_block_chmajor(
                x_ext, h, M, T, st["parity"], False, split, "bank",
                planar=True)
            st2["hist"] = x_ext[-(L - P):].astype(jnp.float32)
            if upto == "analyze":
                return st2, jnp.sum(jnp.abs(ypl[0, :, :8]))
            demod_new, (lr, li), pw_new = quadrature_demod_planar(
                ypl[0], ypl[1], 1.0, (st["prev"][:, 0], st["prev"][:, 1]),
                return_power="series")
            demod = jnp.concatenate([st["carry"], demod_new], axis=-1)
            pw = jnp.concatenate([st["pw_carry"], pw_new], axis=-1)
            st2["carry"] = demod[:, -st["carry"].shape[-1]:]
            st2["pw_carry"] = pw[:, -st["pw_carry"].shape[-1]:]
            st2["prev"] = jnp.stack([lr, li], axis=-1)
            dsp = demod.astype(jnp.bfloat16)
            phases = correlator.symbol_phase_streams(dsp, sps)
            if upto == "phases":
                return st2, jnp.sum(jnp.abs(
                    phases[:, 0, :8].astype(jnp.float32)))
            starts, valid, quality = correlator.find_bursts_phases(
                phases, sps, 2, 0.55, out_bf16=True)
            valid = correlator.apply_trigger_gate(valid, phases, starts,
                                                  sps, 6)
            rssi = correlator.burst_rssi(pw, starts, sps)
            if upto == "find":
                return st2, (jnp.sum(valid) + jnp.sum(rssi)).astype(
                    jnp.float32)
            hard, _ = correlator.extract_from_phases(
                phases, starts, sps, hard_dtype=jnp.bfloat16)
            dec = decoder.decode_bursts(hard)
            return st2, (jnp.sum(valid) + jnp.sum(dec.word_ok)).astype(
                jnp.float32)

        _, outs = lax.scan(body, state0, None, length=NBLOCKS)
        return jnp.sum(outs)

    return run


pairs = superframe_word_pairs()[:frames]
wp = jnp.asarray(np.broadcast_to(pairs, (M,) + pairs.shape).copy())

variants = [
    ("tx", make_scan("tx")),
    ("tx+analyze", make_scan("analyze")),
    ("tx+..+phases", make_scan("phases")),
    ("tx+..+find", make_scan("find")),
    ("full", make_scan("full")),
    ("full_wb_bf16", make_scan("full", wb_bf16=True)),
]

# warm all compiles first
for name, run in variants:
    t0 = time.perf_counter()
    float(run(wp))
    emit(event="compiled", variant=name,
         s=round(time.perf_counter() - t0, 1))

# interleaved measurement: R rounds of every variant
R = 4
acc = {name: [] for name, _ in variants}
for r in range(R):
    for name, run in variants:
        t0 = time.perf_counter()
        float(run(wp))
        acc[name].append((time.perf_counter() - t0) / NBLOCKS)
prev = 0.0
for name, _ in variants:
    ms = 1e3 * float(np.median(acc[name]))
    msps = block_samples / (ms * 1e3)
    emit(event="scan", variant=name, ms_per_block=round(ms, 3),
         msps=round(msps, 1),
         marginal_ms=round(ms - prev, 3) if not name.startswith("full")
         else None)
    if not name.startswith("full"):
        prev = ms
emit(event="done")
