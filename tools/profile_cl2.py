"""Closed-loop levers (VERDICT r2 item 4, after profile_cl1 attribution).

cl1 found two in-scan anomalies at the full-duplex scan @1024ch:
  * find-stage marginal 0.93 ms (vs ~0.2 standalone) — the per-burst
    rssi power series concat/materialization; product code now uses
    window_power_blocks (fusion-resident series), body A->B tests it;
  * TX synthesis 1.84 ms in-scan vs ~0.97 standalone — candidate causes:
    traced hop parity forcing the (Nh, M) sign plane + blocking constant
    folding (C: blocks are even-hop, parity is structurally 0 — the
    CLAUDE.md block-length invariant), lax.scan loop overhead (D:
    unroll), small blocks amortizing state badly (E: frames 2 -> 6).

All variants measured round-robin interleaved in one process.
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

OUT = open("/root/repo/tools/profile_cl2.out", "a", buffering=1)
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
NBLOCKS = 24
emit(event="start", device=str(jax.devices()[0]), M=M, nblocks=NBLOCKS)


def make_scan(frames=2, static_parity=False, unroll=1, upto="full",
              old_rssi=False):
    n_hops = frames * 463 * 2 * sps
    assert n_hops % 2 == 0

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
        }
        if not static_parity:
            state0["parity"] = jnp.zeros((), jnp.int32)

        def body(st, _):
            par = 0 if static_parity else st["parity"]
            x, syn_tail = chz._synthesize_block(
                Y, h, M, T, par, st["syn_carry"], False, split)
            st2 = dict(st)
            st2["syn_carry"] = syn_tail
            if not static_parity:
                st2["parity"] = (st["parity"] + n_hops) % 2
            if upto == "tx":
                return st2, jnp.sum(jnp.abs(x[:64, 0]))
            x_ext = jnp.concatenate([st["hist"], x], axis=0)
            ypl = chz._analyze_block_chmajor(
                x_ext, h, M, T, par, False, split, "bank", planar=True)
            st2["hist"] = x_ext[-(L - P):]
            demod_new, (lr, li), pw_new = quadrature_demod_planar(
                ypl[0], ypl[1], 1.0, (st["prev"][:, 0], st["prev"][:, 1]),
                return_power="series")
            demod = jnp.concatenate([st["carry"], demod_new], axis=-1)
            nc = st["carry"].shape[-1]
            st2["carry"] = demod[:, -nc:]
            st2["prev"] = jnp.stack([lr, li], axis=-1)
            if old_rssi:
                pw = jnp.concatenate([st["pw_carry"], pw_new], axis=-1)
                st2["pw_carry"] = pw[:, -nc:]
            else:
                pw_blk = correlator.window_power_blocks(
                    [st["pw_carry"], pw_new])
                st2["pw_carry"] = (pw_new[:, -nc:] if pw_new.shape[-1] >= nc
                                   else jnp.concatenate(
                                       [st["pw_carry"][:, pw_new.shape[-1]:],
                                        pw_new], axis=-1))
            dsp = demod.astype(jnp.bfloat16)
            phases = correlator.symbol_phase_streams(dsp, sps)
            starts, valid, quality = correlator.find_bursts_phases(
                phases, sps, 2, 0.55, out_bf16=True)
            valid = correlator.apply_trigger_gate(valid, phases, starts,
                                                  sps, 6)
            rssi = (correlator.burst_rssi(pw, starts, sps) if old_rssi
                    else correlator.burst_rssi_blocks(pw_blk, starts, sps))
            hard, _ = correlator.extract_from_phases(
                phases, starts, sps, hard_dtype=jnp.bfloat16)
            dec = decoder.decode_bursts(hard, "majority", 6)
            return st2, (jnp.sum(valid) + jnp.sum(rssi)
                         + jnp.sum(dec.word_ok)).astype(jnp.float32)

        nb = NBLOCKS if frames == 2 else NBLOCKS * 2 // frames
        _, outs = lax.scan(body, state0, None, length=nb, unroll=unroll)
        return jnp.sum(outs)

    return run, frames * 463 * 2 * sps * P


pairs = superframe_word_pairs()[:6]
wp6 = jnp.asarray(np.broadcast_to(pairs, (M,) + pairs.shape).copy())
wp2 = wp6[:, :2]

variants = [
    ("A_full_oldrssi", make_scan(old_rssi=True), wp2),
    ("B_full_blkrssi", make_scan(), wp2),
    ("C_B+static_parity", make_scan(static_parity=True), wp2),
    ("D_C+unroll2", make_scan(static_parity=True, unroll=2), wp2),
    ("E_C_frames6", make_scan(frames=6, static_parity=True), wp6),
    ("F_tx_carried_par", make_scan(upto="tx"), wp2),
    ("G_tx_static_par", make_scan(upto="tx", static_parity=True), wp2),
]

for name, (run, _), wp in variants:
    t0 = time.perf_counter()
    float(run(wp))
    emit(event="compiled", variant=name, s=round(time.perf_counter() - t0, 1))

R = 4
acc = {name: [] for name, _, _ in variants}
for r in range(R):
    for name, (run, block_samples), wp in variants:
        nb = NBLOCKS if block_samples == 2 * 463 * 2 * sps * P \
            else NBLOCKS * 2 // 6
        t0 = time.perf_counter()
        float(run(wp))
        dt = time.perf_counter() - t0
        total = NBLOCKS * 2 * 463 * 2 * sps * P  # same total for all
        acc[name].append(total / dt / 1e6)
for name, _, _ in variants:
    v = acc[name]
    emit(event="msps", variant=name, rounds=[round(u, 1) for u in v],
         median=round(float(np.median(v)), 1))
emit(event="done")
