"""Closed-loop structure probe: lax.scan vs QUEUED DONATED-STATE steps.

cl2 left a gap between the in-scan stages and the same ops standalone
(TX 1 642 in-scan vs 2 263 standalone, same session).  Hypothesis: the
scan body is compiled as a called computation with loop-carry buffer
constraints that cost fusion/layout freedom; the same body as a
standalone jitted step with DONATED state, enqueued N deep with no host
sync in between, should recover the standalone rate while keeping the
closed loop's zero-host-data property (state never leaves the device;
only the final scalar is fetched).
"""
import functools, json, sys, time
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

OUT = open("/root/repo/tools/profile_cl3.out", "a", buffering=1)
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
emit(event="start", device=str(jax.devices()[0]), M=M, nblocks=NBLOCKS)


def body(Y, st, upto):
    x, syn_tail = chz._synthesize_block(Y, h, M, T, 0, st["syn_carry"],
                                        False, split)
    st2 = dict(st)
    st2["syn_carry"] = syn_tail
    if upto == "tx":
        return st2, jnp.sum(jnp.abs(x[:64, 0]))
    x_ext = jnp.concatenate([st["hist"], x], axis=0)
    ypl = chz._analyze_block_chmajor(x_ext, h, M, T, 0, False, split,
                                     "bank", planar=True)
    st2["hist"] = x_ext[-(L - P):]
    demod_new, (lr, li), pw_new = quadrature_demod_planar(
        ypl[0], ypl[1], 1.0, (st["prev"][:, 0], st["prev"][:, 1]),
        return_power="series")
    demod = jnp.concatenate([st["carry"], demod_new], axis=-1)
    nc = st["carry"].shape[-1]
    st2["carry"] = demod[:, -nc:]
    st2["prev"] = jnp.stack([lr, li], axis=-1)
    pw_blk = correlator.window_power_blocks([st["pw_carry"], pw_new])
    st2["pw_carry"] = pw_new[:, -nc:]
    dsp = demod.astype(jnp.bfloat16)
    phases = correlator.symbol_phase_streams(dsp, sps)
    starts, valid, quality = correlator.find_bursts_phases(
        phases, sps, 2, 0.55, out_bf16=True)
    valid = correlator.apply_trigger_gate(valid, phases, starts, sps, 6)
    rssi = correlator.burst_rssi_blocks(pw_blk, starts, sps)
    hard, _ = correlator.extract_from_phases(phases, starts, sps,
                                             hard_dtype=jnp.bfloat16)
    dec = decoder.decode_bursts(hard, "majority", 6)
    return st2, (jnp.sum(valid) + jnp.sum(rssi)
                 + jnp.sum(dec.word_ok)).astype(jnp.float32)


def state0():
    return {
        "syn_carry": jnp.zeros((L - P, 2), jnp.float32),
        "hist": jnp.zeros((L - P, 2), jnp.float32),
        "carry": jnp.zeros((M, min(ovr, n_hops)), jnp.float32),
        "pw_carry": jnp.zeros((M, min(ovr, n_hops)), jnp.float32),
        "prev": jnp.zeros((M, 2), jnp.float32),
    }


pairs = superframe_word_pairs()[:frames]
wp = jnp.asarray(np.broadcast_to(pairs, (M,) + pairs.shape).copy())
bits = focc_frame_bits(wp)
bb, _ = fsk_manchester_baseband(bits, sps, sens)
Y_dev = jax.device_put(jnp.swapaxes(bb, 0, 1))
float(jnp.sum(Y_dev))


def make_scan(upto):
    @jax.jit
    def run(Y):
        _, outs = lax.scan(lambda st, _: body(Y, st, upto), state0(),
                           None, length=NBLOCKS, unroll=2)
        return jnp.sum(outs)
    return run


def make_stepper(upto):
    @functools.partial(jax.jit, donate_argnums=(1,),
                       static_argnames=("upto",))
    def step(Y, st, upto):
        return body(Y, st, upto)

    def run(Y):
        st = state0()
        out = None
        for _ in range(NBLOCKS):
            st, out = step(Y, st, upto=upto)
        return out
    return run


variants = [
    ("tx_scan", make_scan("tx")),
    ("tx_stepper", make_stepper("tx")),
    ("full_scan", make_scan("full")),
    ("full_stepper", make_stepper("full")),
]

for name, run in variants:
    t0 = time.perf_counter()
    float(run(Y_dev))
    emit(event="compiled", variant=name, s=round(time.perf_counter() - t0, 1))

R = 4
acc = {name: [] for name, _ in variants}
for r in range(R):
    for name, run in variants:
        t0 = time.perf_counter()
        float(run(Y_dev))
        dt = time.perf_counter() - t0
        acc[name].append(NBLOCKS * block_samples / dt / 1e6)
for name, _ in variants:
    v = acc[name]
    emit(event="msps", variant=name, rounds=[round(u, 1) for u in v],
         median=round(float(np.median(v)), 1))
emit(event="done")
