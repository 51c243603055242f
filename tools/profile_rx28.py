"""Round-4 single-chip RX profile (VERDICT r3 item 1 evidence):

1. FRESH stage marginals at the FULL production config (fold=bank,
   io_bf16, corr_bf16, transform_bf16 @1024, rssi blocks, fused
   trigger gate lead, repeat gate) — PERF.md's stage table was built on
   profile_rx17 (pre-symbol-domain-decode, decode 0.85 ms); the r2
   rework's own profile (profile_rx26) showed decode at 0.16 ms, i.e.
   the "decode is the worst stage" designation was stale.  This run
   replaces the table with production-config numbers.
2. Interleaved same-process A/B of the decode-precision lever: the new
   split-component syndrome LUT at DEFAULT matmul precision vs the r3
   Precision.HIGHEST packed lookup (VERDICT item 1 lever b).

All comparisons interleave in ONE process (2-9%+ session drift,
docs/PERF.md).
"""
import json, statistics, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.rx import correlator, decoder
from amps_tpu.codec import bch
from amps_tpu.parallel.pipeline import MultichannelSpec

OUT = open("/root/repo/tools/profile_rx28.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=128):
    r = fn(*a); sync(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*a)
    sync(r)
    return (time.perf_counter() - t0) / iters

emit(event="start", device=str(jax.devices()[0]))
n = 1 << 22
rng = np.random.default_rng(0)
x = jnp.asarray(rng.normal(0, 0.1, (n, 2)).astype(np.float32))

_decode_raw = decoder.decode_bursts.__wrapped__


def legacy_highest_lookup(idx, table):
    """The r3 packed lookup: 16^3-factored contraction of the packed
    2^17-magnitude values at Precision.HIGHEST (the A/B baseline)."""
    T3 = jnp.asarray(table.astype(np.float32).reshape(16, 16, 16))
    i16 = jnp.arange(16, dtype=jnp.int32)
    oh_a = ((idx // 256)[..., None] == i16).astype(jnp.float32)
    oh_b = ((idx // 16 % 16)[..., None] == i16).astype(jnp.float32)
    oh_c = ((idx % 16)[..., None] == i16).astype(jnp.float32)
    hi = jax.lax.Precision.HIGHEST
    gf = jnp.einsum("...ab,...b->...a",
                    jnp.einsum("abc,...c->...ab", T3, oh_c, precision=hi),
                    oh_b, precision=hi)
    return jnp.einsum("...a,...a->...", oh_a, gf,
                      precision=hi).astype(jnp.int32)


def build(spec, upto, lut=None):
    """Staged production pipeline (mirrors rx_multichannel_block incl.
    rssi blocks + fused trigger gate).  ``lut``: override
    bch.packed_lut_lookup at TRACE time (closures trace fresh)."""
    sps = spec.chan_sps

    def fn(xb):
        # decoder imported the name directly — patch BOTH namespaces
        saved = bch.packed_lut_lookup, decoder.packed_lut_lookup
        if lut is not None:
            bch.packed_lut_lookup = decoder.packed_lut_lookup = lut
        try:
            ypl, _ = chz.analyze(xb, spec.chz_spec,
                                 chz.analyzer_init(spec.chz_spec),
                                 chmajor=True, bf16=spec.transform_bf16,
                                 split=spec.transform_split,
                                 fold=spec.fold, planar=True)
            if spec.io_bf16:
                ypl = ypl.astype(jnp.bfloat16)
            if upto == "analyze":
                return ypl
            demod, _, pw_series = quadrature_demod_planar(
                ypl[0], ypl[1], return_power="series")
            pw_blk = correlator.window_power_blocks([pw_series])
            chan_power = correlator.power_from_blocks(
                pw_blk, pw_series.shape[-1])
            if spec.io_bf16:
                demod = demod.astype(jnp.bfloat16)
            if upto == "demod":
                return demod, chan_power
            phases = correlator.symbol_phase_streams(demod, sps)
            if upto == "phases":
                return phases, chan_power
            starts, valid, quality = correlator.find_bursts_phases(
                phases, sps, 2, 0.55, out_bf16=spec.corr_bf16)
            if upto == "find":
                return starts, valid, quality
            rssi = correlator.burst_rssi_blocks(pw_blk, starts, sps)
            lead = correlator.TRIGGER_SYMBOLS
            ext = correlator.extract_from_phases(
                phases, starts, sps,
                hard_dtype=jnp.bfloat16 if spec.io_bf16 else jnp.uint8,
                lead=lead)
            valid = correlator.apply_trigger_gate_soft(
                valid, ext[2], spec.max_trigger_errors, starts, sps)
            if upto == "extract+gate":
                return starts, valid, ext[0], rssi
            dec = _decode_raw(ext[0], "first_ok", spec.decode_repeat_gate)
            return (starts, valid, quality, dec.words, dec.word_ok,
                    rssi, chan_power)
        finally:
            bch.packed_lut_lookup, decoder.packed_lut_lookup = saved
    return jax.jit(fn)


# ---- 1. production stage marginals -----------------------------------
for M in (1024, 256):
    spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank",
                            io_bf16=True, corr_bf16=True,
                            transform_bf16=(M == 1024))
    prev = 0.0
    for upto in ("analyze", "demod", "phases", "find", "extract+gate",
                 "full"):
        dt = timeit(build(spec, upto), x)
        emit(M=M, upto=upto, ms=round(dt * 1e3, 3),
             marginal_ms=round((dt - prev) * 1e3, 3),
             msps=round(n / dt / 1e6, 1))
        prev = dt

# ---- 2. interleaved A/B: split-LUT default precision vs HIGHEST ------
spec = MultichannelSpec(num_channels=1024, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True, transform_bf16=True)
fn_split = build(spec, "full")
fn_hi = build(spec, "full", lut=legacy_highest_lookup)
# warm both
sync(fn_split(x)); sync(fn_hi(x))
rounds = {"lut_split": [], "lut_highest": []}
for r in range(5):
    for name, fn in (("lut_split", fn_split), ("lut_highest", fn_hi)):
        dt = timeit(fn, x, iters=64)
        rounds[name].append(round(n / dt / 1e6, 1))
for name, vals in rounds.items():
    emit(event="ab", variant=name, rounds=vals,
         median=round(statistics.median(vals), 1))
emit(event="done")
