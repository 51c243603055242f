"""Ablate the symbol-domain decode tail: which piece of the ~0.9 ms
decode marginal is kernel-launch overhead vs compute (full pipeline,
M=1024, production config)."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.rx import correlator
from amps_tpu.rx.decoder import (_word_syndrome_op, _pair_bad, DCC_BITS,
                                 NUM_WORDS, NUM_REPEATS, WORD_SYMBOLS,
                                 WORD_CODED_BITS)
from amps_tpu.codec.bch import (apply_error_pattern,
                                recc_decode_table_packed)
from amps_tpu.codec.bits import packbits

OUT = open("/root/repo/tools/profile_dec8.out", "a", buffering=1)
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
M = 1024
spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank",
                        io_bf16=True, corr_bf16=True)
sps = spec.chan_sps
split = chz.default_split(M)


@functools.partial(jax.jit, static_argnames=("variant",))
def rx_v(xb, variant: str):
    ypl, _ = chz.analyze(xb, spec.chz_spec, chz.analyzer_init(spec.chz_spec),
                         chmajor=True, split=split, fold="bank", planar=True)
    ypl = ypl.astype(jnp.bfloat16)
    demod, _, chan_power = quadrature_demod_planar(ypl[0], ypl[1],
                                                   return_power=True)
    demod = demod.astype(jnp.bfloat16)
    phases = correlator.symbol_phase_streams(demod, sps)
    starts, valid, quality = correlator.find_bursts_phases(
        phases, sps, 2, 0.55, out_bf16=True)
    hard, soft = correlator.extract_from_phases(phases, starts, sps,
                                                hard_dtype=jnp.bfloat16)
    if variant == "extract":
        return {"q": quality, "h": hard}
    s = hard
    batch = s.shape[:-1]
    sw = s[..., 2 * DCC_BITS:].reshape(batch + (NUM_WORDS, WORD_SYMBOLS))
    W, c = _word_syndrome_op()
    raw = jnp.matmul(sw, jnp.asarray(W).astype(s.dtype),
                     preferred_element_type=jnp.float32)
    if variant == "synmm":
        return {"q": quality, "r": raw}
    syn = jnp.mod(jnp.asarray(c) - raw, 2.0)
    syn = syn.reshape(batch + (NUM_WORDS, NUM_REPEATS, 12)).astype(jnp.int32)
    idx = packbits(syn, jnp.int32)
    g = jnp.asarray(recc_decode_table_packed())[idx]
    if variant == "lut":
        return {"q": quality, "g": g}
    ok = (g & (1 << 16)) != 0
    first_idx = jnp.argmax(ok, axis=-1)
    any_ok = jnp.any(ok, axis=-1)
    onehot = (jnp.arange(NUM_REPEATS) == first_idx[..., None])
    g_sel = jnp.sum(g * onehot, axis=-1)
    swr = sw.reshape(batch + (NUM_WORDS, NUM_REPEATS, 2 * WORD_CODED_BITS))
    rep_sym = jnp.einsum("...r,...rs->...s", onehot.astype(s.dtype), swr,
                         preferred_element_type=jnp.float32)
    rep_bits = (1.0 - rep_sym[..., 0::2]).astype(jnp.uint8)
    words = apply_error_pattern(rep_bits, g_sel, 36)
    if variant == "words":
        return {"q": quality, "w": words, "ok": any_ok}
    selm = np.zeros((s.shape[-1], DCC_BITS), np.float32)
    selm[np.arange(0, 2 * DCC_BITS, 2), np.arange(DCC_BITS)] = 1.0
    picked = jnp.matmul(s, jnp.asarray(selm).astype(s.dtype),
                        preferred_element_type=jnp.float32)
    dcc_bits = (1.0 - picked).astype(jnp.uint8)
    if variant == "dcc":
        return {"q": quality, "w": words, "ok": any_ok, "d": dcc_bits}
    dcc_bad = _pair_bad(s[..., : 2 * DCC_BITS], 2 * DCC_BITS)
    word_bad = _pair_bad(sw, WORD_SYMBOLS)
    bad = jnp.concatenate([dcc_bad[..., None], word_bad], axis=-1)
    return {"q": quality, "w": words, "ok": any_ok, "d": dcc_bits,
            "b": bad, "u": first_idx, "p": chan_power, "s": starts,
            "v": valid}

for v in ("extract", "synmm", "lut", "words", "dcc", "all"):
    dt = timeit(lambda xb, vv=v: rx_v(xb, vv), x)
    emit(event="variant", variant=v, ms=dt * 1e3, msps=n / dt / 1e6)
emit(event="done")
