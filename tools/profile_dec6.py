"""Chase the ~0.4 ms cost of returning dcc_bits+bad_symbols from the
full RX call (tools/profile_rx19.out: no_bad 2.61 ms vs full 3.00).
Variants swap the decoder tail inside the full pipeline."""
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
from amps_tpu.codec.bch import apply_error_pattern, recc_syndrome_packed
from amps_tpu.codec.manchester import manchester_decode_bits

OUT = open("/root/repo/tools/profile_dec6.out", "a", buffering=1)
def emit(**kw):
    OUT.write(json.dumps(kw) + "\n"); print(kw, flush=True)
def sync(r):
    x = jax.tree_util.tree_leaves(r)[0]
    return float(jnp.sum(jnp.abs(jnp.asarray(x, jnp.float32)).ravel()[:4]))
def timeit(fn, *a, iters=96):
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
    hard, soft = correlator.extract_from_phases(phases, starts, sps)

    # inline decode (first_ok), outputs per variant
    s = jnp.asarray(hard)
    batch = s.shape[:-1]
    dcc_sym = s[..., :14]
    word_sym = s[..., 14:].reshape(batch + (7, 480))
    dcc_bits, dcc_bad = manchester_decode_bits(dcc_sym)
    word_bits, word_bad = manchester_decode_bits(word_sym)
    reps = word_bits.reshape(batch + (7, 5, 48))
    g = recc_syndrome_packed(reps)
    ok = (g & (1 << 16)) != 0
    first_idx = jnp.argmax(ok, axis=-1)
    any_ok = jnp.any(ok, axis=-1)
    onehot = (jnp.arange(5) == first_idx[..., None])
    g_sel = jnp.sum(g * onehot, axis=-1)
    rep_sel = jnp.sum(reps * onehot[..., None].astype(reps.dtype),
                      axis=-2).astype(reps.dtype)
    words = apply_error_pattern(rep_sel, g_sel, 36)

    out = {"starts": starts, "valid": valid, "quality": quality,
           "words": words, "word_ok": any_ok, "chan_power": chan_power}
    if variant == "none":
        return out
    if variant == "used":
        out["repeat_used"] = first_idx
        return out
    if variant == "dcc":
        out["dcc_bits"] = dcc_bits
        return out
    if variant == "bad":
        bad = jnp.concatenate([dcc_bad[..., None], word_bad], axis=-1)
        out["bad_symbols"] = bad.astype(jnp.int32)
        return out
    if variant == "bad_seg":
        # one masked-agree plane over the raw capture + a (3373, 8)
        # segment matmul: per-word bad counts with one MXU op
        agree = 1.0 - jnp.bitwise_xor(s[..., :-1],
                                      s[..., 1:]).astype(jnp.float32)
        npair = s.shape[-1] - 1
        seg = np.zeros((npair, 8), np.float32)
        pos = np.arange(0, npair, 2)
        widx = np.where(pos < 14, 0, 1 + (pos - 14) // 480)
        seg[pos, widx] = 1.0
        bad = jnp.matmul(agree, jnp.asarray(seg),
                         preferred_element_type=jnp.float32)
        out["bad_symbols"] = bad.astype(jnp.int32)
        return out
    if variant == "all":
        out["repeat_used"] = first_idx
        out["dcc_bits"] = dcc_bits
        bad = jnp.concatenate([dcc_bad[..., None], word_bad], axis=-1)
        out["bad_symbols"] = bad.astype(jnp.int32)
        return out
    raise ValueError(variant)

for v in ("none", "used", "dcc", "bad", "bad_seg", "all"):
    dt = timeit(lambda xb, vv=v: rx_v(xb, vv), x)
    emit(event="variant", variant=v, ms=dt*1e3, msps=n/dt/1e6)
emit(event="done")
