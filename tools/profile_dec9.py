"""Is the 0.41 ms LUT step the gather itself?  Variants: idx (no
gather), lut (gather), lut3 (16^3 factored one-hot einsum contraction).
Plus transform_bf16 retest at the new decode."""
import functools, json, sys, time
import numpy as np
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
sys.path.insert(0, "/root/repo")
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import quadrature_demod_planar
from amps_tpu.rx import correlator
from amps_tpu.rx.decoder import _word_syndrome_op, DCC_BITS, NUM_WORDS, \
    NUM_REPEATS, WORD_SYMBOLS
from amps_tpu.codec.bch import recc_decode_table_packed
from amps_tpu.codec.bits import packbits

OUT = open("/root/repo/tools/profile_dec9.out", "a", buffering=1)
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
    demod, _, _ = quadrature_demod_planar(ypl[0], ypl[1], return_power=True)
    demod = demod.astype(jnp.bfloat16)
    phases = correlator.symbol_phase_streams(demod, sps)
    starts, valid, quality = correlator.find_bursts_phases(
        phases, sps, 2, 0.55, out_bf16=True)
    hard, _ = correlator.extract_from_phases(phases, starts, sps,
                                             hard_dtype=jnp.bfloat16)
    s = hard
    batch = s.shape[:-1]
    sw = s[..., 2 * DCC_BITS:].reshape(batch + (NUM_WORDS, WORD_SYMBOLS))
    W, c = _word_syndrome_op()
    raw = jnp.matmul(sw, jnp.asarray(W).astype(s.dtype),
                     preferred_element_type=jnp.float32)
    syn = jnp.mod(jnp.asarray(c) - raw, 2.0)
    if variant == "idx_f":
        wts = jnp.asarray((2.0 ** np.arange(11, -1, -1)).astype(np.float32))
        synr = syn.reshape(batch + (NUM_WORDS, NUM_REPEATS, 12))
        idxf = jnp.einsum("...j,j->...", synr, wts)
        return {"q": quality, "i": idxf}
    synr = syn.reshape(batch + (NUM_WORDS, NUM_REPEATS, 12)).astype(jnp.int32)
    idx = packbits(synr, jnp.int32)
    if variant == "idx":
        return {"q": quality, "i": idx}
    if variant == "lut":
        g = jnp.asarray(recc_decode_table_packed())[idx]
        return {"q": quality, "g": g}
    if variant == "lut3":
        tab = recc_decode_table_packed().astype(np.float32)
        T3 = jnp.asarray(tab.reshape(16, 16, 16))
        i16 = jnp.arange(16, dtype=jnp.int32)
        oh_a = (idx // 256 == i16[..., None, None, None, None, None]) \
            .astype(jnp.float32)  # wrong orientation; use [..., None]==i16
        oh_a = ((idx // 256)[..., None] == i16).astype(jnp.float32)
        oh_b = ((idx // 16 % 16)[..., None] == i16).astype(jnp.float32)
        oh_c = ((idx % 16)[..., None] == i16).astype(jnp.float32)
        A1 = jnp.einsum("abc,...c->...ab", T3, oh_c)
        A2 = jnp.einsum("...ab,...b->...a", A1, oh_b)
        gf = jnp.einsum("...a,...a->...", A2, oh_a)
        return {"q": quality, "g": gf}
    raise ValueError(variant)

for v in ("idx", "idx_f", "lut", "lut3"):
    dt = timeit(lambda xb, vv=v: rx_v(xb, vv), x)
    emit(event="variant", variant=v, ms=dt * 1e3, msps=n / dt / 1e6)

for tb in (False, True):
    sp = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank",
                          io_bf16=True, corr_bf16=True, transform_bf16=tb)
    def full(xb, sp=sp):
        return rx_multichannel_block(xb, sp, max_bursts=2)["quality"]
    dt = timeit(full, x)
    emit(event="rx_full", M=M, transform_bf16=tb, ms=dt * 1e3,
         msps=n / dt / 1e6)
emit(event="done")
