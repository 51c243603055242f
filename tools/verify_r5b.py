"""Verify drive: canonical TX loopback + RX burst decode through the
changed compaction path + control-plane dispatch (CPU)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

# ---- 1. canonical TX drive -------------------------------------------------
from amps_tpu import PipelineConfig
from amps_tpu.codec import words as W
from amps_tpu.ref import words_ref
from amps_tpu.tx.focc import FoccStream, STREAM_BOTH, _FRAME_SRC
from amps_tpu.tx.modulator import fm_modulate
from amps_tpu.rx.frontend import rx_frontend, rx_lpf_taps
from amps_tpu.tx.modulator import tx_interp_taps
from amps_tpu.codec.manchester import manchester_decode_bits

pipe = PipelineConfig()
bs = FoccStream(sps=pipe.sps)
min1, min2 = words_ref.parse_min("5551234567")
w1 = np.asarray(W.focc_word1(True, 0, min1))
w2 = np.asarray(W.focc_word2_general(min2, 0, 0, 0))
bs.push_words(STREAM_BOTH, [w1, w2])
syms = np.asarray(bs.next_superframe_symbols())
syms = np.concatenate([syms, np.zeros(4000, syms.dtype)])  # filter flush
iq, _ = fm_modulate(syms.astype(np.int8), pipe)
demod = np.asarray(rx_frontend(np.asarray(iq), pipe, center_freq=0.0)[0])
gd = (len(tx_interp_taps()) - 1) // 2 + (len(rx_lpf_taps()) - 1) // 2
d = demod[gd // 2:]
sps200 = 10
nsym = len(d) // sps200
dumped = d[:nsym * sps200].reshape(nsym, sps200).mean(axis=1)
hard = (dumped >= 0).astype(np.int8)
nreal = (len(syms) - 4000) // pipe.sps
ref_syms = ((syms[::pipe.sps][:min(nsym, nreal)] + 1) // 2).astype(np.int8)
agree = float((hard[:len(ref_syms)] == ref_syms).mean())
print(f"TX loopback symbol agreement: {agree:.4f}")
assert agree == 1.0, agree
# manchester_decode_bits takes SLICED 0/1 symbols ((1,0)->0, (0,1)->1)
bits, badc = manchester_decode_bits(hard)
bits = np.asarray(bits).reshape(-1)
print(f"bad manchester pairs over the air: {int(badc)}")
nf = len(bits) // 463
frame_bits = bits[:463 * nf].reshape(nf, 463)
src = np.asarray(_FRAME_SRC)
from amps_tpu.codec.bch import focc_bch_encode
cw1 = np.asarray(focc_bch_encode(np.asarray(w1))).reshape(-1)
cw2 = np.asarray(focc_bch_encode(np.asarray(w2))).reshape(-1)
hits = []
for f in range(nf):
    msg = frame_bits[f][src >= 0]
    if np.array_equal(msg[21:61], cw1):
        hits.append((f, "w1"))
    if np.array_equal(msg[21:61], cw2):
        hits.append((f, "w2"))
print(f"frames carrying injected 40-bit BCH codewords at offset 21: {hits}")
assert ("w1" in dict((b, a) for a, b in hits).keys()
        and "w2" in dict((b, a) for a, b in hits).keys()), hits

# ---- 2. RX drive through MultichannelReceiver (compaction path) -----------
import jax.numpy as jnp
from amps_tpu.dsp import channelizer as chz
from amps_tpu.parallel.pipeline import MultichannelSpec
from amps_tpu.runtime.streamer import MultichannelReceiver
from amps_tpu.tx import recc_ms
from amps_tpu.dsp.fm import fm_modulate_symbols

spec = MultichannelSpec(num_channels=16)
M, P, sps = 16, 8, spec.chan_sps
words_a = recc_ms.page_response_words("5551234567")
burst = recc_ms.burst_symbols(words_a, dcc=2, sps=sps)
n = 40000
Y = np.zeros((n, M, 2), np.float32)
wave = np.asarray(fm_modulate_symbols(
    jnp.asarray(burst.astype(np.int32)),
    2.0 * np.pi * spec.pipe.deviation_hz / float(spec.pipe.chan_rate))[0])
Y[500:500 + len(wave), 3] = wave
x, _ = chz.synthesize(jnp.asarray(Y), spec.chz_spec,
                      chz.synthesizer_init(spec.chz_spec))
rx = MultichannelReceiver(spec, threshold=0.5)
reps = rx.push(np.asarray(x)) + rx.flush()
print(f"RX reports: {[(r.channel, int(r.word_ok.sum())) for r in reps]}")
assert len(reps) == 1 and reps[0].channel == 3
want = np.stack(words_a)
assert np.array_equal(reps[0].words[:len(want)], want)
print("RX burst decoded bit-exact through compaction path")

# ---- 3. control-plane dispatch --------------------------------------------
from amps_tpu import SystemConfig
from amps_tpu.control.station import BaseStation
st = BaseStation(SystemConfig(), sps=sps)
st.handle_burst(reps[0].words, reps[0].word_ok, reps[0].bad_symbols)
ev = [e for e in st.events]
print(f"station events after page response: {ev[-2:]}")
assert any("page_response" in str(e) or "fvc" in str(e).lower()
           or "assign" in str(e).lower() for e in ev), ev
print("VERIFY OK")
