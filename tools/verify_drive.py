"""End-to-end verify drive (CPU): TX FOCC loopback + RX RECC burst
detect/decode through the public API (per .claude/skills/verify)."""
import os
os.environ["JAX_PLATFORMS"] = "cpu"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import sys
sys.path.insert(0, "/root/repo")

from amps_tpu import PipelineConfig
from amps_tpu.codec import words as W
from amps_tpu.ref import words_ref, frames_ref
from amps_tpu.tx.focc import FoccStream, STREAM_BOTH, _FRAME_SRC
from amps_tpu.tx.modulator import fm_modulate, tx_interp_taps
from amps_tpu.rx.frontend import rx_frontend, rx_lpf_taps
from amps_tpu.rx import correlator, decoder
from amps_tpu.codec.manchester import manchester_decode_bits

ok = True

# ---- TX drive: page a mobile, observe through the RX demod ----
pipe = PipelineConfig()
bs = FoccStream(sps=pipe.sps)
min1, min2 = words_ref.parse_min("5551234567")
w1 = np.asarray(W.focc_word1(True, 0, min1))
w2 = np.asarray(W.focc_word2_general(min2, 0, 0, 0))
bs.push_words(STREAM_BOTH, [w1, w2])
syms = np.asarray(bs.next_superframe_symbols())[:6 * 463 * 2 * pipe.sps]
iq, _ = fm_modulate(syms.astype(np.int8), pipe)
demod = np.asarray(rx_frontend(np.asarray(iq), pipe, center_freq=0.0)[0])

gd400 = (len(tx_interp_taps()) - 1) // 2 + (len(rx_lpf_taps()) - 1) // 2
gd = gd400 // 2  # at 200k
sps200 = 10
d = demod[gd:]
nsym = len(d) // sps200
hard = (d[:nsym * sps200].reshape(nsym, sps200).mean(-1) >= 0).astype(np.uint8)
tx_syms = ((syms[::pipe.sps] + 1) // 2).astype(np.uint8)  # per Manchester sym
m = min(len(hard), len(tx_syms))
agree = float((hard[:m] == tx_syms[:m]).mean())
print("tx symbol agreement:", agree)
ok &= agree == 1.0

bits, bad = manchester_decode_bits(hard[:len(hard) // 2 * 2])
bits = np.asarray(bits)
frame_len = 463
f4 = bits[4 * frame_len:5 * frame_len]
msg = f4[np.asarray(_FRAME_SRC) >= 0]
rec_w1 = msg[21:49]
match_w1 = bool((rec_w1 == w1).all())
print("word1 recovered bit-exact:", match_w1)
ok &= match_w1

# ---- RX drive: RECC burst -> find_bursts (new default 256) -> decode ----
rng = np.random.default_rng(7)
words36 = [rng.integers(0, 2, 36).astype(np.uint8) for _ in range(2)]
burst = frames_ref.recc_burst_symbols(0, words36)  # ±1 syms @1sps
sps = 10
lead = rng.normal(0, 0.03, 5000).astype(np.float32)
stream = np.concatenate([
    lead, np.repeat(burst.astype(np.float32), sps),
    rng.normal(0, 0.03, 8000).astype(np.float32),
]).astype(np.float32)
# pad so start + CAPTURE*sps fits
pad = correlator.CAPTURE_SYMBOLS * sps
stream = np.concatenate([stream, np.zeros(pad, np.float32)])
starts, valid, q, hard_b, soft = correlator.find_and_extract(
    jax.numpy.asarray(stream), sps, max_bursts=2, threshold=0.6)
print("burst valid:", np.asarray(valid).tolist(),
      "quality:", np.round(np.asarray(q), 3).tolist())
ok &= bool(np.asarray(valid)[0])
res = decoder.decode_bursts(hard_b[:1])
dec = np.asarray(res.words)[0]          # (7, 36)
wok = np.asarray(res.word_ok)[0]
m0 = bool((dec[0] == words36[0]).all()) and bool(wok[0])
m1 = bool((dec[1] == words36[1]).all()) and bool(wok[1])
print("recc word0 ok:", m0, "word1 ok:", m1)
ok &= m0 and m1

# ---- Bank loopback: M-channel synthesis -> wideband -> analysis ->
# demod -> burst find -> decode (drives the channelizer transform path) ----
import jax.numpy as jnp
from amps_tpu.parallel.pipeline import MultichannelSpec, rx_multichannel_block
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fsk_manchester_baseband

M = 512  # exercises the auto two-stage (split=128) synthesis transform
spec = MultichannelSpec(num_channels=M, taps_per_phase=8, fold="bank")
sps = spec.chan_sps
sens = 2.0 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
wordsA = rng.integers(0, 2, 36).astype(np.uint8)
burst_syms = frames_ref.recc_burst_symbols(0, [wordsA])
lead_syms = np.tile([1, -1], 40)
sym1 = np.concatenate([lead_syms, burst_syms,
                       np.tile([1, -1], 200)]).astype(np.float32)
bb_bits = None  # build baseband directly from ±1 symbols
ph = np.repeat(sym1, sps) * sens
iqc = np.stack([np.cos(np.cumsum(ph)), np.sin(np.cumsum(ph))], -1)
bb = np.zeros((M, len(iqc), 2), np.float32)
active = [3, 200, M - 5]
for c in active:
    bb[c] = iqc
Y = jnp.swapaxes(jnp.asarray(bb), 0, 1)               # (n, M, 2)
x, _ = chz.synthesize(Y, spec.chz_spec, chz.synthesizer_init(spec.chz_spec))
nP = (x.shape[0] // (M // 2)) * (M // 2)
res = rx_multichannel_block(x[:nP], spec, max_bursts=1, threshold=0.55)
v = np.asarray(res["valid"])[:, 0]
# gate by band power exactly like runtime/streamer.BurstReport.rssi:
# idle channels FM-capture a neighbor's leakage and decode cleanly but
# at 20+ dB lower power
pw = np.asarray(res["chan_power"])
gate = pw > 0.1 * pw.max()
det = sorted(np.nonzero(v & gate)[0].tolist())
print("bank loopback detected channels (power-gated):", det,
      "expected:", sorted(active))
ok &= det == sorted(active)
for c in active:
    w = np.asarray(res["words"])[c, 0, 0]
    wk = bool(np.asarray(res["word_ok"])[c, 0, 0])
    good = wk and bool((w == wordsA).all())
    ok &= good
print("bank loopback words decoded bit-exact on all active channels:", ok)

print("VERIFY:", "PASS" if ok else "FAIL")
sys.exit(0 if ok else 1)
