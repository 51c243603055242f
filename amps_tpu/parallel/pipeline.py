"""The multichannel base-station pipeline, single-device and sharded.

Data flow ("the model", cf. SURVEY.md §3.4/§3.5 but over M channels at
once instead of three hand-placed mixers):

  TX: per-channel FOCC word pairs (C, F, 2, 28)
      -> superframe symbols (C, n_sym)          [tx.focc, batched]
      -> FSK baseband at 60 ksps (C, n, 2)      [chan_sps = 3]
      -> synthesis channelizer -> wideband (n*M/2... , 2) at M x 30 kHz

  RX: wideband (N, 2)
      -> analysis channelizer -> (Nh, M, 2) per-channel baseband @60k
      -> quadrature demod (C, Nh)
      -> trigger correlation + burst capture    [rx.correlator, sps=3]
      -> batched BCH word decode                [rx.decoder]

Sharded version: shard_map over a ('time', 'chan') mesh.  The wideband
stream is sharded along time with an L-P sample halo (ppermute); the
per-channel stage shards channels across 'chan' ranks and exchanges a
demod-sample halo along 'time' so bursts spanning shard boundaries are
caught (the overlap discipline of lib/recc_impl.cc:104-107 d_windowsz,
reborn as ICI collectives).
"""

from __future__ import annotations

import dataclasses
import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from amps_tpu.config import PipelineConfig
from amps_tpu.dsp import channelizer as chz
from amps_tpu.dsp.fm import fsk_manchester_baseband, quadrature_demod_planar
from amps_tpu.parallel.halo import halo_exchange_left, add_tail_to_right
from amps_tpu.rx import correlator, decoder
from amps_tpu.tx.focc import focc_frame_bits


@dataclasses.dataclass(frozen=True)
class MultichannelSpec:
    num_channels: int = 64        # C = channels actually carrying FOCC
    taps_per_phase: int = 8
    pipe: PipelineConfig = dataclasses.field(default_factory=PipelineConfig)
    # channel-transform tuning (dsp/channelizer.py): bf16 matmuls with
    # f32 accumulation; two-stage split (-1 auto / 0 dense / M2); fold
    # strategy ("conv" grouped-conv or "shift" unrolled VPU)
    transform_bf16: bool = False
    transform_split: int = -1
    fold: str = "conv"
    # io_bf16: carry the analyzer output planes and the demod stream in
    # bfloat16 (all arithmetic stays f32-accumulated).  This chip is
    # bandwidth-bound (~73 GB/s measured) and f32/bf16 matmul rates are
    # identical, so halving data-plane bytes is pure win; decode parity
    # is covered by tests/test_bf16.py.
    io_bf16: bool = False
    # corr_bf16: also write the trigger-correlation matmul outputs and
    # the derived quality plane (the find stage's dominant HBM traffic)
    # in bfloat16; quality only feeds a threshold compare + argmax.
    corr_bf16: bool = False

    @property
    def chz_spec(self) -> chz.ChannelizerSpec:
        return chz.ChannelizerSpec(self.num_channels, self.taps_per_phase,
                                   self.pipe.channel_spacing_hz)

    @property
    def chan_sps(self) -> int:
        return self.pipe.chan_sps  # 3 samples/Manchester symbol @ 60k


# ---------------------------------------------------------------------------
# single-device pipeline pieces (shared by the sharded version)
# ---------------------------------------------------------------------------

def tx_multichannel_block(word_pairs, spec: MultichannelSpec):
    """(C, F, 2, 28) word pairs -> wideband riq ((F*463*2*sps)*M/2 .. , 2).

    Every channel transmits its own FOCC superframe (the ">=1000 channels"
    configuration of BASELINE.json is C FOCCs in parallel).
    """
    sps = spec.chan_sps
    bits = focc_frame_bits(word_pairs)                   # (C, nb)
    sens = 2.0 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
    bb, _ = fsk_manchester_baseband(bits, sps, sens)     # (C, n, 2)
    Y = jnp.swapaxes(bb, 0, 1)                           # (n, C, 2)
    x, _ = chz.synthesize(Y, spec.chz_spec,
                          chz.synthesizer_init(spec.chz_spec))
    return x


@functools.partial(jax.jit,
                   static_argnames=("spec", "max_bursts", "use_pallas",
                                    "policy"))
def rx_multichannel_block(x, spec: MultichannelSpec, max_bursts: int = 2,
                          threshold: float = 0.55,
                          use_pallas: bool = False,
                          policy: str = "first_ok"):
    """Wideband (N, 2) — or planar (2, N) planes — -> per-channel
    decoded RECC bursts.  Planar input (fold="bank" only) skips the
    on-device interleaved->planar transpose; SDR adapters can deliver
    planar planes directly (runtime/sdr.py).

    Returns dict with starts/valid/quality (C, K) and decoded words
    (C, K, 7, 36) + ok (C, K, 7).  Uses the fused Pallas analysis
    kernel when the geometry allows (M % 128 == 0, Nh % 256 == 0) and a
    TPU is present; the XLA path otherwise (identical numerics).
    """
    M = spec.num_channels
    T = spec.taps_per_phase
    P = M // 2
    planar_in = x.ndim == 2 and x.shape[0] == 2 and x.shape[1] != 2
    Nh = x.shape[-1 if planar_in else 0] // P
    # Fused analyze+demod kernel (pallas/rx_front_kernel.py): one VMEM
    # pass from wideband IQ to the bf16 demod plane — the XLA path's
    # (2, M, Nh) analysis planes never touch HBM.  tile_h=128 (the
    # (M, tile_h) output block needs a 128-divisible lane dim); VMEM
    # fits at M=1024 because the 4 (M, M) matrices are bf16 (8 MB).
    pallas_ok = (use_pallas and not planar_in and M % 256 == 0
                 and M <= 1024 and Nh % 128 == 0)
    if pallas_ok:
        from amps_tpu import pallas as plk
        pallas_ok = plk.enabled()
    if pallas_ok:
        from amps_tpu.pallas.rx_front_kernel import analyze_demod_pallas
        x_ext = jnp.concatenate(
            [jnp.zeros((M * T - P, 2), jnp.float32),
             jnp.asarray(x, jnp.float32)], axis=0)
        demod, chan_power = analyze_demod_pallas(x_ext, M, T, tile_h=128)
        if not spec.io_bf16:
            demod = demod.astype(jnp.float32)
    else:
        ypl, _ = chz.analyze(x, spec.chz_spec,
                             chz.analyzer_init(spec.chz_spec,
                                               planar_in=planar_in),
                             chmajor=True, bf16=spec.transform_bf16,
                             split=spec.transform_split,
                             fold=spec.fold, planar=True,
                             planar_in=planar_in)  # (2, C, Nh)
        if spec.io_bf16:
            ypl = ypl.astype(jnp.bfloat16)
        yr, yi = ypl[0], ypl[1]
        # chan_power rides the demod pass (same conjugate-product read):
        # per-channel mean band power rejects FM "capture" ghosts — an
        # idle channel demodulating a strong neighbor's (or numerical)
        # leakage decodes cleanly (FM is amplitude-invariant) but at
        # 20+ dB lower power; see runtime/streamer.BurstReport.rssi
        demod, _, chan_power = quadrature_demod_planar(
            yr, yi, return_power=True)                   # (C, Nh), (C,)
        if spec.io_bf16:
            demod = demod.astype(jnp.bfloat16)
    sps = spec.chan_sps
    # ONE integrate-and-dump pass feeds both symbol-domain trigger
    # detection and burst capture.  No zero pad: the one-hot extractor
    # zero-fills past the stream tail (a capture cut off by the block
    # edge decodes to word_ok=False, same as with an explicit pad)
    phases = correlator.symbol_phase_streams(demod, sps)
    starts, valid, quality = correlator.find_bursts_phases(
        phases, sps, max_bursts, threshold, out_bf16=spec.corr_bf16)
    hard, soft = correlator.extract_from_phases(
        phases, starts, sps,
        hard_dtype=jnp.bfloat16 if spec.io_bf16 else jnp.uint8)
    dec = decoder.decode_bursts(hard, policy)            # batched (C, K, ...)
    return {
        "starts": starts, "valid": valid, "quality": quality,
        "words": dec.words, "word_ok": dec.word_ok,
        "dcc_bits": dec.dcc_bits, "bad_symbols": dec.bad_symbols,
        "chan_power": chan_power,
    }


# ---------------------------------------------------------------------------
# sharded pipeline (shard_map over ('time', 'chan'))
# ---------------------------------------------------------------------------

def make_sharded_bs_step(mesh: Mesh, spec: MultichannelSpec,
                         demod_halo: int = 0, max_bursts: int = 2,
                         threshold: float = 0.55):
    """Build the jitted sharded full step: TX words -> wideband -> decode.

    word_pairs: (C, F, 2, 28) sharded over channels.
    Returns a function (word_pairs) -> results dict; the wideband signal
    is produced and consumed inside one jit so XLA overlaps the
    collectives with compute.

    demod_halo: demod samples of left-neighbor halo for the correlation
    stage (>= trigger+capture samples for burst-spanning correctness;
    smaller values are allowed for dry runs on tiny shapes).
    """
    M = spec.num_channels
    T = spec.taps_per_phase
    L, Phop = M * T, M // 2
    sps = spec.chan_sps
    tsize = mesh.shape["time"]
    csize = mesh.shape["chan"]
    assert M % csize == 0
    c_loc = M // csize
    h = jnp.asarray(chz.prototype_taps(M, T))
    sens = 2.0 * np.pi * spec.pipe.deviation_hz / spec.pipe.chan_rate
    split = (chz.default_split(M) if spec.transform_split < 0
             else spec.transform_split)

    def step(word_pairs):
        # The wideband stages (synthesis, analysis) mix ALL channels, so
        # their natural parallel axis is time.  Both mesh axes therefore
        # act as ONE flattened time ring of tsize*csize workers for the
        # wideband stages (worker w = tidx*csize + cidx handles the w-th
        # sub-block; halos/overlap-add ride the flattened ring), and an
        # all_to_all inside each time row reshards hops->channels for
        # the per-channel stages.  No rank duplicates wideband work.
        def tx_local(wp):
            # wp: (c_loc, F, 2, 28) on this chan rank, replicated over
            # time: framing + FSK modulation is genuinely chan-sharded
            bits = focc_frame_bits(wp)                   # (c_loc, nb)
            bb, _ = fsk_manchester_baseband(bits, sps, sens)  # (c_loc, n, 2)
            # gather all channels (the synthesis transform needs all M)
            bb_all = lax.all_gather(bb, "chan", axis=0, tiled=True)  # (M, n, 2)
            Y = jnp.swapaxes(bb_all, 0, 1)               # (n, M, 2)
            n = Y.shape[0]
            # pad the hop stream up to the worker ring (trailing hops
            # synthesize silence; harmless to the per-channel stages)
            W = tsize * csize
            npad = -(-n // W) * W
            if npad != n:
                Y = jnp.concatenate(
                    [Y, jnp.zeros((npad - n, M, 2), jnp.float32)], axis=0)
            n_sub = npad // W
            w = lax.axis_index("time") * csize + lax.axis_index("chan")
            Yl = lax.dynamic_slice_in_dim(Y, w * n_sub, n_sub, axis=0)
            xl, tail = chz._synthesize_block(
                Yl, h, M, T, (w * n_sub) % 2,
                jnp.zeros((L - Phop, 2), jnp.float32),
                spec.transform_bf16, split)
            # overlap-add: my tail belongs at the head of the next
            # worker's sub-block (flattened ring crosses row boundaries)
            xl = add_tail_to_right(xl, tail, ("time", "chan"), 0)
            return xl                                     # (n_sub*P, 2)

        def rx_local(xl):
            # xl: (N_sub, 2) this worker's wideband sub-block
            x_ext = halo_exchange_left(xl, L - Phop, ("time", "chan"), 0)
            n_sub = xl.shape[0] // Phop
            w = lax.axis_index("time") * csize + lax.axis_index("chan")
            ypl = chz._analyze_block_chmajor(
                x_ext, h, M, T, (w * n_sub) % 2, spec.transform_bf16,
                split, spec.fold, planar=True)           # (2, M, Nh_sub)
            # reshard channels<->hops within each time row: rank c keeps
            # channels [c*c_loc, (c+1)*c_loc) over the row's full span
            # (sub-blocks concatenate in source-rank = time order)
            ymine = lax.all_to_all(ypl, "chan", split_axis=1,
                                   concat_axis=2, tiled=True)
            # demod continuity + correlation overlap via time halo
            halo_n = demod_halo + 1
            yext = halo_exchange_left(ymine, halo_n, "time", 2)
            demod, _ = quadrature_demod_planar(yext[0], yext[1])
            demod = demod[:, 1:]                         # drop seed sample
            phases = correlator.symbol_phase_streams(demod, sps)
            starts, valid, quality = correlator.find_bursts_phases(
                phases, sps, max_bursts, threshold)
            hard, _ = correlator.extract_from_phases(
                phases, starts, sps,
                hard_dtype=jnp.bfloat16 if spec.io_bf16 else jnp.uint8)
            dec = decoder.decode_bursts(hard)
            # add a leading local time axis so out_specs assemble to
            # (tsize, C, K, ...) global shapes
            return (starts[None], valid[None], quality[None],
                    dec.words[None], dec.word_ok[None])

        def full(wp):
            xl = tx_local(wp)
            return rx_local(xl)

        return full(word_pairs)

    sharded = shard_map(
        step, mesh=mesh,
        in_specs=(P("chan", None, None, None),),
        out_specs=(P("time", "chan", None),
                   P("time", "chan", None),
                   P("time", "chan", None),
                   P("time", "chan", None, None, None),
                   P("time", "chan", None, None)),
    )
    return jax.jit(sharded)
