"""Pallas kernels vs their XLA reference implementations (interpreter
mode on the CPU test mesh; compiled path exercised by bench on TPU)."""

import numpy as np
import jax.numpy as jnp
import pytest

from amps_tpu.dsp import channelizer as chz
from amps_tpu.pallas.channelizer_kernel import analyze_chmajor_pallas


def test_analyze_kernel_matches_xla():
    M, T = 8, 4
    P = M // 2
    tile_h = 64
    Nh = 256
    n_ext = (Nh + 2 * T - 1) * P
    rng = np.random.default_rng(0)
    x = rng.normal(0, 1, (n_ext, 2)).astype(np.float32)
    h = jnp.asarray(chz.prototype_taps(M, T))
    want = np.asarray(chz._analyze_block_chmajor(x, h, M, T, jnp.int32(0)))
    got = np.asarray(analyze_chmajor_pallas(x, M, T, 0, tile_h,
                                            interpret=True))
    assert got.shape == want.shape == (M, Nh, 2)
    assert np.allclose(got, want, atol=2e-4), np.abs(got - want).max()


def test_analyze_kernel_rejects_odd_parity():
    with pytest.raises(AssertionError):
        analyze_chmajor_pallas(np.zeros((1024, 2), np.float32), 8, 4,
                               hop0_parity=1, tile_h=64, interpret=True)


def test_analyze_kernel_multi_tile_continuity():
    """Tile boundaries must be seamless (the DMA overlap covers them)."""
    M, T = 8, 4
    P = M // 2
    Nh = 512
    n_ext = (Nh + 2 * T - 1) * P
    rng = np.random.default_rng(1)
    x = rng.normal(0, 1, (n_ext, 2)).astype(np.float32)
    a = np.asarray(analyze_chmajor_pallas(x, M, T, 0, 64, interpret=True))
    b = np.asarray(analyze_chmajor_pallas(x, M, T, 0, 256, interpret=True))
    assert np.allclose(a, b, atol=2e-4)


def test_fused_rx_front_kernel_matches_xla():
    """analyze+demod fused kernel == XLA analyze -> quadrature demod
    (prev=None) including band power and tile-boundary carry."""
    from amps_tpu.dsp.fm import quadrature_demod_planar
    from amps_tpu.pallas.rx_front_kernel import analyze_demod_pallas

    M, T = 256, 4
    P = M // 2
    Nh = 256
    n_ext = (Nh + 2 * T - 1) * P
    rng = np.random.default_rng(2)
    x = rng.normal(0, 1, (n_ext, 2)).astype(np.float32)
    h = jnp.asarray(chz.prototype_taps(M, T))
    ypl = chz._analyze_block_chmajor(x, h, M, T, jnp.int32(0), planar=True)
    want_d, _, want_p = quadrature_demod_planar(ypl[0], ypl[1],
                                                return_power=True)
    for tile_h in (64, 128):
        got_d, got_p = analyze_demod_pallas(x, M, T, tile_h=tile_h,
                                            interpret=True)
        assert got_d.shape == (M, Nh) and got_p.shape == (M,)
        dd = np.abs(np.asarray(got_d, np.float32) - np.asarray(want_d))
        # bf16 demod output: tolerance is the bf16 quantization of ±π
        assert dd.max() < 0.03, dd.max()
        assert np.allclose(np.asarray(got_p), np.asarray(want_p),
                           rtol=1e-3), (got_p[:4], want_p[:4])


def test_fused_phases_kernel_matches_xla():
    """v2 fused front end (analysis + demod + integrate-and-dump phase
    streams) == XLA path within bf16 output quantization, including the
    unaligned-Nh zero-padding path and band power."""
    from amps_tpu.dsp.fm import quadrature_demod_planar
    from amps_tpu.pallas.rx_phases_kernel import analyze_phases_pallas
    from amps_tpu.rx.correlator import symbol_phase_streams

    M, T, sps, tile_h = 256, 8, 3, 384
    P = M // 2
    for Nh in (2 * tile_h, 896):          # aligned and padded (896 % 384 != 0)
        rng = np.random.default_rng(Nh)
        x = rng.normal(0, 0.5, (Nh * P, 2)).astype(np.float32)
        x_ext = np.concatenate(
            [np.zeros((M * T - P, 2), np.float32), x], axis=0)

        spec = chz.ChannelizerSpec(M, T)
        ypl, _ = chz.analyze(jnp.asarray(x), spec, chz.analyzer_init(spec),
                             chmajor=True, planar=True)
        demod, _, power_ref = quadrature_demod_planar(ypl[0], ypl[1],
                                                      return_power=True)
        ph_ref = np.asarray(symbol_phase_streams(np.asarray(demod), sps))

        ph, power = analyze_phases_pallas(jnp.asarray(x_ext), M, T, sps,
                                          tile_h, interpret=True)
        ph = np.asarray(ph, np.float32)
        assert ph.shape == ph_ref.shape
        assert np.abs(ph - ph_ref).max() < 0.02  # bf16 quantization
        # padded path: filter memory bleeds ~2T-1 hops of energy into
        # the pad, so power is upper-biased by a few % there (power is
        # the min_rssi ghost gate — ghosts sit 20+ dB below real bursts)
        rel = (np.abs(np.asarray(power) - np.asarray(power_ref))
               / (np.asarray(power_ref) + 1e-9))
        assert rel.max() < 0.05, rel.max()


def test_rx_block_pallas_v2_interpret_matches_xla_decode():
    """rx_multichannel_block(use_pallas=True) routed through the v2
    phases kernel (interpret mode) decodes the same planted burst
    words as the XLA path."""
    import jax
    from unittest import mock
    from amps_tpu.eval.traffic import MobileEvent, synthesize_reverse_band
    from amps_tpu.parallel.pipeline import (MultichannelSpec,
                                            rx_multichannel_block)
    from amps_tpu import pallas as plk
    import amps_tpu.pallas.rx_phases_kernel as phk

    spec = MultichannelSpec(num_channels=256, taps_per_phase=8)
    total_hops = 13824                    # 36 * 384
    events = [MobileEvent("origination", 3, 700, "5551234567",
                          "7025551000", esn=99)]
    x = synthesize_reverse_band(events, spec, total_hops,
                                noise_sigma=0.001)

    ref = jax.device_get(rx_multichannel_block(
        jnp.asarray(x), spec, max_bursts=1, threshold=0.55))

    orig = phk.analyze_phases_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(plk, "enabled", lambda: True), \
         mock.patch.object(phk, "analyze_phases_pallas", interp):
        got = jax.device_get(rx_multichannel_block(
            jnp.asarray(x), spec, max_bursts=1, threshold=0.55,
            use_pallas=True))

    assert ref["valid"][3][0] and got["valid"][3][0]
    assert np.array_equal(got["words"][3][0], ref["words"][3][0])
    assert np.array_equal(got["word_ok"][3][0], ref["word_ok"][3][0])
    want = np.stack(events[0].words())
    assert np.array_equal(np.asarray(got["words"][3][0])[: len(want)], want)


def test_rx_block_pallas_v2pad_interpret_matches_xla_decode():
    """use_pallas="v2pad": a NON-tile-aligned block (the bench shape
    family) routes through the v2 phases kernel with zero-padding to
    the next 384-hop tile; decode must match the XLA path bit-exactly.
    (The padded variant used to be gated off by the 16 MB scoped-VMEM
    Mosaic OOM; the odd-bank sign identity shed 4 MB — this pins the
    numerics of the re-enabled path.)"""
    import jax
    from unittest import mock
    from amps_tpu.eval.traffic import MobileEvent, synthesize_reverse_band
    from amps_tpu.parallel.pipeline import (MultichannelSpec,
                                            rx_multichannel_block)
    from amps_tpu import pallas as plk
    import amps_tpu.pallas.rx_phases_kernel as phk

    spec = MultichannelSpec(num_channels=256, taps_per_phase=8)
    total_hops = 13824 + 128              # NOT a multiple of 384
    assert total_hops % 384 and total_hops % 128 == 0
    events = [MobileEvent("origination", 3, 700, "5551234567",
                          "7025551000", esn=99),
              # near the padded tail: the capture clamp must keep the
              # zero-padding out of the decode
              MobileEvent("page_response", 7, total_hops - 11000,
                          "4155559876")]
    x = synthesize_reverse_band(events, spec, total_hops,
                                noise_sigma=0.001)

    ref = jax.device_get(rx_multichannel_block(
        jnp.asarray(x), spec, max_bursts=1, threshold=0.55))

    orig = phk.analyze_phases_pallas

    def interp(*a, **kw):
        kw["interpret"] = True
        return orig(*a, **kw)

    with mock.patch.object(plk, "enabled", lambda: True), \
         mock.patch.object(phk, "analyze_phases_pallas", interp):
        got = jax.device_get(rx_multichannel_block(
            jnp.asarray(x), spec, max_bursts=1, threshold=0.55,
            use_pallas="v2pad"))

    for ev in events:
        c = ev.channel
        assert ref["valid"][c][0] and got["valid"][c][0]
        assert np.array_equal(got["words"][c][0], ref["words"][c][0])
        assert np.array_equal(got["word_ok"][c][0], ref["word_ok"][c][0])
        want = np.stack(ev.words())
        assert np.array_equal(np.asarray(got["words"][c][0])[: len(want)],
                              want)
