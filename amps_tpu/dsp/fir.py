"""FIR filtering as XLA convolutions (real-only data path).

These are the building blocks of the reference's stock-GR DSP chains
(pfb_interpolator_ccf at grc/ampsbs.grc:2155, freq_xlating_fir_filter_ccc
at :1815).  IQ signals use the riq float32 (..., n, 2) representation
(amps_tpu.dsp.iq) — complex dtypes never touch the device.

Streaming versions take an explicit history tail (ntaps-1 samples) so
blocks chain exactly; the same tail becomes the ICI halo in the sharded
pipeline (amps_tpu.parallel.halo).

Alignment convention: causal, matching GR stream semantics:
y[n] = sum_k h[k] x[n-k], with x[<0] from the history (zeros cold-start).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax

from amps_tpu.dsp import iq as riq


def _conv1d(x, h, stride: int = 1, lhs_dilation: int = 1):
    """Causal valid conv of real channels: x (..., n) real, h (k,) real."""
    xr = jnp.asarray(x, jnp.float32)
    batch = xr.shape[:-1]
    n = xr.shape[-1]
    flat = xr.reshape((-1, 1, n))
    hh = jnp.asarray(h, jnp.float32)[None, None, ::-1]  # flip -> convolution
    # Right-pad by lhs_dilation-1 so the last input sample's full set of
    # interpolation phases is produced (dilation itself adds no trailing
    # zeros); causal outputs are unaffected.
    out = lax.conv_general_dilated(
        flat, hh,
        window_strides=(stride,),
        padding=[(0, lhs_dilation - 1)],
        lhs_dilation=(lhs_dilation,),
        dimension_numbers=("NCH", "IOH", "NCH"),
    )
    return out.reshape(batch + (out.shape[-1],))


def fir_filter(x, taps, decim: int = 1, history=None):
    """Streaming real FIR: returns (y, new_history).

    x: (..., n); taps (k,).  history: (..., k-1) previous tail or None
    (zeros).  len(y) == n // decim (n must be a multiple of decim).
    """
    x = jnp.asarray(x)
    k = len(taps)
    if history is None:
        pad = jnp.zeros(x.shape[:-1] + (k - 1,), x.dtype)
    else:
        pad = jnp.asarray(history)
    ext = jnp.concatenate([pad, x], axis=-1)
    y = _conv1d(ext, taps, stride=decim)
    new_hist = ext[..., -(k - 1):] if k > 1 else ext[..., :0]
    return y, new_hist


def fir_filter_iq(x, taps, decim: int = 1, history=None):
    """Streaming FIR on riq (..., n, 2) signals with real taps."""
    x = jnp.asarray(x)
    xt = jnp.moveaxis(x, -1, -2)  # (..., 2, n)
    ht = None if history is None else jnp.moveaxis(jnp.asarray(history), -1, -2)
    y, h = fir_filter(xt, taps, decim, ht)
    return jnp.moveaxis(y, -2, -1), jnp.moveaxis(h, -2, -1)


def freq_xlating_fir(x, taps, center_freq: float, fs: float, decim: int,
                     history=None, phase_idx0=0):
    """GR freq_xlating_fir_filter_ccc on riq input: mix x down by
    center_freq (multiply by exp(-j 2π f n / fs)), LPF with real taps,
    decimate.

    Numerically identical to GR's rotated-taps + output-rotator form.
    phase_idx0: absolute sample index of x[0] for streaming mixer phase
    continuity.  Returns (y, new_history, next_phase_idx).  History is
    stored post-mix, (..., k-1, 2).
    """
    x = jnp.asarray(x)
    n = x.shape[-2]
    idx = (jnp.arange(n) + phase_idx0).astype(jnp.float32)
    w = jnp.float32(-2.0 * np.pi * center_freq / fs)
    lo = riq.expj(w * idx)
    mixed = riq.mul(x, lo)
    y, hist = fir_filter_iq(mixed, taps, decim=decim, history=history)
    return y, hist, phase_idx0 + n


def polyphase_interpolate(x, taps, interp: int, history=None):
    """Polyphase interpolator (gr pfb_interpolator_ccf) on real (..., n)
    signals: zero-stuff by ``interp`` and filter (single dilated conv).
    Returns (y, new_history) with len(y) == n*interp."""
    x = jnp.asarray(x)
    k = len(taps)
    hlen = -(-(k - 1) // interp)  # history in *input* samples
    if history is None:
        pad = jnp.zeros(x.shape[:-1] + (hlen,), x.dtype)
    else:
        pad = jnp.asarray(history)
    ext = jnp.concatenate([pad, x], axis=-1)
    y = _conv1d(ext, taps, stride=1, lhs_dilation=interp)
    extra = hlen * interp - (k - 1)
    y = y[..., extra: extra + x.shape[-1] * interp]
    new_hist = ext[..., -hlen:] if hlen > 0 else ext[..., :0]
    return y, new_hist


def polyphase_interpolate_iq(x, taps, interp: int, history=None):
    """Polyphase interpolation of riq (..., n, 2) signals."""
    x = jnp.asarray(x)
    xt = jnp.moveaxis(x, -1, -2)
    ht = None if history is None else jnp.moveaxis(jnp.asarray(history), -1, -2)
    y, h = polyphase_interpolate(xt, taps, interp, ht)
    return jnp.moveaxis(y, -2, -1), jnp.moveaxis(h, -2, -1)
