"""FOCC/FVC word builders and RECC word parsers as batched JAX ops.

Every builder accepts scalars or arbitrarily-batched integer arrays and
returns (..., 28) uint8 bit arrays; parsers take (..., 36) bit arrays and
return dicts of (...,) int32 fields.  Layouts are bit-exact with
lib/amps_packet.cc and lib/focc_impl.cc:252-381 (golden-tested against
amps_tpu.ref.words_ref).

The host control plane (amps_tpu.control) uses these with scalar args; the
data plane uses them batched, e.g. building page words for a whole queue of
MINs in one op.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from amps_tpu.codec.bits import expandbits, packbits


def _bcast(*parts):
    """Broadcast leading dims of (..., k_i) parts and concat on last axis."""
    shapes = [p.shape[:-1] for p in parts]
    batch = np.broadcast_shapes(*shapes)
    parts = [jnp.broadcast_to(p, batch + p.shape[-1:]) for p in parts]
    return jnp.concatenate(parts, axis=-1)


def _bits(val, nbits):
    return expandbits(jnp.asarray(val, dtype=jnp.uint32), nbits)


def _const(*bits_):
    return jnp.array(bits_, dtype=jnp.uint8)


def focc_word1(multiword, dcc, min1):
    """Word 1 (Abbreviated Address Word), lib/amps_packet.cc:26."""
    mw = jnp.asarray(multiword).astype(jnp.uint32)
    return _bcast(
        jnp.zeros(mw.shape + (1,), jnp.uint8),
        _bits(mw, 1),
        _bits(dcc, 2),
        _bits(min1, 24),
    )


def focc_word2_general(min2, msg_type, ordq, order):
    """Word 2 (SCC=11 order variant), lib/amps_packet.cc:38."""
    return _bcast(
        _const(1, 0, 1, 1),
        _bits(min2, 10),
        _const(0),
        _bits(msg_type, 5),
        _bits(ordq, 3),
        _bits(order, 5),
    )


def focc_word2_voice_channel(scc, min2, vmac, chan):
    """Word 2 (VMAC/CHAN voice designation), lib/amps_packet.cc:82."""
    return _bcast(
        _const(1, 0),
        _bits(scc, 2),
        _bits(min2, 10),
        _bits(vmac, 3),
        _bits(chan, 11),
    )


def fvc_word1_voice_channel(scc, pscc, vmac, chan):
    """FVC Word 1, VMAC/CHAN handoff designation (extension: the
    reference has no handoff — its calls never move or end).

    EXPERIMENTAL LAYOUT — not verified against TIA-553 §3.7.2 text
    (unavailable in this environment) and excluded from parity claims
    (docs/PARITY.md).  Our MS simulator decodes it, but that is
    circular validation: interoperability with real 553 mobiles is NOT
    established.  Mirrors the reference's two established conventions: SCC==11 marks
    the order variant (fvc_word1_general's constant header,
    lib/amps_packet.cc:55), so SCC!=11 here carries a channel
    designation with the new channel's SAT color code; the VMAC/CHAN
    tail follows focc_word2_voice_channel (lib/amps_packet.cc:82) with
    the MIN2 address replaced by PSCC + reserved bits (FVC messages are
    implicitly addressed by the channel that carries them).
    """
    return _bcast(
        _const(1, 0),                       # T1T2
        _bits(scc, 2),                      # new channel's SAT (must != 3)
        _bits(pscc, 2),                     # present SAT color code
        _const(0, 0, 0, 0, 0, 0, 0, 0),     # RSVD
        _bits(vmac, 3),
        _bits(chan, 11),
    )


def fvc_word1_general(pscc, msg_type, ordq, order):
    """FVC Word 1 (order variant), lib/amps_packet.cc:55."""
    return _bcast(
        _const(1, 0, 1, 1),
        _bits(pscc, 2),
        _const(0, 0, 0, 0, 0, 0, 0, 0, 0),  # EF + RSVD
        _bits(msg_type, 5),
        _bits(ordq, 3),
        _bits(order, 5),
    )


# -- FOCC overhead words (lib/focc_impl.cc:252-381) -------------------------

def overhead_word_1(dcc, sid, ep, auth, pci, nawc):
    return _bcast(
        _const(1, 1),
        _bits(dcc, 2),
        _bits(jnp.asarray(sid, jnp.uint32) >> 1, 14),
        _bits(jnp.asarray(ep).astype(jnp.uint32), 1),
        _bits(jnp.asarray(auth).astype(jnp.uint32), 1),
        _bits(jnp.asarray(pci).astype(jnp.uint32), 1),
        _bits(nawc, 4),
        _const(1, 1, 0),  # OHD = 110
    )


def overhead_word_2(dcc, s, e, regh, regr, dtx, nminusone, rcf, cpa, cmax, end):
    flags = [s, e, regh, regr]
    return _bcast(
        _const(1, 1),
        _bits(dcc, 2),
        *[_bits(jnp.asarray(f).astype(jnp.uint32), 1) for f in flags],
        _bits(dtx, 2),
        _bits(nminusone, 5),
        _bits(jnp.asarray(rcf).astype(jnp.uint32), 1),
        _bits(jnp.asarray(cpa).astype(jnp.uint32), 1),
        _bits(cmax, 7),
        _bits(jnp.asarray(end).astype(jnp.uint32), 1),
        _const(1, 1, 1),  # OHD = 111
    )


CONTROL_FILLER = np.array(
    [1, 1, 0, 0, 0, 1, 0, 1, 1, 1, 0, 0, 0, 0,
     0, 1, 1, 0, 0, 1, 1, 1, 1, 1, 1, 0, 0, 1], dtype=np.uint8)


def control_filler_word():
    """lib/focc_impl.cc:293."""
    return jnp.asarray(CONTROL_FILLER)


def access_type_parameters_global_action(dcc, end=False):
    return _bcast(
        _const(1, 1),
        _bits(dcc, 2),
        _const(1, 0, 0, 1),  # ACT = 1001
        _const(*([0] * 16)),  # BIS/PCI/BSPC/BSCAP/RSVD
        _bits(jnp.asarray(end).astype(jnp.uint32), 1),
        _const(1, 0, 0),  # OHD = 100
    )


def registration_increment_global_action(dcc, regincr, end=False):
    return _bcast(
        _const(1, 1),
        _bits(dcc, 2),
        _const(0, 0, 1, 0),  # ACT = 0010
        _bits(regincr, 12),
        _const(0, 0, 0, 0),  # RSVD
        _bits(jnp.asarray(end).astype(jnp.uint32), 1),
        _const(1, 0, 0),  # OHD = 100
    )


def registration_id(dcc, regid, end=False):
    return _bcast(
        _const(1, 1),
        _bits(dcc, 2),
        _bits(regid, 20),
        _bits(jnp.asarray(end).astype(jnp.uint32), 1),
        _const(0, 0, 0),  # OHD = 000
    )


# -- RECC word parsers (lib/amps_packet.h:103-274), vectorized --------------

def parse_recc_word_a(bits36):
    """(..., 36) -> dict of fields (F/NAWC/T/S/E/ER/SCM/MIN1)."""
    b = jnp.asarray(bits36)
    return {
        "F": b[..., 0].astype(jnp.int32),
        "NAWC": packbits(b[..., 1:4], jnp.int32),
        "T": b[..., 4].astype(jnp.int32),
        "S": b[..., 5].astype(jnp.int32),
        "E": b[..., 6].astype(jnp.int32),
        "ER": b[..., 7].astype(jnp.int32),
        "SCM": packbits(b[..., 8:12], jnp.int32),
        "MIN1": packbits(b[..., 12:36], jnp.uint32),
    }


def parse_recc_word_b(bits36):
    b = jnp.asarray(bits36)
    return {
        "F": b[..., 0].astype(jnp.int32),
        "NAWC": packbits(b[..., 1:4], jnp.int32),
        "MSG_TYPE": packbits(b[..., 4:9], jnp.int32),
        "ORDQ": packbits(b[..., 9:12], jnp.int32),
        "ORDER": packbits(b[..., 12:17], jnp.int32),
        "LT": b[..., 17].astype(jnp.int32),
        "EP": b[..., 18].astype(jnp.int32),
        "SCM4": b[..., 19].astype(jnp.int32),
        "MPCI": packbits(b[..., 20:22], jnp.int32),
        "SDCC1": packbits(b[..., 22:24], jnp.int32),
        "SDCC2": packbits(b[..., 24:26], jnp.int32),
        "MIN2": packbits(b[..., 26:36], jnp.int32),
    }


def parse_recc_word_c_serial(bits36):
    b = jnp.asarray(bits36)
    return {
        "F": b[..., 0].astype(jnp.int32),
        "NAWC": packbits(b[..., 1:4], jnp.int32),
        "SERIAL": packbits(b[..., 4:36], jnp.uint32),
    }


def parse_recc_word_called(bits36):
    b = jnp.asarray(bits36)
    return {
        "F": b[..., 0].astype(jnp.int32),
        "NAWC": packbits(b[..., 1:4], jnp.int32),
        "DIGITS": packbits(b[..., 4:36], jnp.uint32),
    }
