"""Oracle FOCC/FVC/RECC word builders & parsers + MIN codec (NumPy).

Semantics follow lib/amps_packet.{h,cc} and the overhead-word builders in
lib/focc_impl.cc:252-381.  All words are 28-bit (1 byte/bit, MSB-first)
uint8 arrays, matching the reference's in-memory representation.
"""

from __future__ import annotations

import numpy as np


def expandbits(nbits: int, val: int) -> np.ndarray:
    """MSB-first expansion of ``val`` into ``nbits`` bytes (lib/utils.cc:101)."""
    out = np.zeros(nbits, dtype=np.uint8)
    for i in range(nbits - 1, -1, -1):
        out[i] = val & 1
        val >>= 1
    return out


def getbits(buf: np.ndarray, start: int, nbits: int) -> int:
    """MSB-first extraction (lib/amps_packet.h:118-143 get8/get32/get64)."""
    val = 0
    for i in range(nbits):
        val = (val << 1) | int(buf[start + i] & 1)
    return val


def bits_from_string(s: str) -> np.ndarray:
    """'1 0 1'-style string to bit array (lib/utils.cc:62 string_to_cvec)."""
    return np.array([int(c) for c in s if c in "01"], dtype=np.uint8)


# ---------------------------------------------------------------------------
# FOCC / FVC mobile-station control words (lib/amps_packet.cc)
# ---------------------------------------------------------------------------

def focc_word1(multiword: bool, dcc: int, min1: int) -> np.ndarray:
    """Word 1 (Abbreviated Address Word), lib/amps_packet.cc:26."""
    w = np.zeros(28, dtype=np.uint8)
    w[0] = 0
    w[1] = 1 if multiword else 0
    w[2] = (dcc >> 1) & 1
    w[3] = dcc & 1
    w[4:28] = expandbits(24, min1)
    return w


def focc_word2_general(min2: int, msg_type: int, ordq: int, order: int) -> np.ndarray:
    """Word 2, SCC=11 order variant, lib/amps_packet.cc:38."""
    w = np.zeros(28, dtype=np.uint8)
    w[0:4] = (1, 0, 1, 1)
    w[4:14] = expandbits(10, min2)
    w[14] = 0
    w[15:20] = expandbits(5, msg_type)
    w[20:23] = expandbits(3, ordq)
    w[23:28] = expandbits(5, order)
    return w


def focc_word2_voice_channel(scc: int, min2: int, vmac: int, chan: int) -> np.ndarray:
    """Word 2, VMAC/CHAN voice-designation variant, lib/amps_packet.cc:82."""
    w = np.zeros(28, dtype=np.uint8)
    w[0] = 1
    w[1] = 0
    w[2] = (scc >> 1) & 1
    w[3] = scc & 1
    w[4:14] = expandbits(10, min2)
    w[14] = (vmac >> 2) & 1
    w[15] = (vmac >> 1) & 1
    w[16] = vmac & 1
    w[17:28] = expandbits(11, chan)
    return w


def fvc_word1_general(pscc: int, msg_type: int, ordq: int, order: int) -> np.ndarray:
    """FVC Word 1 (order variant), lib/amps_packet.cc:55."""
    w = np.zeros(28, dtype=np.uint8)
    w[0:4] = (1, 0, 1, 1)
    w[4] = (pscc >> 1) & 1
    w[5] = pscc & 1
    # w[6] EF = 0; w[7:15] RSVD = 0
    w[15:20] = expandbits(5, msg_type)
    w[20:23] = expandbits(3, ordq)
    w[23:28] = expandbits(5, order)
    return w


# ---------------------------------------------------------------------------
# FOCC overhead words (lib/focc_impl.cc:252-381)
# ---------------------------------------------------------------------------

def overhead_word_1(dcc: int, sid: int, ep: bool, auth: bool, pci: bool,
                    nawc: int) -> np.ndarray:
    w = np.zeros(28, dtype=np.uint8)
    w[0] = 1
    w[1] = 1
    w[2] = (dcc >> 1) & 1
    w[3] = dcc & 1
    w[4:18] = expandbits(14, sid >> 1)
    w[18] = int(ep)
    w[19] = int(auth)
    w[20] = int(pci)
    w[21:25] = expandbits(4, nawc)
    w[25:28] = (1, 1, 0)  # OHD = 110 (System Parameter Overhead word 1)
    return w


def overhead_word_2(dcc: int, s: bool, e: bool, regh: bool, regr: bool,
                    dtx: int, nminusone: int, rcf: bool, cpa: bool,
                    cmax: int, end: bool) -> np.ndarray:
    w = np.zeros(28, dtype=np.uint8)
    w[0] = 1
    w[1] = 1
    w[2] = (dcc >> 1) & 1
    w[3] = dcc & 1
    w[4] = int(s)
    w[5] = int(e)
    w[6] = int(regh)
    w[7] = int(regr)
    w[8] = (dtx >> 1) & 1
    w[9] = dtx & 1
    w[10:15] = expandbits(5, nminusone)
    w[15] = int(rcf)
    w[16] = int(cpa)
    w[17:24] = expandbits(7, cmax)
    w[24] = int(end)
    w[25:28] = (1, 1, 1)  # OHD = 111 (System Parameter Overhead word 2)
    return w


def control_filler_word() -> np.ndarray:
    """lib/focc_impl.cc:293."""
    return bits_from_string("1 1 0 0 0 1 0 1 1 1 0 0 0 0 0 1 1 0 0 1 1 1 1 1 1 0 0 1")


def access_type_parameters_global_action(dcc: int, end: bool = False) -> np.ndarray:
    """lib/focc_impl.cc:296 — ACT=1001 global action word."""
    w = np.zeros(28, dtype=np.uint8)
    w[0] = 1
    w[1] = 1
    w[2] = (dcc >> 1) & 1
    w[3] = dcc & 1
    w[4:8] = (1, 0, 0, 1)  # ACT = 1001
    # BIS, PCI HOME, PCI ROAM, BSPC, BSCAP, RSVD all zero
    w[24] = int(end)
    w[25:28] = (1, 0, 0)  # OHD = 100
    return w


def registration_increment_global_action(dcc: int, regincr: int,
                                         end: bool = False) -> np.ndarray:
    """lib/focc_impl.cc:336 — ACT=0010 REGINCR word."""
    w = np.zeros(28, dtype=np.uint8)
    w[0] = 1
    w[1] = 1
    w[2] = (dcc >> 1) & 1
    w[3] = dcc & 1
    w[4:8] = (0, 0, 1, 0)  # ACT = 0010
    w[8:20] = expandbits(12, regincr)
    w[24] = int(end)
    w[25:28] = (1, 0, 0)  # OHD = 100
    return w


def registration_id(dcc: int, regid: int, end: bool = False) -> np.ndarray:
    """lib/focc_impl.cc:365 — 3.7.1.2.3 Registration ID word."""
    w = np.zeros(28, dtype=np.uint8)
    w[0] = 1
    w[1] = 1
    w[2] = (dcc >> 1) & 1
    w[3] = dcc & 1
    w[4:24] = expandbits(20, regid)
    w[24] = int(end)
    w[25:28] = (0, 0, 0)  # OHD = 000
    return w


# ---------------------------------------------------------------------------
# RECC word parsers (lib/amps_packet.h:103-274)
# ---------------------------------------------------------------------------

def parse_recc_common(bits: np.ndarray) -> dict:
    return {
        "F": bool(bits[0] & 1),
        "NAWC": getbits(bits, 1, 3),
    }


def parse_recc_word_a(bits: np.ndarray) -> dict:
    d = parse_recc_common(bits)
    d.update(
        T=bool(bits[4] & 1),
        S=bool(bits[5] & 1),
        E=bool(bits[6] & 1),
        ER=bool(bits[7] & 1),
        SCM=getbits(bits, 8, 4),
        MIN1=getbits(bits, 12, 24),
    )
    return d


def parse_recc_word_b(bits: np.ndarray) -> dict:
    d = parse_recc_common(bits)
    d.update(
        MSG_TYPE=getbits(bits, 4, 5),
        ORDQ=getbits(bits, 9, 3),
        ORDER=getbits(bits, 12, 5),
        LT=bool(bits[17] & 1),
        EP=bool(bits[18] & 1),
        SCM4=int(bits[19] & 1),
        MPCI=getbits(bits, 20, 2),
        SDCC1=getbits(bits, 22, 2),
        SDCC2=getbits(bits, 24, 2),
        MIN2=getbits(bits, 26, 10),
    )
    return d


def parse_recc_word_c_serial(bits: np.ndarray) -> dict:
    d = parse_recc_common(bits)
    d.update(SERIAL=getbits(bits, 4, 32))
    return d


_DIGIT_TABLE = {1: "1", 2: "2", 3: "3", 4: "4", 5: "5", 6: "6", 7: "7",
                8: "8", 9: "9", 10: "0", 11: "*", 12: "#"}


def parse_recc_word_called(bits: np.ndarray) -> dict:
    d = parse_recc_common(bits)
    d.update(DIGITS=getbits(bits, 4, 32))
    return d


def called_digits(digits_val: int) -> str:
    """Table 2.7.1-2 decode; 0 ends, 13-15 truncate (lib/amps_packet.h:211)."""
    out = []
    v = digits_val
    for _ in range(8):
        nib = (v >> 28) & 0xF
        if nib == 0 or nib >= 13:
            break
        out.append(_DIGIT_TABLE[nib])
        v = (v << 4) & 0xFFFFFFFF
    return "".join(out)


def encode_called_digits(s: str) -> int:
    """Inverse of ``called_digits`` (mobile-side; used to synthesize test
    originations)."""
    inv = {c: v for v, c in _DIGIT_TABLE.items()}
    v = 0
    assert len(s) <= 8
    for i, c in enumerate(s):
        v |= inv[c] << (28 - 4 * i)
    return v


# ---------------------------------------------------------------------------
# MIN codec (lib/amps_packet.h:277-363) — 553 §2.3.1.1
# ---------------------------------------------------------------------------

def compute_min_3(d1c: str, d2c: str, d3c: str) -> int:
    d1 = ord(d1c) - 0x30 or 10
    d2 = ord(d2c) - 0x30 or 10
    d3 = ord(d3c) - 0x30 or 10
    return 100 * d1 + 10 * d2 + d3 - 111


def extract_min_3(val: int) -> str:
    m2 = val + 111
    dig = m2 % 10
    digs = chr(0x30 + dig)
    if dig == 0:
        m2 -= 10
    else:
        m2 -= dig
    dig = (m2 % 100) // 10
    digs = chr(0x30 + dig) + digs
    if dig == 0:
        m2 -= 100
    else:
        m2 -= m2 % 100
    dig = m2 // 100
    if dig > 9:
        dig = 0
    return chr(0x30 + dig) + digs


def parse_min(min_str: str):
    """10-digit MIN string -> (min1, min2); None on invalid input
    (lib/amps_packet.h:328)."""
    if not (1 <= len(min_str) <= 10) or not min_str.isdigit():
        return None
    min2 = compute_min_3(min_str[0], min_str[1], min_str[2])
    om1 = (compute_min_3(min_str[3], min_str[4], min_str[5]) & 0x3FF) << 14
    thous = ord(min_str[6]) - 0x30 or 10
    om1 |= (thous & 0xF) << 10
    om1 |= compute_min_3(min_str[7], min_str[8], min_str[9]) & 0x3FF
    return om1, min2


def calc_min(min1: int, min2: int) -> str:
    """(MIN1, MIN2) -> 10-digit MIN string (lib/amps_packet.h:354)."""
    npa = extract_min_3(min2)
    exchange = extract_min_3((min1 >> 14) & 0x3FF)
    last_three = extract_min_3(min1 & 0x3FF)
    thous = (min1 >> 10) & 0xF
    if thous > 9:
        thous = 0
    return npa + exchange + chr(0x30 + thous) + last_three
