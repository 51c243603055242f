"""Aggressive-registration mode: the 38-frame superframe streams with
REGINCR/REGID words and accepts injections (the reference's
aggressive_registration ctor flag, include/amps/focc.h:41)."""

import numpy as np

from amps_tpu import SystemConfig
from amps_tpu.codec import words as W
from amps_tpu.control.station import BaseStation
from amps_tpu.ref import frames_ref
from amps_tpu.tx.focc import FoccStream, STREAM_BOTH, focc_frames_symbols


def test_registration_superframe_streams_and_injects():
    sc = SystemConfig(aggressive_registration=True)
    st = FoccStream(sc, sps=1)
    assert st.frames_per_superframe == 38
    pairs = st.next_word_pairs()
    assert np.array_equal(pairs, frames_ref.registration_superframe_words(sc))
    # inject a page: lands in the FIRST filler slot (index 5 in the
    # registration layout: 5 overhead frames then fillers)
    w = np.asarray(W.focc_word2_general(1, 0, 0, 0))
    st.push_words(STREAM_BOTH, [w])
    pairs2 = st.next_word_pairs()
    assert np.array_equal(pairs2[:5], pairs[:5])
    assert np.array_equal(pairs2[5, 0], w)
    syms = np.asarray(focc_frames_symbols(pairs2, 1))
    assert syms.shape == (38 * 463 * 2,)


def test_station_with_registration_mode():
    st = BaseStation(SystemConfig(aggressive_registration=True))
    assert st.focc.frames_per_superframe == 38
