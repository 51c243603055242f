"""Receiver sensitivity: detection/word-success vs SNR behaves sanely."""


from amps_tpu.eval.ber import recc_link_curve


def test_link_curve_monotone_and_sane():
    curve = recc_link_curve([20.0, 6.0, -14.0], trials=16)
    hi, mid, lo = curve[20.0], curve[6.0], curve[-14.0]
    # clean link: everything detected, all words good
    assert hi["detect_rate"] == 1.0
    assert hi["word_success_rate"] == 1.0
    # moderate SNR: still near-perfect (FSK at 6 dB/sample has huge
    # processing gain at 3 samples/symbol + BCH + repeats)
    assert mid["detect_rate"] >= 0.9
    assert mid["word_success_rate"] >= 0.9
    # deep noise: the correlator threshold must reject garbage
    assert lo["word_success_rate"] <= 0.25
    # monotone in SNR
    assert (hi["word_success_rate"] >= mid["word_success_rate"]
            >= lo["word_success_rate"])
