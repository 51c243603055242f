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


def test_fading_majority_beats_first_ok():
    """Fast Rayleigh fading (fd=77 Hz: the 5 repeats fade independently):
    majority combining recovers (weakly) more words than the reference's
    sequential first_ok, and most detections decode
    (tools/fading_sweep.out)."""
    from amps_tpu.eval.ber import recc_fading_curve

    maj = recc_fading_curve([10.0], doppler_hz=77.0, trials=48,
                            policy="majority", seed=1)[10.0]
    first = recc_fading_curve([10.0], doppler_hz=77.0, trials=48,
                              policy="first_ok", seed=1)[10.0]
    assert maj["detect_rate"] == first["detect_rate"]  # same detections
    assert maj["detect_rate"] > 0.7
    assert maj["word_success_rate"] >= first["word_success_rate"]
    # majority converts nearly all detections into decoded words
    assert maj["word_success_rate"] >= 0.9 * maj["detect_rate"]
