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


def test_crossover_region_pinned():
    """VERDICT r3 item 6: the detection crossover must stay a smooth
    threshold crossing located in [0, +3] dB (1024-trial reference
    table in docs/BER.md: 0.941 @ +3, 0.667 @ +1.5, 0.144 @ 0), and
    majority combining's gain over first_ok must peak mid-crossover.
    128 trials bound sampling noise to ~±0.05 per rate."""
    from amps_tpu.eval.ber import recc_link_curve

    snrs = [3.0, 1.5, 0.0]
    first = recc_link_curve(snrs, trials=128, seed=1)
    maj = recc_link_curve(snrs, trials=128, seed=1, policy="majority")
    # crossover position: high edge still detects, low edge mostly not
    assert first[3.0]["detect_rate"] >= 0.85, first[3.0]
    assert 0.45 <= first[1.5]["detect_rate"] <= 0.85, first[1.5]
    assert first[0.0]["detect_rate"] <= 0.30, first[0.0]
    # smoothness: each 1.5 dB step moves detection by less than 0.65
    # (a cliff would jump ~0.8+ in one step)
    d = [first[s]["detect_rate"] for s in snrs]
    assert all(d[i] - d[i + 1] < 0.65 for i in range(2)), d
    assert d[0] > d[1] > d[2], d
    # majority gain is real mid-crossover and shrinks toward the floor
    gain_mid = (maj[1.5]["word_success_rate"]
                - first[1.5]["word_success_rate"])
    gain_floor = (maj[0.0]["word_success_rate"]
                  - first[0.0]["word_success_rate"])
    assert gain_mid >= 0.05, (maj[1.5], first[1.5])
    assert gain_floor <= gain_mid, (gain_floor, gain_mid)
    # the combining path itself is live (words decoded BY the vote)
    assert maj[1.5].get("majority_vote_fraction", 0.0) >= 0.5
