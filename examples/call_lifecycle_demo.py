"""Full call lifecycle, closed loop, no hardware.

A BaseStation and a SimMobile talk through the real air-interface
encodings in both directions: page (FOCC frames with busy/idle bits) ->
page response (RECC burst through the correlator + BCH decoder) ->
voice assignment (FOCC) -> alert (FVC blank-and-burst) -> ringing ->
answer (ST drop) -> handoff 355->356 (FVC designation) -> mobile
release (1.8 s ST).  The reference required real phones for any of
this.

Run: python examples/call_lifecycle_demo.py   (CPU, ~30 s cold)
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import jax

# Force CPU: this shell force-merges the axon TPU plugin into
# jax_platforms, so an env-var check can never fire.  Opt into another
# platform explicitly with AMPS_DEMO_PLATFORM.
jax.config.update("jax_platforms",
                  os.environ.get("AMPS_DEMO_PLATFORM", "cpu"))
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

from amps_tpu.control.station import BaseStation
from amps_tpu.ms import SimMobile
from amps_tpu.rx import correlator, decoder

SPS = 5


def deliver_recc(bs, syms):
    lead = np.tile(np.array([1, -1], np.int8), 300)
    stream = np.concatenate(
        [lead, syms, np.zeros(correlator.CAPTURE_SYMBOLS * SPS, np.int8)]
    ).astype(np.float32)
    _, valid, _, hard, _ = correlator.find_and_extract(
        stream, SPS, max_bursts=1, threshold=0.5)
    assert bool(np.asarray(valid)[0])
    dec = decoder.decode_bursts(np.asarray(hard)[0])
    bs.handle_burst(np.asarray(dec.words), np.asarray(dec.word_ok))


def main():
    bs = BaseStation(on_event=lambda e: print(f"  [bs] {e.kind}: "
                                              f"{str(e.payload)[:60]}"))
    mob = SimMobile("5551234567", sps=SPS)

    print("== operator pages the mobile ==")
    bs.handle_command("page 5551234567")
    mob.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    print(f"  [ms] log: {mob.log}")

    print("== mobile seizes the RECC; station assigns channel 355 ==")
    _, burst = mob.outbox.pop(0)
    deliver_recc(bs, burst)
    mob.hear_focc(np.asarray(bs.focc.next_superframe_symbols(), np.float32))
    print(f"  [ms] voice_chan={mob.voice_chan} recc_busy_seen={mob.recc_busy}")

    print("== FVC alert rings the mobile; user answers ==")
    mob.hear_fvc(bs.fvc.next_block(1032 * 2 * SPS + 500).astype(np.float32))
    bs.push_supervision(355, *mob.supervision_frames(30))
    mob.answer()
    bs.push_supervision(355, *mob.supervision_frames(30))
    print(f"  [ms] state={mob.state}; station audio_mute={bs.audio_mute}")

    print("== operator hands the call off to channel 356 ==")
    bs.handle_command("handoff 355 356")
    mob.hear_fvc(bs.fvc.next_block(1032 * 2 * SPS + 500).astype(np.float32))
    bs.push_supervision(356, *mob.supervision_frames(50))
    print(f"  [ms] voice_chan={mob.voice_chan}")

    print("== mobile hangs up (1.8 s signaling tone) ==")
    mob.hang_up()
    bs.push_supervision(356, *mob.supervision_frames(200))
    print(f"  [ms] log: {mob.log}")
    assert 356 not in bs.supervisors
    print("call torn down cleanly.")


if __name__ == "__main__":
    main()
