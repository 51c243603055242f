"""Application smoke tests (capture replay — the recctest.grc analogue)."""

import numpy as np

from apps.recc_monitor import monitor, synthesize_capture


def test_capture_replay_roundtrip(tmp_path):
    path = str(tmp_path / "cap.f32")
    n = synthesize_capture(path, ["page_response:5551234567"])
    assert n > 0
    found = monitor(path)
    assert found == 1
