"""Application smoke tests (capture replay — the recctest.grc analogue)."""


from apps.recc_monitor import monitor, synthesize_capture


def test_capture_replay_roundtrip(tmp_path):
    path = str(tmp_path / "cap.f32")
    n = synthesize_capture(path, ["page_response:5551234567"])
    assert n > 0
    found = monitor(path)
    assert found == 1


def test_cli_dispatcher_help():
    from amps_tpu.__main__ import main
    assert main(["help"]) == 0
    assert main(["nonsense"]) == 2


def test_cli_bs_smoke(tmp_path, capsys):
    from amps_tpu.__main__ import main
    out = tmp_path / "tx.f32"
    rc = main(["bs", "--channels", "8", "--superframes", "1",
               "--no-server", "--platform", "cpu",
               "--tx-out", str(out)])
    assert rc in (None, 0)
    assert out.stat().st_size > 0
