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


def test_mesh_bs_full_call_lifecycle():
    """VERDICT r3 item 3: the multi-chip BS-in-a-box.  bs_app --mesh 2x2
    runs the ShardedTransceiver under the REAL control plane on the
    virtual CPU mesh; the operator pages IN VIA THE TCP SOCKET (the
    reference's Socket PDU, grc/ampsbs.grc:1650), the simulated mobile
    answers over the air interface (RECC response through the sharded
    RX, SAT/ST transponded on the reverse voice channel and measured
    through the sharded analysis bank), and the release is observed —
    one full paged call lifecycle through the application."""
    import socket
    import threading
    import time

    from apps import bs_app

    port = 64710
    result: dict = {}
    th = threading.Thread(
        target=bs_app.main,
        args=(["--mesh", "2x2", "--channels", "8", "--platform", "cpu",
               "--simulate", "mobile:5551234567",
               "--voice-slot-map", "355:4,356:5",
               "--sup-timers", "3.0:0.8",
               "--port", str(port), "--blocks", "30"], result),
        daemon=True)
    th.start()

    # operator: wait for the command server, then page via the socket
    deadline = time.time() + 600
    sock = None
    while time.time() < deadline:
        try:
            sock = socket.create_connection(("127.0.0.1", port), timeout=1)
            break
        except OSError:
            time.sleep(0.5)
    assert sock is not None, "command server never came up"
    sock.sendall(b"page 5551234567\n")
    time.sleep(0.2)
    sock.close()

    th.join(timeout=900)
    assert not th.is_alive(), "mesh BS loop did not finish"
    station, mob = result["station"], result["mob"]
    # full lifecycle: paged -> assigned -> ringing -> answered -> hung up
    assert mob.log[:4] == ["paged", "assigned 355", "ringing", "answered"], \
        mob.log
    assert "hang_up" in mob.log
    sup_events = [e.payload for e in station.events
                  if e.kind == "supervision_event"]
    sup_kinds = [e.kind for e in sup_events]
    assert "answer" in sup_kinds, sup_kinds
    assert "release" in sup_kinds, sup_kinds
    # zero unexpected events: no flash/extra answers on this timeline
    assert set(sup_kinds) <= {"answer", "sat_lost", "sat_back",
                              "release"}, sup_kinds
    # the mobile hung up: the release must be the ST release, not a
    # fade timeout (a fade release here means tone runs are breaking —
    # e.g. the block-boundary FM-click bug this test now guards)
    rel = next(e for e in sup_events if e.kind == "release")
    assert "ST" in rel.reason, rel
    assert not station.supervisors          # torn down
    # the page command arrived through the socket path
    assert any(e.kind == "debug" and "paging" in str(e.payload)
               for e in station.events)


def test_mesh_bs_origination_lifecycle():
    """Mobile-originated call through the multi-chip application: the
    scripted mobile originates over the air (RECC through the sharded
    RX), the station assigns the origination voice channel + emits the
    reference's 'page <digits>' loopback command, supervision runs in
    CONVERSATION off the sharded bank, and the mobile's hang-up (ST
    run) releases the channel."""
    result: dict = {}
    from apps import bs_app
    bs_app.main(["--mesh", "2x2", "--channels", "8", "--platform", "cpu",
                 "--simulate", "mobile:5551234567:originate:7025551000",
                 "--voice-slot-map", "355:4,356:5",
                 "--sup-timers", "3.0:0.8",
                 "--no-server", "--blocks", "30"], result)
    station, mob = result["station"], result["mob"]
    assert "originate 7025551000" in mob.log, mob.log
    # per-channel FVC mode (mapped voice slots): the station assigns
    # the first FREE channel of the plan (355) instead of the
    # reference's hardcoded origination channel 356
    assert "assigned 355" in mob.log, mob.log
    assert "hang_up" in mob.log, mob.log
    # the reference's origination loopback command fired
    assert any(e.kind == "command" and "page 7025551000" in str(e.payload)
               for e in station.events)
    sup_events = [e.payload for e in station.events
                  if e.kind == "supervision_event"]
    sup_kinds = [e.kind for e in sup_events]
    assert "release" in sup_kinds, sup_kinds
    assert set(sup_kinds) <= {"sat_lost", "sat_back", "release"}, sup_kinds
    rel = next(e for e in sup_events if e.kind == "release")
    assert "ST" in rel.reason, rel
    assert not station.supervisors


def test_mesh_bs_two_concurrent_calls():
    """Two CONCURRENT calls through the multi-chip application with
    per-channel FVC streams: mobile A originates first (gets the first
    free voice channel, 355), mobile B originates while A's call is
    live (gets 356), both are supervised simultaneously off the sharded
    bank, and each hang-up releases ITS channel only — the shared-FVC
    single-call limitation is gone."""
    result: dict = {}
    from apps import bs_app
    bs_app.main(["--mesh", "2x2", "--channels", "8", "--platform", "cpu",
                 "--simulate", "mobile:5551234567:originate:7025551000:2:3",
                 "--simulate", "mobile:4155559876:originate:7025552000:5:6",
                 "--voice-slot-map", "355:4,356:5",
                 "--sup-timers", "3.0:0.8",
                 "--no-server", "--blocks", "40"], result)
    station = result["station"]
    ma, mb = result["mobs"]
    assert "assigned 355" in ma.log, ma.log
    # B originated while A's call held 355 -> B got 356: CONCURRENT
    assert "assigned 356" in mb.log, mb.log
    assert "hang_up" in ma.log and "hang_up" in mb.log
    # two independent ST releases, one per channel, in hang-up order
    rels = [e.payload for e in station.events
            if e.kind == "supervision_event" and e.payload.kind == "release"]
    assert len(rels) == 2, [(r.channel, r.reason) for r in rels]
    assert {r.channel for r in rels} == {355, 356}
    assert all("ST" in r.reason for r in rels), \
        [(r.channel, r.reason) for r in rels]
    assert rels[0].channel == 355 and rels[1].channel == 356
    # zero unexpected supervision events
    kinds = [e.payload.kind for e in station.events
             if e.kind == "supervision_event"]
    assert set(kinds) <= {"sat_lost", "sat_back", "release"}, kinds
    assert not station.supervisors


def test_mesh_bs_registration():
    """Autonomous registration through the multi-chip application: the
    scripted mobile registers over the air (RECC through the sharded
    RX) and hears the station's audit-order confirmation on the sharded
    FOCC — the third dispatch type (after page response and
    origination) proven at the application level."""
    result: dict = {}
    from apps import bs_app
    bs_app.main(["--mesh", "2x2", "--channels", "8", "--platform", "cpu",
                 "--simulate", "mobile:2135551212:register:2",
                 "--no-server", "--blocks", "6"], result)
    station, mob = result["station"], result["mobs"][0]
    assert "register" in mob.log, mob.log
    assert "audit_confirmed" in mob.log, mob.log
    assert any(e.kind == "debug" and "registration" in str(e.payload)
               for e in station.events)
