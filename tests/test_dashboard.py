"""Dashboard server: the sdrout.c JSON contract over HTTP + live state.

The reference GUI receives gnssdec telemetry on a loopback HTTP server
(worker.py:484-494); the dashboard provides the same POST /data surface
plus a browser page and a JSON state snapshot.
"""
import json
import threading
import urllib.request

from gps_jamming_tpu.runtime import dashboard, telemetry


class _Fix:
    nsat, lat_deg, lon_deg, height_m = 7, 50.06, 19.94, 219.0
    gdop, clock_bias_m = 1.8, 12.5


def _get(url):
    with urllib.request.urlopen(url, timeout=5) as r:
        return r.read()


def test_dashboard_roundtrip():
    state = dashboard.DashboardState()
    srv = dashboard.make_server(state, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        rec = telemetry.make_record(
            1.0, 345601.0, 4096000, acq_prns=[5, 13], tracked_prns=[5],
            decoded_prns=[5], fix=_Fix(),
            observations=[telemetry.make_observation(
                5, 345601.0, 2400, 48.0, 1200.0, 110.0, 45.0, 3.0)])
        sink = telemetry.HttpSink(f"http://127.0.0.1:{port}/data")
        assert sink(rec)

        urllib.request.urlopen(urllib.request.Request(
            f"http://127.0.0.1:{port}/event",
            data=json.dumps({"start_time": 2.5, "end_time": 4.0,
                             "flags": "F1"}).encode(),
            headers={"Content-Type": "application/json"}), timeout=5)

        st = json.loads(_get(f"http://127.0.0.1:{port}/state.json"))
        assert st["records"] == 1
        assert st["latest"]["position"]["nsat"] == 7
        assert st["track"] == [[50.06, 19.94]]
        assert st["events"][0]["flags"] == "F1"

        page = _get(f"http://127.0.0.1:{port}/").decode()
        assert "dashboard" in page and "/state.json" in page
        assert _get(f"http://127.0.0.1:{port}/state.json")
    finally:
        srv.shutdown()
        srv.server_close()


def test_dashboard_state_gating():
    state = dashboard.DashboardState()
    # records without a 4-sat fix don't pollute the track
    state.add_record({"position": {"nsat": 2, "lat": 1.0, "lon": 1.0}})
    state.add_record({"position": {"nsat": 5, "lat": 2.0, "lon": 3.0}})
    snap = state.snapshot()
    assert snap["track"] == [[2.0, 3.0]]
    assert snap["records"] == 2


def _post(url, body):
    req = urllib.request.Request(
        url, data=json.dumps(body).encode(),
        headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req, timeout=30) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


def test_control_surface_start_watch_stop(tmp_path):
    """The browser control surface (ui_mainwindow.py:633-690 roles):
    start an analysis from the page's POST /control with files + system
    + threshold + antenna positions, watch live records and the
    triangulation result arrive in /state.json, and verify stop/start
    gating + input validation."""
    import time
    import urllib.error

    import numpy as np

    from gps_jamming_tpu.sim import scenario

    FS = 2.048e6
    scn = scenario.JammerScenario(kind="chirp", position_m=(4.0, 3.0),
                                  start_s=0.3, duration_s=0.4, seed=7)
    ants = [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0)]
    paths = [str(tmp_path / f"ant{i}.bin") for i in range(3)]
    scenario.write_capture_set(scn, ants, paths, int(FS), FS,
                               noise_std=1.0)

    state = dashboard.DashboardState()
    ctl = dashboard.AnalysisController(state)
    srv = dashboard.make_server(state, port=0, controller=ctl)
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{port}"
    try:
        # validation: bad action / missing files / unknown system
        assert _post(f"{base}/control", {"action": "dance"})[0] == 409
        code, r = _post(f"{base}/control",
                        {"action": "start", "files": ["/nope.bin"]})
        assert code == 409 and "not found" in r["message"]
        code, r = _post(f"{base}/control",
                        {"action": "start", "files": paths,
                         "system": "loran"})
        assert code == 409
        # stop while idle is a 409 too
        assert _post(f"{base}/control", {"action": "stop"})[0] == 409

        # start an analysis (1 s capture: < one segment, so the
        # receiver contributes empty channel lists but full telemetry)
        code, r = _post(f"{base}/control", {
            "action": "start", "files": paths, "system": "gps",
            "threshold_db": 6.0, "receiver": True,
            "positions": [[0, 0], [3, 0], [0, 3]]})
        assert code == 200 and r["ok"], r
        # double-start is rejected while running (if still running)
        code2, r2 = _post(f"{base}/control", {
            "action": "start", "files": paths, "receiver": True})
        if code2 == 200:                 # first run may already be done
            ctl.join(60)
        else:
            assert "already running" in r2["message"]
        ctl.join(120)

        st = json.loads(_get(f"{base}/state.json"))
        assert st["running"] is False
        assert st["records"] >= 9        # 1 s capture -> ~10 records
        assert len(st["events"]) >= 1    # the chirp jam detected
        assert st["antennas"] == [{"x": 0.0, "y": 0.0},
                                  {"x": 3.0, "y": 0.0},
                                  {"x": 0.0, "y": 3.0}]
        tri = st["triangulation"]
        assert tri and tri["success"]    # range circles + result panel
        assert len(tri["distances"]) == 3
        assert abs(tri["location_meters"][0] - 4.0) < 3.0
        assert st["status"] == "analysis complete"

        # page carries the control + triangulation UI
        page = _get(f"{base}/").decode()
        for frag in ("/control", "ctlStart", "ctlStop", "Triangulation",
                     "L.control.layers", "opentopomap", "World_Imagery"):
            assert frag in page, frag

        # start again with the receiver ON over a longer capture and
        # stop it mid-run (cooperative stop at a live emission)
        long_path = str(tmp_path / "long.bin")
        rng = np.random.default_rng(0)
        rng.integers(0, 256, int(2 * 10.0 * FS),
                     dtype=np.uint8).tofile(long_path)
        code, r = _post(f"{base}/control", {
            "action": "start", "files": [long_path], "system": "gps",
            "receiver": True, "emit_every_s": 2.0})
        assert code == 200, r
        deadline = time.time() + 300
        stopped = False
        while time.time() < deadline:
            st = json.loads(_get(f"{base}/state.json"))
            if not stopped and st["records"] > 0:
                code, r = _post(f"{base}/control", {"action": "stop"})
                assert code == 200, r
                stopped = True
            if stopped and st["running"] is False:
                break
            time.sleep(0.5)
        ctl.join(60)
        st = json.loads(_get(f"{base}/state.json"))
        assert st["running"] is False
        if stopped:
            assert st["status"] == "stopped by user", st["status"]
    finally:
        srv.shutdown()
        srv.server_close()
