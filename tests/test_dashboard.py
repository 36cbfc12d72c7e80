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
