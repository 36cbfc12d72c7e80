"""Visualization exports + telemetry HTTP sink tests."""
import http.server
import json
import threading

import numpy as np

from gps_jamming_tpu.runtime import telemetry
from gps_jamming_tpu.utils import viz


def _record(t, lat=50.0, lon=19.9, nsat=5):
    fix = type("F", (), {"nsat": nsat, "lat_deg": lat, "lon_deg": lon,
                         "height_m": 210.0, "gdop": 1.9,
                         "clock_bias_m": 12.0})()
    return telemetry.make_record(t, t, int(t * 4096 * 2), [1, 2], [1], [1],
                                 fix=fix)


def test_http_sink_roundtrip():
    received = []

    class H(http.server.BaseHTTPRequestHandler):
        def do_POST(self):
            n = int(self.headers["Content-Length"])
            received.append(json.loads(self.rfile.read(n)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *a):
            pass

    srv = http.server.HTTPServer(("127.0.0.1", 0), H)
    th = threading.Thread(target=srv.serve_forever, daemon=True)
    th.start()
    try:
        sink = telemetry.HttpSink(
            url=f"http://127.0.0.1:{srv.server_port}/data")
        log = telemetry.TelemetryLog()
        for t in (0.1, 0.2, 0.3):
            log.append(_record(t))
        assert sink.post_all(log) == 3
        assert sink.sent == 3 and sink.errors == 0
        assert len(received) == 3
        assert received[0]["position"]["nsat"] == 5
        assert received[2]["elapsed_time"] == 0.3
    finally:
        srv.shutdown()
    # unreachable endpoint -> graceful failure
    dead = telemetry.HttpSink(url="http://127.0.0.1:1/data",
                              timeout_s=0.2)
    assert not dead(_record(0.5))
    assert dead.errors == 1


def test_plot_exports(tmp_path):
    rng = np.random.default_rng(0)
    sg = rng.normal(-90, 3, (20, 128))
    viz.save_waterfall_png(sg, np.linspace(-1, 1, 128), 1.0,
                           str(tmp_path / "wf.png"))
    viz.save_power_png(rng.gamma(2, 1, 500), 0.016, 6.0,
                       [(100, 150)], str(tmp_path / "pw.png"))
    xs = np.linspace(-10, 10, 50)
    err = rng.gamma(2, 5, (50, 50)) + 1.0
    viz.save_rssi_heatmap_png(err, xs, xs, [(0, 0), (3, 0)], (4.0, 3.0),
                              [(4.5, 2.5)], str(tmp_path / "hm.png"))
    series = {7: {"t": np.arange(10.0), "snr": rng.normal(45, 1, 10),
                  "doppler": rng.normal(1000, 5, 10),
                  "residual": rng.normal(3, 1, 10),
                  "el": np.linspace(30, 35, 10)}}
    viz.save_prn_series_png(series, str(tmp_path / "prn.png"))
    for f in ("wf.png", "pw.png", "hm.png", "prn.png"):
        assert (tmp_path / f).stat().st_size > 5000


def test_map_report(tmp_path):
    path = str(tmp_path / "report.html")
    viz.save_map_report_html(
        path, track_lla=[(50.06, 19.94), (50.0601, 19.9401)],
        last_fix=(50.0601, 19.9401), jammer_lla=(50.0605, 19.9405),
        antennas_lla=[(50.06, 19.94)],
        events=[{"start_time": 8.0, "end_time": 14.0, "flags": "F1+F2"}],
        localization={"location_meters": [4.0, 3.0]})
    html = open(path).read()
    assert "leaflet" in html
    assert "estimated jammer" in html
    assert "8.00" in html and "14.00" in html
    assert "50.0605,19.9405" in html.replace(" ", "")
