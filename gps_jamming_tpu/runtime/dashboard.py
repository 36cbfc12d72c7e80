"""Live web dashboard: the GUI layer (L7) without Qt.

The reference couples a PySide6 main window to the analysis worker through
a loopback HTTP server on port 1234 receiving gnssdec's JSON telemetry
(worker.py:484-494 receiver, sdrout.c:10-57 sender) and renders position /
per-PRN status / jam markers on a Leaflet map (ui_mainwindow.py:737-799,
resources/map_template.html:68-190). This module provides the same surface
as a single stdlib HTTP server:

  POST /data    sdrout.c-schema telemetry record (the reference's C
                backend could post here unmodified)
  POST /event   detection/localization event records
  GET  /state.json   full dashboard state (latest record, fix track,
                     events, per-PRN observations)
  GET  /        self-contained live page: Leaflet map + status panels,
                polling /state.json

No Qt/WebEngine dependency; any browser is the GUI. The `serve` CLI verb
wires an analysis thread to it for live replay of a capture.
"""
from __future__ import annotations

import json
import threading
from collections import deque
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer


class DashboardState:
    """Thread-safe accumulation of telemetry + events."""

    def __init__(self, track_len: int = 5000):
        self._lock = threading.Lock()
        self.latest: dict | None = None
        self.track: deque = deque(maxlen=track_len)   # [lat, lon] fixes
        self.events: list[dict] = []
        self.records = 0
        self.status = "waiting for data"

    def add_record(self, rec: dict) -> None:
        with self._lock:
            self.latest = rec
            self.records += 1
            pos = rec.get("position") or {}
            if pos.get("nsat", 0) >= 4 and (pos.get("lat") or pos.get("lon")):
                self.track.append([pos["lat"], pos["lon"]])
            self.status = "receiving telemetry"

    def add_event(self, ev: dict) -> None:
        with self._lock:
            self.events.append(ev)

    def set_status(self, text: str) -> None:
        with self._lock:
            self.status = text

    def snapshot(self) -> dict:
        with self._lock:
            return {
                "status": self.status,
                "records": self.records,
                "latest": self.latest,
                "track": list(self.track),
                "events": list(self.events),
            }


_PAGE = """<!DOCTYPE html>
<html><head><meta charset="utf-8"><title>gps_jamming_tpu dashboard</title>
<link rel="stylesheet"
 href="https://unpkg.com/leaflet@1.9.4/dist/leaflet.css"/>
<script src="https://unpkg.com/leaflet@1.9.4/dist/leaflet.js"></script>
<style>
 body{margin:0;font:14px system-ui,sans-serif;display:flex;height:100vh}
 #map{flex:2}aside{flex:1;overflow:auto;padding:12px;background:#f7f7f8}
 h2{font-size:15px;margin:12px 0 4px}
 table{border-collapse:collapse;width:100%;font-size:12px}
 td,th{border:1px solid #ddd;padding:2px 5px;text-align:right}
 th{background:#eee}
 .jam{color:#fff;background:#c0392b;padding:2px 8px;border-radius:4px}
 .ok{color:#fff;background:#27ae60;padding:2px 8px;border-radius:4px}
</style></head><body>
<div id="map"></div>
<aside>
 <h2>Status <span id="st" class="ok">...</span></h2>
 <div id="pos"></div>
 <h2>Channels</h2><table id="obs"></table>
 <h2>Events</h2><table id="ev"></table>
</aside>
<script>
let map=null,track=null,fixm=null,evms=[];
if (window.L){
 map=L.map('map').setView([50.06,19.94],15);
 L.tileLayer('https://tile.openstreetmap.org/{z}/{x}/{y}.png',
             {maxZoom:19}).addTo(map);
 track=L.polyline([],{color:'#2b6cb0'}).addTo(map);
}
async function tick(){
 try{
  const s=await (await fetch('/state.json')).json();
  const r=s.latest||{},p=r.position||{};
  const jam=s.events.some(e=>!e.end_time&&e.start_time!==undefined);
  const st=document.getElementById('st');
  st.textContent=jam?'JAMMING':(s.status||'idle');
  st.className=jam?'jam':'ok';
  document.getElementById('pos').innerHTML=
   `records ${s.records} · t=${(r.elapsed_time||0).toFixed(1)}s · `+
   `filter ${r.filter||'-'}<br>`+
   `<b>${(p.lat||0).toFixed(6)}, ${(p.lon||0).toFixed(6)}</b> `+
   `h=${(p.hgt||0).toFixed(1)}m nsat=${p.nsat||0} `+
   `gdop=${(p.gdop||0).toFixed(2)} hold=${p.hold?1:0}`;
  const obs=r.observations||[];
  document.getElementById('obs').innerHTML=
   '<tr><th>PRN</th><th>SNR</th><th>Dopp</th><th>Az</th><th>El</th>'+
   '<th>Res</th></tr>'+obs.map(o=>`<tr><td>${o.prn}</td>`+
    `<td>${o.snr.toFixed(1)}</td><td>${o.doppler.toFixed(0)}</td>`+
    `<td>${o.az.toFixed(0)}</td><td>${o.el.toFixed(0)}</td>`+
    `<td>${o.residual.toFixed(1)}</td></tr>`).join('');
  document.getElementById('ev').innerHTML=
   '<tr><th>#</th><th>start</th><th>end</th><th>info</th></tr>'+
   s.events.map((e,i)=>`<tr><td>${i+1}</td>`+
    `<td>${(e.start_time??0).toFixed?e.start_time.toFixed(2):e.start_time}</td>`+
    `<td>${e.end_time??''}</td><td>${e.flags||e.reason||''}</td></tr>`)
    .join('');
  if(map){
   track.setLatLngs(s.track);
   if(s.track.length){
    const last=s.track[s.track.length-1];
    if(!fixm){fixm=L.marker(last).addTo(map);map.setView(last,15);}
    else fixm.setLatLng(last);
   }
   s.events.forEach((e,i)=>{
    if(e.jammer_lat!==undefined&&!evms[i]){
     evms[i]=L.circleMarker([e.jammer_lat,e.jammer_lon],
       {radius:9,color:'#c0392b'}).addTo(map).bindPopup('jammer estimate');
    }});
  }
 }catch(err){}
 setTimeout(tick,1000);
}
tick();
</script></body></html>"""


def make_server(state: DashboardState, port: int = 1234,
                host: str = "127.0.0.1") -> ThreadingHTTPServer:
    """Bind the dashboard HTTP server (call .serve_forever() or poll
    .handle_request(); .server_address[1] is the bound port for port=0)."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):       # quiet
            pass

        def _send(self, code: int, body: bytes, ctype: str) -> None:
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path.startswith("/state.json"):
                body = json.dumps(state.snapshot()).encode()
                self._send(200, body, "application/json")
            elif self.path == "/" or self.path.startswith("/index"):
                self._send(200, _PAGE.encode(), "text/html; charset=utf-8")
            else:
                self._send(404, b"not found", "text/plain")

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            try:
                rec = json.loads(self.rfile.read(n) or b"{}")
            except json.JSONDecodeError:
                self._send(400, b"bad json", "text/plain")
                return
            if self.path.startswith("/event"):
                state.add_event(rec)
            else:                        # /data — the sdrout.c contract
                state.add_record(rec)
            self._send(200, b"OK", "text/plain")

    return ThreadingHTTPServer((host, port), Handler)


def replay_analysis(state: DashboardState, paths, system: str = "gps",
                    max_seconds: float | None = None,
                    realtime: bool = False,
                    antenna_positions=None,
                    live: bool = True) -> None:
    """Run the full analysis pipeline and stream its telemetry + events
    into the dashboard state (the GPSAnalysisThread role, worker.py:477).

    live (default): records are pushed into the dashboard WHILE the
    streaming receiver is still processing later segments (the gnssdec
    per-100 ms POST behavior, sdrout.c:10-57) — position and flags
    advance mid-analysis on long captures. live=False replays post-hoc.
    """
    import time

    from . import pipeline

    state.set_status("analyzing " + ", ".join(paths))
    n_live = [0]

    def sink(rec):
        state.add_record(rec)
        n_live[0] += 1
        state.set_status(
            f"analyzing (live, t={rec['elapsed_time']:.1f}s)")

    res = pipeline.analyze_capture(
        paths, antenna_positions=antenna_positions,
        run_receiver=True, localize=True,
        max_seconds=max_seconds, system=system,
        sink=sink if live and not realtime else None)
    prev_t = 0.0
    for rec in res.telemetry.records[n_live[0]:]:
        if realtime:
            time.sleep(max(rec["elapsed_time"] - prev_t, 0.0))
            prev_t = rec["elapsed_time"]
        state.add_record(rec)
    for ev in res.events:
        ev = dict(ev)
        loc = getattr(res, "localization", None)
        if loc and loc.get("success") and "location_geographic" in loc:
            g = loc["location_geographic"]
            ev.setdefault("jammer_lat", g["lat"])
            ev.setdefault("jammer_lon", g["lon"])
        state.add_event(ev)
    state.set_status("analysis complete")
