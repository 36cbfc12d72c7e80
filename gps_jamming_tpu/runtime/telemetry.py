"""Telemetry records: the reference's JSON contract + hold-position filter.

Schema-compatible with the gnssdec JSON POST (`sdrout.c:213-325`):
{elapsed_time, time, filter, acq_sv[], tracked[], decoded[],
 position{nsat, lat, lon, hgt, gdop, clk_bias, buffcnt, hold},
 observations[{prn, tow, week, snr, doppler, az, el, residual,
 innovation}]}
so the reference's analysis scripts (helpers/get_csv.py,
helpers/analyze_position.py, analiza_wielo.py) work unchanged against this
framework's output. No HTTP loopback — records are plain dicts the caller
streams to disk or a callback (the reference's socket POST was an artifact
of its two-process split; here detection consumes them in-process).
"""
from __future__ import annotations

import dataclasses
import json

import numpy as np


@dataclasses.dataclass
class HoldPositionFilter:
    """Freeze the reported fix when it jumps > `jump_deg` from the last
    good one (sdrout.c:141-183, enabled by the reference's -h flag)."""
    jump_deg: float = 1.0
    enabled: bool = True
    _last: tuple | None = None
    holding: bool = False

    def apply(self, lat: float, lon: float, hgt: float):
        """Returns (lat, lon, hgt, holding)."""
        if not self.enabled:
            return lat, lon, hgt, False
        if self._last is None:
            self._last = (lat, lon, hgt)
            self.holding = False
            return lat, lon, hgt, False
        dlat = abs(lat - self._last[0])
        dlon = abs(lon - self._last[1])
        if dlat > self.jump_deg or dlon > self.jump_deg:
            self.holding = True
            return (*self._last, True)
        self._last = (lat, lon, hgt)
        self.holding = False
        return lat, lon, hgt, False


def make_record(elapsed_s: float, time_s: float, buffcnt: int,
                acq_prns=(), tracked_prns=(), decoded_prns=(),
                fix=None, observations=(), hold: bool = False,
                filter_name: str = "WLS") -> dict:
    """Build one sdrout.c-schema telemetry record.

    fix: PvtSolution-like (lat_deg, lon_deg, height_m, gdop, clock_bias_m,
    nsat) or None before first fix.
    """
    pos = {
        "nsat": int(getattr(fix, "nsat", 0)) if fix is not None else 0,
        "lat": float(getattr(fix, "lat_deg", 0.0)) if fix is not None else 0.0,
        "lon": float(getattr(fix, "lon_deg", 0.0)) if fix is not None else 0.0,
        "hgt": float(getattr(fix, "height_m", 0.0)) if fix is not None else 0.0,
        "gdop": float(getattr(fix, "gdop", 0.0)) if fix is not None else 0.0,
        "clk_bias": float(getattr(fix, "clock_bias_m", 0.0))
        if fix is not None else 0.0,
        "buffcnt": int(buffcnt),
        "hold": bool(hold),
    }
    return {
        "elapsed_time": float(elapsed_s),
        "time": float(time_s),
        "filter": filter_name,
        "acq_sv": [int(p) for p in acq_prns],
        "tracked": [int(p) for p in tracked_prns],
        "decoded": [int(p) for p in decoded_prns],
        "position": pos,
        "observations": [dict(o) for o in observations],
    }


def make_observation(prn: int, tow: float, week: int, snr: float,
                     doppler: float, az: float, el: float,
                     residual: float, innovation: float = 0.0) -> dict:
    return {"prn": int(prn), "tow": float(tow), "week": int(week),
            "snr": float(snr), "doppler": float(doppler),
            "az": float(az), "el": float(el),
            "residual": float(residual), "innovation": float(innovation)}


def format_status_line(rec: dict) -> str:
    """Pipe-delimited status text (the stdout format of sdrout.c:218-323,
    golden example backend/bin/logi.txt)."""
    p = rec["position"]
    parts = [
        f"ETIME|{rec['elapsed_time']:.1f}",
        f"TIME|{rec['time']:.1f}",
        f"FILTER|{rec['filter']}",
        "ACQSV|" + ",".join(str(x) for x in rec["acq_sv"]),
        "TRACKED|" + ",".join(str(x) for x in rec["tracked"]),
        "DECODED|" + ",".join(str(x) for x in rec["decoded"]),
        (f"LLA|{p['nsat']}|{p['lat']:.8f}|{p['lon']:.8f}|{p['hgt']:.2f}|"
         f"{p['gdop']:.2f}|{p['clk_bias']:.2f}|{p['buffcnt']}|"
         f"{int(p['hold'])}"),
    ]
    for o in rec["observations"]:
        parts.append(
            f"OBS|{o['prn']}|{o['tow']:.3f}|{o['week']}|{o['snr']:.1f}|"
            f"{o['doppler']:.1f}|{o['az']:.1f}|{o['el']:.1f}|"
            f"{o['residual']:.2f}|{o['innovation']:.2f}")
    return "\n".join(parts)


class TelemetryLog:
    """Append-only record log with JSONL persistence (the role of the
    helpers' capture*.txt archives, helpers/wyniki/)."""

    def __init__(self):
        self.records: list[dict] = []

    def append(self, rec: dict) -> None:
        self.records.append(rec)

    def save_jsonl(self, path: str) -> None:
        with open(path, "w") as f:
            for r in self.records:
                f.write(json.dumps(r) + "\n")

    @staticmethod
    def load_jsonl(path: str) -> "TelemetryLog":
        log = TelemetryLog()
        with open(path) as f:
            for line in f:
                line = line.strip()
                if line:
                    log.records.append(json.loads(line))
        return log

    def to_csv_rows(self) -> list[tuple[float, float, float]]:
        """(elapsed_time, lat, lon) rows — the get_csv.py:64-112 contract."""
        return [(r["elapsed_time"], r["position"]["lat"],
                 r["position"]["lon"]) for r in self.records
                if r["position"]["nsat"] > 0]


class HttpSink:
    """POST each record as JSON to a loopback endpoint — wire parity with
    gnssdec's socket POST to http://127.0.0.1:1234/data (sdrout.c:10-57),
    so reference-side consumers (the GUI's receiver worker.py:24, the
    headless harness helpers/get_csv.py, helpers/test_http_server.py)
    work unchanged against this framework.
    """

    def __init__(self, url: str = "http://127.0.0.1:1234/data",
                 timeout_s: float = 1.0):
        self.url = url
        self.timeout_s = timeout_s
        self.sent = 0
        self.errors = 0

    def __call__(self, rec: dict) -> bool:
        import urllib.error
        import urllib.request
        body = json.dumps(rec).encode()
        req = urllib.request.Request(
            self.url, data=body,
            headers={"Content-Type": "application/json"})
        try:
            with urllib.request.urlopen(req, timeout=self.timeout_s):
                pass
            self.sent += 1
            return True
        except (urllib.error.URLError, OSError):
            self.errors += 1
            return False

    def post_all(self, log: "TelemetryLog") -> int:
        return sum(1 for r in log.records if self(r))
