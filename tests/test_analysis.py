"""Tests for CRC-24Q and the accuracy-analysis helpers."""
import json

import numpy as np
import pytest

from gps_jamming_tpu.runtime import telemetry
from gps_jamming_tpu.utils import analysis, crc


class _Fix:
    def __init__(self, lat, lon, hgt, clk, nsat=6, gdop=2.0):
        self.lat_deg, self.lon_deg, self.height_m = lat, lon, hgt
        self.clock_bias_m, self.nsat, self.gdop = clk, nsat, gdop


def test_crc24q_known_vector():
    # CRC-24Q (RTCM/Galileo: poly 0x1864CFB, init 0) check value of
    # "123456789" is 0xCDE703 (the init-0xB704CE OpenPGP variant would
    # give 0x21CF02)
    assert crc.crc24q(b"123456789") == 0xCDE703
    assert crc.check_crc24q(b"123456789", 0xCDE703)
    assert not crc.check_crc24q(b"123456788", 0xCDE703)


def test_crc24q_bits_matches_bytes():
    rng = np.random.default_rng(0)
    data = bytes(rng.integers(0, 256, 16, dtype=np.uint8))
    bits = np.unpackbits(np.frombuffer(data, np.uint8))
    assert crc.crc24q_bits(bits) == crc.crc24q(data)


def _make_log(lat0=50.06, lon0=19.94):
    recs = []
    # 3 frames without fix, then fixes drifting slightly
    for i in range(3):
        recs.append(telemetry.make_record(i * 0.1, i * 0.1, i * 100))
    rng = np.random.default_rng(1)
    for i in range(20):
        fix = _Fix(lat0 + rng.normal(0, 1e-5), lon0 + rng.normal(0, 1e-5),
                   219.0 + rng.normal(0, 3.0), 1000.0 + 0.5 * i)
        recs.append(telemetry.make_record(
            0.3 + i * 0.1, 0.3 + i * 0.1, 1000 + i,
            fix=fix, observations=[telemetry.make_observation(
                5, 100.0, 2400, 44.0 + i * 0.1, 1200.0, 30.0, 45.0, 1.0)]))
    return recs


def test_ttff_and_position_report():
    recs = _make_log()
    assert analysis.ttff(recs) == pytest.approx(0.3)
    rep = analysis.position_report(recs, 50.06, 19.94, 219.0)
    assert rep.n_fixes == 20
    assert rep.mean_error_m < 5.0
    assert rep.p95_error_m >= rep.median_error_m
    assert abs(rep.mean_height_error_m) < 3.0


def test_clock_stats_drift():
    recs = _make_log()
    st = analysis.clock_stats(recs)
    assert st["n"] == 20
    # injected drift: +0.5 m per 0.1 s = 5 m/s
    assert st["drift_m_per_s"] == pytest.approx(5.0, rel=0.05)


def test_per_prn_series():
    recs = _make_log()
    series = analysis.per_prn_series(recs)
    assert 5 in series
    assert series[5]["snr"].size == 20
    assert series[5]["snr"][0] == pytest.approx(44.0)


def test_batch_report(tmp_path):
    recs = _make_log()
    p = str(tmp_path / "run1.jsonl")
    log = telemetry.TelemetryLog()
    log.records = recs
    log.save_jsonl(p)
    rows = analysis.batch_report([p], 50.06, 19.94, 219.0)
    assert len(rows) == 1
    assert rows[0]["n_fixes"] == 20
    assert rows[0]["run"] == p
