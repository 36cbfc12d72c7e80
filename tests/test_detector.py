"""Detector parity tests.

Oracles: a faithful NumPy re-implementation of worker.py:363-458's state
machine run against identical telemetry streams, plus checkIfJamming.py event
semantics, plus end-to-end detection on a simulated jammed capture.
"""
import numpy as np
import jax.numpy as jnp

from gps_jamming_tpu.config import DetectorConfig
from gps_jamming_tpu.models import detector
from gps_jamming_tpu.ops import iq
from gps_jamming_tpu.sim import scenario

CFG = DetectorConfig()


# --- reference oracle: literal transcription of the worker state machine ---
class _RefDetector:
    def __init__(self, ranges, cfg=CFG):
        self.cfg = cfg
        self.ranges = ranges
        self.jamming = False
        self.pot_start_t = None
        self.pot_start_buff = 0
        self.pot_end_t = None
        self.hist = []
        self.events = []
        self.active_start_t = 0.0
        self.active_start_buff = 0

    def step(self, t, buffcnt, cn0, res_med, bad, hgt, nsat):
        cfg = self.cfg
        if (not self.jamming) and cn0 > 0:
            self.hist.append(cn0)
            self.hist = self.hist[-cfg.cn0_history_len:]
        median = np.median(self.hist) if len(self.hist) > 10 else cn0

        f1 = any(s <= buffcnt <= e for s, e in self.ranges)
        f2 = len(self.hist) > cfg.cn0_min_history and cn0 < median - cfg.cn0_drop_db
        f3 = (res_med > cfg.residual_median_m) or (bad >= cfg.min_bad_sats)
        f4 = nsat > 0 and abs(hgt) > cfg.max_altitude_m
        nav_issue = (f3 or f4) and nsat > 0
        now = f1 or f2 or nav_issue

        if not self.jamming:
            if now:
                if f1:
                    self._confirm(t, buffcnt, True)
                else:
                    if self.pot_start_t is None:
                        self.pot_start_t = t
                        self.pot_start_buff = buffcnt
                    elif t - self.pot_start_t >= cfg.confirm_duration_s:
                        self._confirm(t, buffcnt, False)
            else:
                self.pot_start_t = None
        else:
            if not now:
                if self.pot_end_t is None:
                    self.pot_end_t = t
                elif t - self.pot_end_t >= cfg.clear_duration_s:
                    self.jamming = False
                    self.events.append((self.active_start_buff, buffcnt,
                                        self.active_start_t, t))
                    self.pot_end_t = None
            else:
                self.pot_end_t = None
        return self.jamming

    def _confirm(self, t, buffcnt, via_f1):
        self.jamming = True
        if via_f1:
            sb = buffcnt
            for s, e in self.ranges:
                if s <= buffcnt <= e:
                    sb = s
                    break
            self.active_start_t = t
        else:
            sb = self.pot_start_buff if self.pot_start_buff > 0 else buffcnt
            self.active_start_t = self.pot_start_t if self.pot_start_t else t
        self.active_start_buff = sb

    def finish(self, t, buffcnt):
        if self.jamming:
            self.events.append((self.active_start_buff, buffcnt,
                                self.active_start_t, t))


def _frames(t, buff, cn0, res, bad, hgt, nsat):
    return detector.TelemetryFrames(
        jnp.asarray(t, jnp.float32), jnp.asarray(buff, jnp.int32),
        jnp.asarray(cn0, jnp.float32), jnp.asarray(res, jnp.float32),
        jnp.asarray(bad, jnp.int32), jnp.asarray(hgt, jnp.float32),
        jnp.asarray(nsat, jnp.int32))


def _run_both(t, buff, cn0, res, bad, hgt, nsat, ranges):
    ref = _RefDetector(ranges)
    ref_flags = [ref.step(*row) for row in zip(t, buff, cn0, res, bad, hgt, nsat)]
    ref.finish(t[-1], buff[-1])

    rarr, nr = detector.ranges_to_padded(ranges)
    final, trace = detector.run_detector(
        _frames(t, buff, cn0, res, bad, hgt, nsat), rarr, nr, CFG)
    got_flags = list(np.asarray(trace.is_jamming))
    got_events = [(e["start_sample"], e["end_sample"], e["start_time"],
                   e["end_time"]) for e in detector.events_to_list(final)]
    want_events = [(int(a), int(b), float(c), float(d)) for a, b, c, d in ref.events]
    # float32 scan times vs python float64 oracle: compare with tolerance
    assert len(got_events) == len(want_events)
    for g, w in zip(got_events, want_events):
        assert g[0] == w[0] and g[1] == w[1]
        assert abs(g[2] - w[2]) < 1e-3 and abs(g[3] - w[3]) < 1e-3
    return ref_flags, got_flags, want_events, want_events


def test_f1_instant_confirm_and_clear():
    n = 100
    t = np.arange(n) * 0.1
    buff = (np.arange(n) * 1000).astype(np.int64)
    ranges = [(20_000, 40_000)]           # frames 20..40 inside
    cn0 = np.full(n, 45.0)
    z = np.zeros(n)
    ref_flags, got_flags, want_ev, got_ev = _run_both(
        t, buff, cn0, z, z.astype(int), z, np.full(n, 6, int), ranges)
    assert got_flags == ref_flags
    assert got_ev == want_ev
    assert len(got_ev) == 1
    assert got_ev[0][0] == 20_000         # snapped to range start


def test_cn0_drop_requires_sustain():
    n = 200
    t = np.arange(n) * 0.1
    buff = (np.arange(n) * 1000).astype(np.int64)
    cn0 = np.full(n, 45.0)
    cn0[100:140] = 30.0                   # 4 s drop -> confirmed after 2.5 s
    z = np.zeros(n)
    ref_flags, got_flags, want_ev, got_ev = _run_both(
        t, buff, cn0, z, z.astype(int), z, np.full(n, 6, int), [])
    assert got_flags == ref_flags
    assert got_ev == want_ev
    assert any(ref_flags)


def test_short_glitch_not_confirmed():
    n = 120
    t = np.arange(n) * 0.1
    buff = (np.arange(n) * 1000).astype(np.int64)
    cn0 = np.full(n, 45.0)
    cn0[60:70] = 20.0                     # only 1 s -> below 2.5 s sustain
    z = np.zeros(n)
    ref_flags, got_flags, want_ev, got_ev = _run_both(
        t, buff, cn0, z, z.astype(int), z, np.full(n, 6, int), [])
    assert got_flags == ref_flags
    assert not any(got_flags)
    assert got_ev == want_ev == []


def test_integrity_and_altitude_flags():
    n = 150
    t = np.arange(n) * 0.1
    buff = (np.arange(n) * 1000).astype(np.int64)
    cn0 = np.full(n, 45.0)
    res = np.zeros(n)
    res[50:100] = 100.0                   # F3 median residual
    hgt = np.zeros(n)
    hgt[110:140] = 20_000.0               # F4 (after F3 event clears)
    nsat = np.full(n, 6, int)
    ref_flags, got_flags, want_ev, got_ev = _run_both(
        t, buff, cn0, res, np.zeros(n, int), hgt, nsat, [])
    assert got_flags == ref_flags
    assert got_ev == want_ev


def test_randomized_parity(rng):
    """Fuzz: random telemetry must produce identical decision traces."""
    for trial in range(5):
        n = 300
        t = np.arange(n) * 0.1
        buff = (np.arange(n) * 1000).astype(np.int64)
        cn0 = 40 + 5 * rng.standard_normal(n)
        cn0[rng.integers(0, n)] = 0.0
        drop = rng.integers(0, n - 60)
        cn0[drop:drop + 50] -= 15
        res = np.abs(10 * rng.standard_normal(n))
        res[rng.integers(0, n - 40):][:30] = 120.0
        bad = rng.integers(0, 3, n)
        hgt = 100 * rng.standard_normal(n)
        nsat = rng.integers(0, 8, n)
        ranges = [(int(rng.integers(0, 100_000)),) * 1]
        s = int(rng.integers(0, 150_000))
        ranges = [(s, s + 30_000)]
        ref_flags, got_flags, want_ev, got_ev = _run_both(
            t, buff, cn0, res, bad, hgt, nsat, ranges)
        assert got_flags == ref_flags, f"trial {trial}"
        assert got_ev == want_ev, f"trial {trial}"


def test_power_profile_and_standalone_events(rng):
    """End-to-end: simulated jammed capture -> F1 ranges + standalone events."""
    fs = 2.048e6
    dur = 2.0
    n = int(fs * dur)
    scn = scenario.JammerScenario(kind="cw", position_m=(3.0, 0.0),
                                  start_s=0.8, duration_s=0.6, seed=1)
    cap = scenario.render_antenna_capture(scn, (0.0, 0.0), n, fs, noise_std=2.0)

    prof = detector.power_profile(cap, CFG)
    ranges = detector.power_profile_ranges(prof, CFG)
    assert len(ranges) == 1
    start_b, end_b = ranges[0]
    # bytes -> seconds
    assert abs(start_b / (2 * fs) - 0.8) < 0.05
    assert abs(end_b / (2 * fs) - 1.4) < 0.05

    cp = detector.standalone_chunk_powers(cap, CFG)
    thr = float(detector.calibrate_threshold(cp))
    ev = detector.standalone_events(np.asarray(cp), thr, CFG.standalone_chunk_bytes // 2)
    assert len(ev) == 1
    s, e = ev[0]
    assert abs(s / fs - 0.8) < 0.05 and abs(e / fs - 1.4) < 0.05
