"""End-to-end analysis pipeline: the GPSAnalysisThread equivalent.

Re-design of `app/worker.py` (P3): the reference splits the job across a
C subprocess + HTTP loopback + Qt thread; here it is one in-process
pipeline over device kernels and host decode:

  1. full-capture power pre-scan -> F1 ranges     (worker.py:198-275)
  2. GNSS receiver chain -> per-100 ms telemetry  (gnssdec's role)
  3. 4-flag detector scan -> confirmed events     (worker.py:363-458)
  4. on events: RSSI triangulation + TDOA         (worker.py:567-611)
  5. telemetry records, sdrout.c JSON schema      (worker.py:277-361)
"""
from __future__ import annotations

import dataclasses
import time
from typing import Sequence

import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT_CONFIG, FrameworkConfig
from ..models import detector, rssi, tdoa
from ..models.receiver import receiver as rx_mod
from ..ops import iq as iq_ops
from ..utils import constants as C
from . import telemetry

TELEMETRY_MS = 100             # status cadence (sdrmain.c:210)


@dataclasses.dataclass
class AnalysisResult:
    power_ranges: list[tuple[int, int]]
    events: list[dict]
    flags_trace: dict
    receiver: "rx_mod.ReceiverResult | None"
    telemetry: telemetry.TelemetryLog
    localization: dict | None
    tdoa_result: dict | None
    last_safe_fix: dict | None
    elapsed_s: float


def build_telemetry_frames(res: rx_mod.ReceiverResult, n_epochs: int,
                           n_epoch_samples: int,
                           cfg: FrameworkConfig) -> detector.TelemetryFrames:
    """Receiver outputs -> per-100 ms TelemetryFrames for the detector.

    Mirrors process_incoming_data (worker.py:277-361): C/N0 averaged over
    tracked sats, residual median/bad-count and height from the most
    recent fix, buffcnt = byte offset of the frame in the capture.
    """
    n_frames = n_epochs // TELEMETRY_MS
    t = (np.arange(n_frames, dtype=np.float64) + 1) * TELEMETRY_MS * 1e-3
    buffcnt = ((np.arange(n_frames, dtype=np.int64) + 1)
               * TELEMETRY_MS * n_epoch_samples * 2)
    cn0 = np.zeros(n_frames)
    res_med = np.zeros(n_frames)
    bad = np.zeros(n_frames)
    hgt = np.zeros(n_frames)
    nsat = np.zeros(n_frames)

    live = [c.obs for c in res.channels if c.obs is not None] if res else []
    epoch_ms = res.epoch_ms if res is not None else 1.0
    for f in range(n_frames):
        m = min((f + 1) * TELEMETRY_MS, n_epochs - 1)
        if live:
            e = int(m / epoch_ms)
            vals = [ch.cn0_dbhz[min(e, ch.cn0_dbhz.size - 1)]
                    for ch in live]
            cn0[f] = float(np.mean(vals))
    if res is not None and res.fixes:
        fix_ep = np.asarray(res.fix_epochs)
        for f in range(n_frames):
            m = (f + 1) * TELEMETRY_MS
            k = int(np.searchsorted(fix_ep, m, side="right")) - 1
            if k < 0 or m - fix_ep[k] > 300:
                continue
            sol = res.fixes[k]
            r = np.abs(sol.residuals_m[np.asarray(sol.residuals_m) != 0.0])
            res_med[f] = float(np.median(r)) if r.size else 0.0
            bad[f] = int(np.sum(r > cfg.detector.residual_single_sat_m))
            hgt[f] = sol.height_m if sol.valid else 0.0
            nsat[f] = sol.nsat if sol.valid else 0
    # host numpy: run_detector moves these on-device under its x64 scope,
    # keeping byte offsets exact int64 for >2 GB captures
    return detector.TelemetryFrames(
        time_s=t,
        buffcnt=buffcnt,
        cn0_avg=cn0.astype(np.float32),
        residual_median=res_med.astype(np.float32),
        residual_bad_count=bad.astype(np.float32),
        hgt=hgt.astype(np.float32),
        nsat=nsat.astype(np.float32))


def _week_adjust(system: str) -> int:
    """10-bit GPS week rollover / GST WN offset -> full GPS week (the same
    adjustment the PVT path applies before the precheck week gate)."""
    return {"gps": 2048, "galileo": 1024}.get(system, 0)


def frame_observations(res: "rx_mod.ReceiverResult", frame_ms: int,
                       fix) -> list[dict]:
    """Per-satellite observation rows for one telemetry frame.

    The reference emits observations[{prn,tow,week,snr,doppler,az,el,
    residual,innovation}] in every 100 ms record (sdrout.c:213-325, built
    from the obs_v matrix sdrsync.c:97-124); the per-PRN analysis harness
    (analiza_wielo.py / wyniki/doppler.py — P24) consumes exactly these
    rows. Here: snr/doppler/tow come from the channel's decoded epoch
    series, az/el/residual/innovation from the frame's current PVT
    solution (mapped back by PvtSolution.prns).
    """
    rows: list[dict] = []
    if res is None:
        return rows
    fix_prns = (list(np.asarray(fix.prns)) if fix is not None
                and fix.prns is not None else [])
    wk_adj = _week_adjust(res.system)
    for c in res.channels:
        obs = c.obs
        if obs is None:
            continue
        e = min(int(frame_ms / res.epoch_ms), obs.cn0_dbhz.size - 1,
                obs.chips.size - 1)
        az = el = resid = innov = 0.0
        if c.prn in fix_prns:
            k = fix_prns.index(c.prn)
            az = float(fix.azimuth_deg[k])
            el = float(fix.elevation_deg[k])
            resid = float(fix.residuals_m[k])
            if fix.innovations_m is not None:
                innov = float(fix.innovations_m[k])
        week = int(getattr(obs.eph, "week", 0) or 0)
        rows.append(telemetry.make_observation(
            prn=c.prn, tow=float(obs.transmit_time(e)),
            week=week + wk_adj if week else 0,
            snr=float(obs.cn0_dbhz[e]),
            doppler=float(obs.doppler_hz[min(e, obs.doppler_hz.size - 1)]),
            az=az, el=el, residual=resid, innovation=innov))
    return rows


def analyze_capture(paths: Sequence[str],
                    antenna_positions: Sequence[tuple[float, float]]
                    | None = None,
                    cfg: FrameworkConfig = DEFAULT_CONFIG,
                    run_receiver: bool = True,
                    localize: bool = True,
                    max_seconds: float | None = None,
                    system: str = "gps",
                    hold: bool = False,
                    sample_rate: float | None = None) -> AnalysisResult:
    """Analyze 1-3 antenna captures end to end (start_analysis flow,
    ui_mainwindow.py:653 -> worker.py:477-547).

    system: constellation for the receiver chain — the GUI's GPS /
    GLONASS / Galileo selector (ui_mainwindow.py:60-77; note the
    reference's GUI->CLI flag mapping is inconsistent, worker.py:104-111
    vs sdrmain.c:37-55 — here the name is the contract).
    hold: freeze the REPORTED position while the fix is held (the
    reference's -h hold-position filter, sdrout.c:141-183); when False
    the telemetry still carries the hold flag but reports the raw fix.
    sample_rate: capture sample rate override; default = the per-system
    front-end rate (2.048 MS/s GPS/Galileo, 10 MS/s GLONASS — the GUI's
    per-system params, ui_mainwindow.py:60-77 / sdrinit.c:3-13).
    """
    t_start = time.time()
    if sample_rate is not None:
        fs = float(sample_rate)
    elif system == "glonass":
        from ..config import FrontendConfig, GnssSystem
        fs = FrontendConfig.for_system(GnssSystem.GLONASS).sample_rate_hz
    else:
        fs = cfg.frontend.sample_rate_hz
    n_epoch = int(round(fs * 1e-3))

    raw = np.fromfile(paths[0], dtype=np.uint8)
    if max_seconds is not None:
        raw = raw[: int(max_seconds * fs) * 2]
    x = iq_ops.int8_to_planar(jnp.asarray(iq_ops.uint8_np_to_int8(raw)))

    # 1. power pre-scan (F1 map)
    prof = detector.power_profile(x, cfg.detector)
    ranges = detector.power_profile_ranges(prof, cfg.detector)
    ranges_pad, n_ranges = detector.ranges_to_padded(ranges)

    # 2. receiver chain
    res = None
    if run_receiver:
        res = rx_mod.run_receiver(x, fs, system=system)
    n_epochs = x.shape[-1] // n_epoch

    # 3. telemetry + detector
    frames = build_telemetry_frames(res, n_epochs, n_epoch, cfg)
    final, trace = detector.run_detector(frames, ranges_pad, n_ranges,
                                         cfg.detector)
    events = detector.events_to_list(final)

    # telemetry records + last safe fix (worker.py:339-346)
    log = telemetry.TelemetryLog()
    hold_filt = telemetry.HoldPositionFilter()
    last_safe = None
    jam_trace = np.asarray(trace.is_jamming)
    if res is not None:
        fix_ep = np.asarray(res.fix_epochs) if res.fix_epochs else None
        acq_prns = [c.prn for c in res.channels if c.acquired]
        trk = [c.prn for c in res.channels if c.obs is not None]
        dec = [c.prn for c in res.channels
               if c.obs is not None and c.obs.eph.complete]
        for f in range(len(np.asarray(frames.time_s))):
            m = (f + 1) * TELEMETRY_MS
            fix = None
            if fix_ep is not None:
                k = int(np.searchsorted(fix_ep, m, side="right")) - 1
                # a fix is "current" only within one PVT cadence + one
                # frame; stale fixes must not masquerade as live telemetry
                if (k >= 0 and res.fixes[k].valid
                        and m - fix_ep[k] <= 300):
                    fix = res.fixes[k]
            is_hold = False
            if fix is not None:
                h_lat, h_lon, h_hgt, is_hold = hold_filt.apply(
                    fix.lat_deg, fix.lon_deg, fix.height_m)
                if hold and is_hold:
                    fix = fix._replace(lat_deg=h_lat, lon_deg=h_lon,
                                       height_m=h_hgt)
            rec = telemetry.make_record(
                elapsed_s=float(frames.time_s[f]),
                time_s=float(frames.time_s[f]),
                buffcnt=int(frames.buffcnt[f]),
                acq_prns=acq_prns, tracked_prns=trk, decoded_prns=dec,
                fix=fix, hold=is_hold, filter_name=res.filter_name,
                observations=frame_observations(res, m, fix))
            log.append(rec)
            if fix is not None and f < jam_trace.size and not jam_trace[f]:
                last_safe = {"lat": fix.lat_deg, "lon": fix.lon_deg,
                             "hgt": fix.height_m,
                             "time": float(frames.time_s[f])}

    # 4. localization on detected jamming
    loc = None
    td = None
    if localize and events and antenna_positions is not None \
            and len(paths) >= 2:
        caps = [(iq_ops.read_iq_file(p, convention="normalized"))
                for p in paths]
        loc = rssi.triangulate(caps, antenna_positions, cfg=cfg.rssi)
        if len(paths) >= 2:
            caps_c = [(iq_ops.read_iq_file(p,
                                                      convention="centered"))
                      for p in paths]
            try:
                td = tdoa.localize(caps_c, antenna_positions, fs,
                                   cfg=cfg.tdoa)
            except Exception:
                td = None

    return AnalysisResult(
        power_ranges=ranges, events=events,
        flags_trace={
            "f1": np.asarray(trace.f1), "f2": np.asarray(trace.f2),
            "f3": np.asarray(trace.f3), "f4": np.asarray(trace.f4),
            "jamming": jam_trace,
        },
        receiver=res, telemetry=log, localization=loc, tdoa_result=td,
        last_safe_fix=last_safe, elapsed_s=time.time() - t_start)
