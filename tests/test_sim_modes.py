"""Simulation modes A (clean/weakened) and C (spoofer) + settings-style
CLI overrides — parity with the reference sim GUI's three modes
(gnss_frontend.py:791-1307) and the settings dialog's threshold/hold
knobs (settings_dialog.py:47-120, sdrmain.c:48-49).
"""
import json

import numpy as np
import pytest

import jax.numpy as jnp

from gps_jamming_tpu import cli
from gps_jamming_tpu.config import DEFAULT_CONFIG as CFG
from gps_jamming_tpu.models.receiver import acquisition as acq
from gps_jamming_tpu.ops import cplx, iq
from gps_jamming_tpu.sim import scenario

FS = 2.048e6
N_CODE = 2048
LLA = (50.06, 19.94, 219.0)


def _acquire_from_file(path, n_intg=10):
    x = iq.read_iq_file(path, convention="centered")
    blocks = cplx.from_complex(
        jnp.asarray(x[: n_intg * N_CODE].astype(np.complex64))
    ).reshape(n_intg, N_CODE)
    rep = acq.gps_replica_table_host(FS, N_CODE)
    return acq.acquire_all(blocks, rep, FS, CFG.acquisition)


def test_clean_capture_mode_a(tmp_path):
    """Mode A: a weakened clean capture is acquirable by the receiver and
    carries the weaken_gps.py noise floor (x0.125 + AWGN sigma=6.25)."""
    path = str(tmp_path / "clean0.bin")
    n = 16 * N_CODE
    scenario.write_clean_capture(path, LLA, n, FS, weaken_gps=True, seed=3)
    raw = np.fromfile(path, np.uint8)
    assert raw.size == 2 * n
    # weakened: noise-dominated samples, but structure present
    res = _acquire_from_file(path)
    n_acq = int(np.asarray(res.acquired).sum())
    assert n_acq >= 4, f"only {n_acq} PRNs acquired from clean capture"


def test_clean_capture_no_weaken(tmp_path):
    path = str(tmp_path / "strong0.bin")
    n = 12 * N_CODE
    scenario.write_clean_capture(path, LLA, n, FS, weaken_gps=False, seed=3)
    x = iq.read_iq_file(path, convention="centered")
    # unweakened: satellite amplitude ~64 digital units, no AWGN ->
    # much hotter than the weakened floor
    assert np.mean(np.abs(x) ** 2) > 500.0


def test_spoof_capture_mode_c(tmp_path):
    """Mode C: the spoofed capture contains BOTH constellations; the
    overpowered spoof replicas dominate acquisition after the ramp."""
    path = str(tmp_path / "spoof0.bin")
    n = 16 * N_CODE
    fake_ecef = scenario.write_spoof_capture(
        path, LLA, (50.30, 20.20, 15000.0), n, FS,
        start_s=-1.0, ramp_s=0.2, overpower=4.0, seed=5)
    assert np.linalg.norm(fake_ecef) > 6.3e6      # a real ECEF position
    res = _acquire_from_file(path)
    n_acq = int(np.asarray(res.acquired).sum())
    assert n_acq >= 4


def test_cli_simulate_clean_and_spoof(tmp_path, capsys):
    out = str(tmp_path / "a")
    rc = cli.main(["simulate", "--kind", "clean", "--out", out,
                   "--seconds", "0.02", "--antennas", "1"])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["scenario"]["kind"] == "clean" and meta["scenario"]["weakened"]
    assert np.fromfile(meta["written"][0], np.uint8).size > 0

    out = str(tmp_path / "mv")
    rc = cli.main(["simulate", "--kind", "clean", "--out", out,
                   "--seconds", "0.02", "--antennas", "1",
                   "--end-lat", "50.062", "--end-lon", "19.941"])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["scenario"]["end_lla"][:2] == [50.062, 19.941]
    assert np.fromfile(meta["written"][0], np.uint8).size > 0

    out = str(tmp_path / "s")
    rc = cli.main(["simulate", "--kind", "spoof", "--out", out,
                   "--seconds", "0.02", "--antennas", "1",
                   "--start", "-1", "--overpower", "3.0"])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["scenario"]["kind"] == "spoof"
    assert len(meta["scenario"]["fake_ecef"]) == 3


def test_cli_jammer_with_gps_background(tmp_path, capsys):
    """Mode B over a live constellation: the add_jammer_and_mix.py flow —
    jammer power rise detectable AND GPS still present outside the jam."""
    out = str(tmp_path / "j")
    rc = cli.main(["simulate", "--kind", "cw", "--out", out,
                   "--seconds", "0.4", "--antennas", "1", "--with-gps",
                   "--start", "0.2", "--duration", "0.15",
                   "--jammer-x", "1", "--jammer-y", "1"])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["scenario"]["with_gps"]
    x = iq.read_iq_file(meta["written"][0], convention="centered")
    pm = np.abs(x) ** 2
    chunk = 32768
    pc = pm[: pm.size // chunk * chunk].reshape(-1, chunk).mean(axis=1)
    # the jam window is hotter than the pre-jam floor by >= 6 dB
    assert pc.max() > pc[:10].mean() * 10 ** 0.6
    # GPS survives: acquisition on the PRE-JAM head locks satellites
    res = _acquire_from_file(meta["written"][0])
    assert int(np.asarray(res.acquired).sum()) >= 4


def test_moving_jammer_profile_peaks_at_closest_approach(tmp_path, capsys):
    """Dynamic mode B: a jammer sweeping past the antenna produces a
    power envelope that peaks at closest approach (the dynamic-mode
    trajectory profile of add_jammer_and_mix.py:100-135)."""
    out = str(tmp_path / "m")
    rc = cli.main(["simulate", "--kind", "cw", "--out", out,
                   "--seconds", "0.3", "--antennas", "1",
                   "--jammer-x", "6", "--jammer-y", "0",
                   "--jammer-end-x", "-6", "--jammer-end-y", "0",
                   "--noise", "0.5"])
    assert rc == 0
    meta = json.loads(capsys.readouterr().out)
    assert meta["scenario"]["jammer_end_m"] == [-6.0, 0.0]
    x = iq.read_iq_file(meta["written"][0], convention="centered")
    chunk = 16384
    pc = (np.abs(x[: x.size // chunk * chunk]) ** 2
          ).reshape(-1, chunk).mean(axis=1)
    k = int(np.argmax(pc))
    # closest approach (jammer at the antenna) is mid-capture
    assert 0.3 < k / pc.size < 0.7, (k, pc.size)
    # edges are far (6 m) -> much weaker than the peak
    assert pc[k] > 4.0 * pc[0] and pc[k] > 4.0 * pc[-1]


def test_moving_receiver_range_fit_accuracy():
    """The quartic range fit for a moving receiver matches the direct
    per-sample geometry to < 1 cm over a 30 s vehicle-speed sweep."""
    from gps_jamming_tpu.models.receiver import ephemeris as eph_mod
    from gps_jamming_tpu.sim import constellation, trajectory
    shell = scenario.synthetic_gps_shell()
    tow0 = scenario.DEFAULT_TOE_S - 1.3
    dur = 30.0
    # ~185 m in 30 s (~22 km/h) north-east sweep
    rows = trajectory.linear_trajectory(LLA, (50.0612, 19.9412, 219.0), dur)
    batch = eph_mod.stack_ephemeris(shell)
    one = eph_mod.EphArrays(*[c[0:1] for c in batch])
    coeffs = constellation._range_fit(one, tow0, dur, None, rx_rows=rows)
    tchk = np.linspace(0.0, dur, 13)
    rx = constellation._traj_rx(rows, tchk)
    rho_true = constellation.geometric_range(one, tow0 + tchk, rx)
    err = np.abs(np.polyval(coeffs, tchk) - rho_true)
    assert err.max() < 0.01, err.max()


def test_moving_receiver_doppler_shift(tmp_path):
    """A fast-moving receiver's acquisition Doppler differs from the
    static one by the predicted velocity projection (gps-sdr-sim -u
    parity at the signal level)."""
    n = 12 * N_CODE
    tow0 = scenario.DEFAULT_TOE_S - 1.3
    stat, truths_s, _ = scenario.gps_background(LLA, tow0, n, FS)
    # 0.0002 deg over 12 ms is absurdly fast (~2 km/s) — but it makes the
    # Doppler shift >> one 200 Hz search bin, which is the point
    mov, truths_m, _ = scenario.gps_background(
        LLA, tow0, n, FS, end_lla=(LLA[0] + 2e-4, LLA[1], LLA[2]))
    s_by_prn = {t.prn: t for t in truths_s}
    shifted = [abs(t.doppler_hz - s_by_prn[t.prn].doppler_hz)
               for t in truths_m if t.prn in s_by_prn]
    assert max(shifted) > 400.0, "truth Doppler should reflect rx motion"

    # acquisition on the moving capture recovers the moving truths
    p = str(tmp_path / "mov.bin")
    iq.write_iq_file(p, np.asarray(mov) * 0.125)
    res = _acquire_from_file(p)
    acq_mask = np.asarray(res.acquired)
    assert acq_mask.sum() >= 4
    dop = np.asarray(res.doppler_hz)
    for t in truths_m:
        if acq_mask[t.prn - 1]:
            assert abs(dop[t.prn - 1] - t.doppler_hz) < 150.0, \
                (t.prn, float(dop[t.prn - 1]), t.doppler_hz)


def test_threshold_override_plumbs_into_config():
    class A:
        threshold_db = 9.5
    cfg = cli._config_with_overrides(A())
    assert cfg.detector.power_rise_db == 9.5
    assert CFG.detector.power_rise_db == 6.0     # default untouched


def test_detect_per_system_sample_rate(tmp_path):
    """analyze_capture resolves the per-system front-end rate (10 MS/s
    GLONASS, sdrinit.c:6-9) and honors an explicit override — event byte
    ranges scale with the true rate."""
    from gps_jamming_tpu.runtime import pipeline
    fs10 = 10e6
    n = 8 * 32768
    rng = np.random.default_rng(0)
    x = (rng.normal(0, 2.0, n) + 1j * rng.normal(0, 2.0, n)).astype(
        np.complex64)
    # hot middle chunk -> one F1 range
    x[3 * 32768: 5 * 32768] *= 8.0
    p = str(tmp_path / "g.bin")
    iq.write_iq_file(p, x * 10.0)
    res = pipeline.analyze_capture([p], run_receiver=False, localize=False,
                                   system="glonass")
    assert res.power_ranges, "power pre-scan missed the hot window"
    # frames are 100 ms -> at 10 MS/s this capture is ~26 ms => 0 frames,
    # while a (wrong) 2.048 MS/s read would span ~128 ms => >0 frames
    assert len(np.asarray(res.flags_trace["f1"])) == 0
    res2 = pipeline.analyze_capture([p], run_receiver=False, localize=False,
                                    system="glonass", sample_rate=2.048e6)
    assert len(np.asarray(res2.flags_trace["f1"])) >= 1


def test_hold_filter_substitution():
    """analyze_capture(hold=True) reports the held position on >1 deg
    jumps — sdrout.c:141-183 semantics (reference -h flag)."""
    from gps_jamming_tpu.runtime import telemetry
    f = telemetry.HoldPositionFilter()
    lat, lon, hgt, held = f.apply(50.0, 19.9, 200.0)
    assert not held
    lat, lon, hgt, held = f.apply(52.5, 19.9, 200.0)   # jump > 1 deg
    assert held and lat == 50.0 and lon == 19.9 and hgt == 200.0
