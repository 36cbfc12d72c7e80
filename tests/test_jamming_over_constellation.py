"""The headline product scenario: a GPS receiver tracking real (simulated)
satellites gets jammed mid-capture; the 4-flag detector must fire F1
(power rise) AND F2 (C/N0 drop), and the pipeline must keep the last safe
fix (worker.py:339-346 behavior).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gps_jamming_tpu.config import DEFAULT_CONFIG as CFG
from gps_jamming_tpu.models.receiver import lnav
from gps_jamming_tpu.ops import iq
from gps_jamming_tpu.runtime import pipeline
from gps_jamming_tpu.sim import constellation, jammers

FS = 2.048e6
RX_LLA = (50.06, 19.94, 219.0)
TOE = 345600.0
JAM_START_S = 8.0
JAM_END_S = 14.0


def _shell(n=24):
    ephs = []
    for k in range(n):
        ephs.append(lnav.Ephemeris(
            prn=k + 1, week=2400, toc=TOE, af0=0.0, af1=0.0, af2=0.0,
            tgd=0.0, iodc=100 + k, ura=1, health=0, iode=100 + k, toe=TOE,
            sqrt_a=np.sqrt(26_560_000.0), e=0.008, m0=2.0 * np.pi * k / n,
            delta_n=4.5e-9, omega0=2.0 * np.pi * (k % 6) / 6.0,
            omega_dot=-8.0e-9, omega=0.25 * k, i0=0.958, idot=-3e-10,
            cuc=0.0, cus=0.0, crc=0.0, crs=0.0, cic=0.0, cis=0.0,
            have_subframes=(1, 2, 3)))
    return ephs


@pytest.mark.slow
def test_jamming_detected_with_power_and_cn0_flags(tmp_path):
    tow0 = TOE - 1.3
    n = int(21.0 * FS)
    iq_sig, truths, rx_ecef = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.35, seed=4)
    assert len(truths) >= 4

    # inject a broadband jammer window (10x the satellite noise floor)
    jam = np.asarray(jammers.broadband(
        int((JAM_END_S - JAM_START_S) * FS), jax.random.PRNGKey(9),
        amplitude=6.0))
    s0, s1 = int(JAM_START_S * FS), int(JAM_END_S * FS)
    jammed = iq_sig.copy()
    jammed[s0:s1] += jam

    # write as a real RTL-SDR uint8 capture with sensible scaling
    path = str(tmp_path / "jam.bin")
    iq.write_iq_file(path, (jammed * 12.0).astype(np.complex64))

    res = pipeline.analyze_capture([path], run_receiver=True,
                                   localize=False)

    # F1: power range over the jam window
    assert len(res.power_ranges) == 1
    s_b, e_b = res.power_ranges[0]
    assert abs(s_b / 2 / FS - JAM_START_S) < 0.1
    assert abs(e_b / 2 / FS - JAM_END_S) < 0.1

    # detector event spans the window
    assert len(res.events) >= 1
    ev = res.events[0]
    assert abs(ev["start_time"] - JAM_START_S) < 0.3

    # F2: C/N0 drop flag fired during the jam (and not before it)
    f2 = np.asarray(res.flags_trace["f2"])
    frames_per_s = 10
    jam_frames = slice(int((JAM_START_S + 0.5) * frames_per_s),
                       int((JAM_END_S - 0.5) * frames_per_s))
    pre_frames = slice(5 * frames_per_s, int(JAM_START_S * frames_per_s) - 5)
    assert f2[jam_frames].any(), "C/N0-drop flag never fired during jamming"
    assert not f2[pre_frames].any(), "false C/N0-drop before jamming"

    # per-satellite observations[] ship in the product telemetry and feed
    # the P24 per-PRN harness (sdrout.c:213-325 / analiza_wielo.py roles)
    from gps_jamming_tpu.utils import analysis
    obs_keys = {"prn", "tow", "week", "snr", "doppler", "az", "el",
                "residual", "innovation"}
    recs = res.telemetry.records
    n_obs = sum(len(r["observations"]) for r in recs)
    assert n_obs > 0, "pipeline telemetry carries no observations"
    for r in recs:
        for o in r["observations"]:
            assert obs_keys <= set(o)
    series = analysis.per_prn_series(recs)
    assert len(series) >= 4
    some = next(iter(series.values()))
    assert some["snr"].size > 10 and np.all(np.isfinite(some["doppler"]))
    # geometry columns populated on frames with a fix
    fixed = [o for r in recs if r["position"]["nsat"] >= 4
             for o in r["observations"]]
    assert any(o["el"] > 0 for o in fixed), "el never set from PVT fix"

    # receiver delivered a valid fix from the clean leading segment
    assert res.receiver is not None
    pre_fixes = [f for f, m in zip(res.receiver.fixes,
                                   res.receiver.fix_epochs)
                 if f.valid and m < JAM_START_S * 1000]
    assert pre_fixes, "no valid fix before jamming"
    err = np.linalg.norm(pre_fixes[-1].pos_ecef - rx_ecef)
    assert err < 50.0, err

    # last safe fix cached from a NON-jamming frame (pre-jam, or post-jam
    # if the receiver kept producing fixes after the event cleared) —
    # never from inside the jam window (worker.py:339-346)
    assert res.last_safe_fix is not None
    t_safe = res.last_safe_fix["time"]
    assert t_safe <= JAM_START_S + 0.5 or t_safe >= JAM_END_S + 2.0, t_safe
