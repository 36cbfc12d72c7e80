"""PVT EKF tests: convergence, smoothing vs WLS, innovations, coasting.

The reference reserves but never implements its EKF (sdrpvt.c:85-88);
these tests pin down the completed filter against synthetic geometry.
"""
import numpy as np
import pytest

from gps_jamming_tpu.models.receiver import pvt
from gps_jamming_tpu.utils import constants as C

RX_LLA = (50.06, 19.94, 219.0)


def _geometry(n_sat=7, seed=0):
    """Satellites at spread az/el on the GPS orbit sphere."""
    rng = np.random.default_rng(seed)
    rx = pvt.lla_to_ecef(*RX_LLA)
    lat, lon = np.deg2rad(RX_LLA[0]), np.deg2rad(RX_LLA[1])
    e_hat = np.array([-np.sin(lon), np.cos(lon), 0.0])
    n_hat = np.array([-np.sin(lat) * np.cos(lon),
                      -np.sin(lat) * np.sin(lon), np.cos(lat)])
    u_hat = np.array([np.cos(lat) * np.cos(lon),
                      np.cos(lat) * np.sin(lon), np.sin(lat)])
    r_orb = 26_560_000.0
    sats = []
    for i in range(n_sat):
        az = 2 * np.pi * i / n_sat
        el = np.deg2rad(25.0 + 45.0 * ((i * 37) % 100) / 100.0)
        ray = (np.sin(az) * np.cos(el) * e_hat
               + np.cos(az) * np.cos(el) * n_hat + np.sin(el) * u_hat)
        b = 2 * rx.dot(ray)
        c0 = rx.dot(rx) - r_orb ** 2
        d = (-b + np.sqrt(b * b - 4 * c0)) / 2
        sats.append(rx + d * ray)
    return rx, np.stack(sats)


def _pr(sat_pos, rx, bias_m, noise, rng):
    rho = np.linalg.norm(sat_pos - rx, axis=-1)
    tau = rho / C.SPEED_OF_LIGHT
    sp = pvt.sagnac_rotate(sat_pos, tau)
    rho = np.linalg.norm(sp - rx, axis=-1)
    return rho + bias_m + rng.normal(0, noise, rho.shape)


def test_ekf_converges_and_smooths():
    rng = np.random.default_rng(1)
    rx, sats = _geometry()
    bias = 150.0
    sol0 = pvt.solve_wls(sats, _pr(sats, rx, bias, 5.0, rng),
                         np.zeros(7), use_tropo=False)
    assert sol0.valid
    ekf = pvt.PvtEkf(use_tropo=False)
    ekf.initialize(sol0)
    wls_errs, ekf_errs = [], []
    for _ in range(60):
        pr = _pr(sats, rx, bias, 5.0, rng)
        sol_w = pvt.solve_wls(sats, pr, np.zeros(7), use_tropo=False)
        sol_e = ekf.step(sats, pr, np.zeros(7), dt_s=0.2)
        assert sol_e.valid
        wls_errs.append(np.linalg.norm(sol_w.pos_ecef - rx))
        ekf_errs.append(np.linalg.norm(sol_e.pos_ecef - rx))
    # steady-state EKF position noise must be well below snapshot WLS
    assert np.mean(ekf_errs[20:]) < 0.6 * np.mean(wls_errs[20:]), \
        (np.mean(ekf_errs[20:]), np.mean(wls_errs[20:]))
    assert abs(ekf.x[6] - bias) < 10.0
    # innovations centred near zero at steady state
    assert abs(np.mean(sol_e.innovations_m)) < 10.0


def test_ekf_coasts_through_outage():
    rng = np.random.default_rng(2)
    rx, sats = _geometry()
    ekf = pvt.PvtEkf(use_tropo=False, max_coast_s=3.0)
    sol0 = pvt.solve_wls(sats, _pr(sats, rx, 0.0, 3.0, rng),
                         np.zeros(7), use_tropo=False)
    ekf.initialize(sol0)
    for _ in range(30):
        ekf.step(sats, _pr(sats, rx, 0.0, 3.0, rng), np.zeros(7), dt_s=0.2)
    # full outage: no satellites pass the mask
    dead = np.zeros(7, bool)
    coasted = [ekf.step(sats, _pr(sats, rx, 0.0, 3.0, rng), np.zeros(7),
                        mask=dead, dt_s=0.2) for _ in range(10)]
    # 2 s of coasting stays valid and within 30 m (stationary receiver)
    assert all(s.valid for s in coasted)
    assert np.linalg.norm(coasted[-1].pos_ecef - rx) < 30.0
    # beyond max_coast_s -> invalid
    for _ in range(10):
        late = ekf.step(sats, _pr(sats, rx, 0.0, 3.0, rng), np.zeros(7),
                        mask=dead, dt_s=0.2)
    assert not late.valid
    # recovery: measurements return, filter snaps back
    for _ in range(10):
        back = ekf.step(sats, _pr(sats, rx, 0.0, 3.0, rng), np.zeros(7),
                        dt_s=0.2)
    assert back.valid and np.linalg.norm(back.pos_ecef - rx) < 15.0


def test_ekf_innovation_gate_rejects_outlier():
    rng = np.random.default_rng(3)
    rx, sats = _geometry()
    ekf = pvt.PvtEkf(use_tropo=False, innovation_gate_m=100.0)
    sol0 = pvt.solve_wls(sats, _pr(sats, rx, 0.0, 3.0, rng),
                         np.zeros(7), use_tropo=False)
    ekf.initialize(sol0)
    for _ in range(20):
        ekf.step(sats, _pr(sats, rx, 0.0, 3.0, rng), np.zeros(7), dt_s=0.2)
    # one satellite jumps by 5 km (spoof/multipath): gated out, fix holds
    pr = _pr(sats, rx, 0.0, 3.0, rng)
    pr[2] += 5000.0
    sol = ekf.step(sats, pr, np.zeros(7), dt_s=0.2)
    assert sol.nsat == 6
    assert abs(sol.innovations_m[2]) > 4000.0
    assert np.linalg.norm(sol.pos_ecef - rx) < 15.0
