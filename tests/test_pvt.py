"""Ephemeris (Kepler) + WLS PVT tests against closed-form truths."""
import numpy as np
import pytest

from gps_jamming_tpu.models.receiver import ephemeris, lnav, pvt
from gps_jamming_tpu.utils import constants as C


def _make_eph(m0=0.0, omega0=0.0, omega=0.0, e=0.01, i0=0.958,
              toe=345600.0):
    return lnav.Ephemeris(
        prn=1, week=2400, toc=toe, af0=1e-5, af1=1e-12, af2=0.0,
        tgd=5e-9, toe=toe, sqrt_a=np.sqrt(26_560_000.0), e=e, m0=m0,
        delta_n=4.8e-9, omega0=omega0, omega_dot=-8.0e-9, omega=omega,
        i0=i0, idot=-3e-10, cuc=0.0, cus=0.0, crc=0.0, crs=0.0,
        cic=0.0, cis=0.0, have_subframes=(1, 2, 3))


def _constellation(n=8, toe=345600.0):
    """Spread satellites around the orbit planes."""
    ephs = []
    for k in range(n):
        ephs.append(_make_eph(m0=2.0 * np.pi * k / n,
                              omega0=2.0 * np.pi * (k % 6) / 6.0,
                              omega=0.3 * k, toe=toe))
    return ephemeris.stack_ephemeris(ephs)


def test_kepler_solver():
    m = np.array([0.5, 2.0, -1.3])
    e = np.array([0.01, 0.02, 0.005])
    ek = ephemeris.kepler_anomaly(m, e)
    np.testing.assert_allclose(ek - e * np.sin(ek), m, atol=1e-12)


def test_sat_pos_radius_and_velocity():
    eph = _constellation()
    t = np.full(8, 345600.0 + 100.0)
    pos, clk = ephemeris.sat_pos_clock(eph, t)
    r = np.linalg.norm(pos, axis=-1)
    # orbit radius ~ semi-major axis within eccentricity bounds
    assert np.all(r > 26_560_000.0 * 0.98)
    assert np.all(r < 26_560_000.0 * 1.02)
    # GPS orbital speed ~ 3.87 km/s in inertial; ECEF-frame speed 2.5-5 km/s
    v = ephemeris.sat_velocity(eph, t)
    speed = np.linalg.norm(v, axis=-1)
    assert np.all(speed > 2000.0) and np.all(speed < 6000.0)
    # clock correction: af0 + rel - tgd ~ 1e-5 s scale
    assert np.all(np.abs(clk - 1e-5) < 1e-6)


def test_time_wrap():
    assert ephemeris.time_diff_wrap(1.0, 604799.0) == pytest.approx(2.0)
    assert ephemeris.time_diff_wrap(604799.0, 1.0) == pytest.approx(-2.0)


def test_sagnac_preserves_norm_and_magnitude():
    p = np.array([[26_560_000.0, 0.0, 0.0]])
    tau = np.array([0.070])
    p2 = pvt.sagnac_rotate(p, tau)
    np.testing.assert_allclose(np.linalg.norm(p2), np.linalg.norm(p))
    # rotation by omega*tau ~ 5.1e-6 rad -> ~135 m displacement
    assert 100.0 < np.linalg.norm(p2 - p) < 200.0


def test_tropo_shape():
    el = np.deg2rad(np.array([90.0, 45.0, 30.0, 15.0, 10.0]))
    d = pvt.tropo_goad_goodman(np.sin(el), 100.0)
    assert 2.0 < d[0] < 3.0          # zenith delay ~ 2.4 m
    assert np.all(np.diff(d) > 0)    # grows toward the horizon
    assert 8.0 < d[3] < 12.0         # ~9 m at 15 deg


def test_ecef_lla_roundtrip():
    lat, lon, h = 50.06, 19.94, 219.0
    xyz = pvt.lla_to_ecef(lat, lon, h)
    lat2, lon2, h2 = pvt.ecef_to_lla(xyz)
    assert abs(lat2 - lat) < 1e-6
    assert abs(lon2 - lon) < 1e-6
    assert abs(h2 - h) < 0.01


def _visible_sats(eph, t, rx_ecef, min_el=15.0):
    pos, clk = ephemeris.sat_pos_clock(eph, t)
    d = pos - rx_ecef
    e, n, u = pvt.topocentric(rx_ecef, d)
    el = np.rad2deg(np.arctan2(u, np.hypot(e, n)))
    return pos, clk, el >= min_el


def test_wls_recovers_position_exact():
    """Noise-free pseudoranges -> mm-level fix and exact clock bias."""
    rx = pvt.lla_to_ecef(50.06, 19.94, 219.0)
    eph = _constellation(10)
    t = np.full(10, 345700.0)
    pos, clk, vis = _visible_sats(eph, t, rx)
    assert vis.sum() >= 4, vis.sum()
    bias_true = 8570.0                               # ~28.6 us clock
    rho = np.linalg.norm(pvt.sagnac_rotate(
        pos, (np.linalg.norm(pos - rx, axis=-1) + bias_true)
        / C.SPEED_OF_LIGHT) - rx, axis=-1)
    pr = rho + bias_true - C.SPEED_OF_LIGHT * clk    # receiver sees -c*dt_sv
    sol = pvt.solve_wls(pos, pr, clk, mask=vis, use_tropo=False)
    assert sol.valid
    assert np.linalg.norm(sol.pos_ecef - rx) < 0.01, sol
    assert abs(sol.clock_bias_m - bias_true) < 0.01
    assert np.all(np.abs(sol.residuals_m[vis]) < 0.01)
    assert 0.0 < sol.gdop < 20.0
    assert abs(sol.lat_deg - 50.06) < 1e-6


def test_wls_with_noise_and_weighting():
    """5 m pseudorange noise -> fix within tens of meters; residuals sane."""
    rx = pvt.lla_to_ecef(50.06, 19.94, 219.0)
    n_sat = 24
    eph = _constellation(n_sat)
    t = np.full(n_sat, 345650.0)
    pos, clk, vis = _visible_sats(eph, t, rx)
    assert vis.sum() >= 5
    rng = np.random.default_rng(0)
    rho = np.linalg.norm(pvt.sagnac_rotate(
        pos, np.linalg.norm(pos - rx, axis=-1) / C.SPEED_OF_LIGHT) - rx,
        axis=-1)
    pr = rho - C.SPEED_OF_LIGHT * clk + rng.normal(0.0, 5.0, n_sat)
    sol = pvt.solve_wls(pos, pr, clk, mask=vis, use_tropo=False)
    assert sol.valid
    assert np.linalg.norm(sol.pos_ecef - rx) < 100.0
    assert np.max(np.abs(sol.residuals_m[vis])) < 30.0


def test_precheck_mask():
    ok = pvt.precheck_mask(
        snr_dbhz=[25.0, 10.0, 25.0, 25.0, 25.0],
        week=[2400] * 5, tow_s=[100.0] * 5,
        pr_m=[2.1e7, 2.1e7, -1.0, 2.1e7, 2.1e7],
        eph_complete=[True, True, True, False, True])
    np.testing.assert_array_equal(ok, [True, False, False, False, True])
