"""Closed-loop Galileo E1B + GLONASS L1OF receiver tests.

The multi-constellation twins of test_receiver_e2e: geometry-true
simulated captures -> acquire -> track -> decode -> PVT, asserted against
ground truth. Parity role: the reference's -a (Galileo) / -l (GLONASS)
gnssdec modes (sdrmain.c:37-55, sdrnav_gal.c, sdrnav_glo.c).
"""
import numpy as np
import pytest

from gps_jamming_tpu.models.receiver import glonass as glo
from gps_jamming_tpu.models.receiver import lnav, pvt, receiver
from gps_jamming_tpu.sim import constellation
from gps_jamming_tpu.utils import constants as C

RX_LLA = (50.06, 19.94, 219.0)
TOE = 345600.0
GAL_FS = 4.096e6               # >= 2 samples per BOC half-chip
GLO_FS = 4.0e6                 # test rate; channels -2..2 fit the band


def _gal_shell(n=24):
    """24-satellite Keplerian shell (E1 shares the GPS orbit math)."""
    ephs = []
    for k in range(n):
        ephs.append(lnav.Ephemeris(
            prn=k + 1, week=1340, toc=TOE, af0=(k - 12) * 2e-6,
            af1=0.0, af2=0.0, tgd=0.0, iodc=100 + k, ura=1, health=0,
            iode=100 + k, toe=TOE, sqrt_a=np.sqrt(29_600_000.0),
            e=0.0003, m0=2.0 * np.pi * k / n,
            delta_n=3e-9, omega0=2.0 * np.pi * (k % 6) / 6.0,
            omega_dot=-5.6e-9, omega=0.25 * k, i0=0.975, idot=-2e-10,
            cuc=0.0, cus=0.0, crc=0.0, crs=0.0, cic=0.0, cis=0.0,
            have_subframes=(1, 2, 3, 4, 5)))
    return ephs


def _glo_shell(t0: float, tb: float):
    """Five GLONASS satellites on distinct FDMA channels -2..2, placed at
    spread az/el from the receiver at orbit radius, circular-speed
    tangential velocities. Both sim and receiver extrapolate the SAME
    broadcast state with the same RK4 force model, so the geometry closes
    regardless of long-term orbital realism."""
    r_orb = 25_508_000.0
    rx = pvt.lla_to_ecef(*RX_LLA)
    lat, lon = np.deg2rad(RX_LLA[0]), np.deg2rad(RX_LLA[1])
    # ENU basis at rx
    e_hat = np.array([-np.sin(lon), np.cos(lon), 0.0])
    n_hat = np.array([-np.sin(lat) * np.cos(lon),
                      -np.sin(lat) * np.sin(lon), np.cos(lat)])
    u_hat = np.array([np.cos(lat) * np.cos(lon),
                      np.cos(lat) * np.sin(lon), np.sin(lat)])
    sats = []
    geom = [(0.0, 65.0), (85.0, 40.0), (170.0, 55.0), (255.0, 35.0),
            (320.0, 70.0)]
    for i, (az_d, el_d) in enumerate(geom):
        az, el = np.deg2rad(az_d), np.deg2rad(el_d)
        ray = (np.sin(az) * np.cos(el) * e_hat
               + np.cos(az) * np.cos(el) * n_hat + np.sin(el) * u_hat)
        # |rx + d*ray| = r_orb
        b = 2.0 * rx.dot(ray)
        c0 = rx.dot(rx) - r_orb ** 2
        d = (-b + np.sqrt(b * b - 4 * c0)) / 2.0
        pos = rx + d * ray
        v_circ = np.sqrt(3.986e14 / r_orb)
        t1 = np.cross(pos, [0.0, 0.0, 1.0])
        t1 /= np.linalg.norm(t1)
        t2 = np.cross(pos / np.linalg.norm(pos), t1)
        ang = 0.7 * i
        vel = v_circ * (np.cos(ang) * t1 + np.sin(ang) * t2)
        sats.append(glo.GloEphemeris(
            freq_ch=i - 2, tb_s=tb, tk_s=0.0,
            pos_m=tuple(pos), vel_mps=tuple(vel),
            acc_mps2=(0.0, 0.0, 0.0),
            tau_s=(i - 2) * 4e-6, gamma=0.0))
    return sats


@pytest.mark.slow
def test_galileo_sim_acquisition_matches_truth():
    tow0 = TOE + 30.0
    n = int(0.08 * GAL_FS)
    iq, truths, _ = constellation.simulate_galileo_constellation(
        _gal_shell(), RX_LLA, tow0, n, GAL_FS, noise_std=0.3, seed=1)
    assert len(truths) >= 4
    from gps_jamming_tpu.config import AcquisitionConfig
    from gps_jamming_tpu.models.receiver import acquisition as acq_mod
    from gps_jamming_tpu.models.receiver import galileo as gal
    from gps_jamming_tpu.ops import cplx
    n_code = int(GAL_FS * gal.PERIOD_S)
    cfg = AcquisitionConfig(n_integration=4)
    xp = cplx.from_complex(iq.astype(np.complex64))
    blocks = cplx.apply(
        lambda a: a[: cfg.n_integration * n_code].reshape(-1, n_code), xp)
    rep = gal.replica_table_host(GAL_FS, n_code)
    res = acq_mod.acquire_all(blocks, rep, GAL_FS, cfg,
                              code_period_s=gal.PERIOD_S,
                              code_len_chips=gal.BOC_LEN)
    acq = np.asarray(res.acquired)
    dopp = np.asarray(res.doppler_hz)
    for t in truths:
        i = t.prn - 1
        assert acq[i], f"PRN {t.prn} not acquired"
        assert abs(dopp[i] - t.doppler_hz) <= 150.0, (t.prn, dopp[i],
                                                      t.doppler_hz)


def test_glonass_sim_acquisition_matches_truth():
    t0 = 27030.0
    sats = _glo_shell(t0, tb=27000.0)
    n = int(0.02 * GLO_FS)
    iq, truths, _ = constellation.simulate_glonass_constellation(
        sats, RX_LLA, t0, n, GLO_FS, noise_std=0.3, seed=3)
    assert len(truths) == 5
    from gps_jamming_tpu.config import AcquisitionConfig
    from gps_jamming_tpu.ops import cplx
    n_code = int(GLO_FS * 1e-3)
    cfg = AcquisitionConfig(n_integration=4)
    xp = cplx.from_complex(iq.astype(np.complex64))
    blocks = cplx.apply(
        lambda a: a[: cfg.n_integration * n_code].reshape(-1, n_code), xp)
    res = glo.acquire_all(blocks, GLO_FS, cfg)
    acq = np.asarray(res.acquired)
    dopp = np.asarray(res.doppler_hz)
    chans = list(glo.FREQ_CHANNELS)
    for t in truths:
        i = chans.index(t.prn)           # prn field = freq_ch
        assert acq[i], f"freq_ch {t.prn} not acquired"
        assert abs(dopp[i] - t.doppler_hz) <= 150.0, (t.prn, dopp[i],
                                                      t.doppler_hz)


@pytest.mark.slow
def test_galileo_full_receiver_position_fix():
    """13 s E1B capture -> I/NAV decode -> PVT fix within 30 m."""
    tow0 = TOE - 1.3
    n = int(13.0 * GAL_FS)
    iq, truths, rx_ecef = constellation.simulate_galileo_constellation(
        _gal_shell(), RX_LLA, tow0, n, GAL_FS, noise_std=0.4, seed=2)
    assert len(truths) >= 4
    res = receiver.run_receiver(iq.astype(np.complex64), GAL_FS,
                                system="galileo", skip_epochs=150)
    tracked = [c for c in res.channels if c.obs is not None]
    assert len(tracked) >= 4, [c.prn for c in res.channels if c.acquired]
    by_prn = {e.prn: e for e in _gal_shell()}
    for c in tracked:
        truth_e = by_prn[c.prn]
        assert c.obs.eph.iode == truth_e.iode
        assert abs(c.obs.eph.sqrt_a - truth_e.sqrt_a) < 1e-3
    fix = res.best_fix
    assert fix is not None, "no valid PVT fix"
    err = np.linalg.norm(fix.pos_ecef - rx_ecef)
    assert err < 30.0, (err, fix.lat_deg, fix.lon_deg, fix.height_m)


@pytest.mark.slow
def test_glonass_full_receiver_position_fix():
    """11 s L1OF capture -> GNAV decode -> PVT fix within 40 m."""
    t0 = 27030.0
    sats = _glo_shell(t0, tb=27000.0)
    n = int(11.0 * GLO_FS)
    iq, truths, rx_ecef = constellation.simulate_glonass_constellation(
        sats, RX_LLA, t0, n, GLO_FS, noise_std=0.4, seed=4)
    assert len(truths) == 5
    res = receiver.run_receiver(iq.astype(np.complex64), GLO_FS,
                                system="glonass", skip_epochs=600)
    tracked = [c for c in res.channels if c.obs is not None]
    assert len(tracked) >= 4, [c.prn for c in res.channels if c.acquired]
    fix = res.best_fix
    assert fix is not None, "no valid PVT fix"
    err = np.linalg.norm(fix.pos_ecef - rx_ecef)
    assert err < 40.0, (err, fix.lat_deg, fix.lon_deg, fix.height_m)
