"""Closed-loop receiver tests on ephemeris-consistent simulated captures.

The full-chain equivalent of the reference's gps-sdr-sim -> gnssdec -> LLA
verification workflow (README.md:84-89, helpers/analyze_position.py), as a
deterministic library test: simulate -> acquire -> track -> decode -> PVT,
assert against ground truth.
"""
import numpy as np
import pytest

from gps_jamming_tpu.config import AcquisitionConfig
from gps_jamming_tpu.models.receiver import acquisition as acq_mod
from gps_jamming_tpu.models.receiver import ephemeris, lnav, pvt, receiver
from gps_jamming_tpu.ops import cplx
from gps_jamming_tpu.sim import constellation
from gps_jamming_tpu.utils import constants as C

FS = 2.048e6
RX_LLA = (50.06, 19.94, 219.0)
TOE = 345600.0


def _shell(n=24):
    """24-satellite shell; visibility filtering happens in the simulator."""
    ephs = []
    for k in range(n):
        ephs.append(lnav.Ephemeris(
            prn=k + 1, week=2400, toc=TOE, af0=(k - 12) * 2e-6,
            af1=0.0, af2=0.0, tgd=0.0, iodc=100 + k, ura=1, health=0,
            iode=100 + k, toe=TOE, sqrt_a=np.sqrt(26_560_000.0),
            e=0.008, m0=2.0 * np.pi * k / n,
            delta_n=4.5e-9, omega0=2.0 * np.pi * (k % 6) / 6.0,
            omega_dot=-8.0e-9, omega=0.25 * k, i0=0.958, idot=-3e-10,
            cuc=0.0, cus=0.0, crc=0.0, crs=0.0, cic=0.0, cis=0.0,
            have_subframes=(1, 2, 3)))
    return ephs


def test_sim_acquisition_matches_truth():
    """Acquisition recovers each simulated satellite's Doppler (within one
    200 Hz bin) and code phase (within 2 samples)."""
    tow0 = TOE + 30.0
    n = int(0.1 * FS)
    iq, truths, _ = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.3, seed=1)
    assert len(truths) >= 4
    n_code = 2048
    cfg = AcquisitionConfig()
    xp = cplx.from_complex(iq.astype(np.complex64))
    blocks = cplx.apply(
        lambda a: a[: cfg.n_integration * n_code].reshape(-1, n_code), xp)
    rep = acq_mod.gps_replica_table_host(FS, n_code)
    res = acq_mod.acquire_all(blocks, rep, FS, cfg)
    acq = np.asarray(res.acquired)
    dopp = np.asarray(res.doppler_hz)
    lag = np.asarray(res.code_phase)
    for t in truths:
        i = t.prn - 1
        assert acq[i], f"PRN {t.prn} not acquired"
        assert abs(dopp[i] - t.doppler_hz) <= 120.0, (t, dopp[i])
        expect_lag = ((C.GPS_CA_CODE_LEN - t.code_phase_chips)
                      * FS / C.GPS_CA_CHIP_RATE_HZ) % n_code
        err = (lag[i] - expect_lag + n_code / 2) % n_code - n_code / 2
        assert abs(err) <= 2.0, (t.prn, lag[i], expect_lag)
    # non-simulated PRNs must NOT be acquired
    sim_prns = {t.prn for t in truths}
    for prn in range(1, 33):
        if prn not in sim_prns:
            assert not acq[prn - 1], f"false acquisition PRN {prn}"


def test_pcf_acquisition_matches_truth_and_std():
    """The post-correlation-FFT search (method='pcf') acquires the same
    constellation as the reference-shaped search, with Doppler on its
    finer grid (max 50 Hz bias interior) and the same code phases."""
    tow0 = TOE + 30.0
    n = int(0.1 * FS)
    iq, truths, _ = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.3, seed=1)
    n_code = 2048
    cfg = AcquisitionConfig()
    xp = cplx.from_complex(iq.astype(np.complex64))
    blocks = cplx.apply(
        lambda a: a[: cfg.n_integration * n_code].reshape(-1, n_code), xp)
    rep = acq_mod.gps_replica_table_host(FS, n_code)
    std = acq_mod.acquire_all(blocks, rep, FS, cfg)
    pcf = acq_mod.acquire_all(blocks, rep, FS, cfg, method="pcf")
    a_std = np.asarray(std.acquired)
    a_pcf = np.asarray(pcf.acquired)
    dopp = np.asarray(pcf.doppler_hz)
    lag_std = np.asarray(std.code_phase)
    lag_pcf = np.asarray(pcf.code_phase)
    sim_prns = {t.prn for t in truths}
    for t in truths:
        i = t.prn - 1
        assert a_pcf[i], f"PRN {t.prn} not acquired by pcf"
        assert abs(dopp[i] - t.doppler_hz) <= 120.0, (t.prn, dopp[i],
                                                      t.doppler_hz)
        err = (int(lag_pcf[i]) - int(lag_std[i]) + n_code // 2) \
            % n_code - n_code // 2
        assert abs(err) <= 1, (t.prn, lag_pcf[i], lag_std[i])
    for prn in range(1, 33):
        if prn not in sim_prns:
            assert not a_pcf[prn - 1], f"pcf false acquisition PRN {prn}"
    # identical acquisition decisions
    assert np.array_equal(a_std, a_pcf)


@pytest.mark.slow
def test_full_receiver_position_fix():
    """The headline closed-loop test: 21 s capture -> 3D fix within 30 m
    of the true position (reference-parity role: gnssdec LLA| output vs
    analyze_position.py ground truth)."""
    tow0 = TOE - 1.3           # pull-in ends just before a subframe start
    n = int(20.8 * FS)
    iq, truths, rx_ecef = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.4, seed=2)
    assert len(truths) >= 4
    res = receiver.run_receiver(iq.astype(np.complex64), FS,
                                skip_epochs=600)
    tracked = [c for c in res.channels if c.obs is not None]
    assert len(tracked) >= 4, [c.prn for c in res.channels if c.acquired]
    decoded = [c for c in tracked if c.obs.eph.complete]
    assert len(decoded) >= 4
    # decoded ephemeris fields match the simulated ones (spot check)
    by_prn = {e.prn: e for e in _shell()}
    for c in decoded:
        truth_e = by_prn[c.prn]
        assert c.obs.eph.iode == truth_e.iode
        assert abs(c.obs.eph.sqrt_a - truth_e.sqrt_a) < 1e-3
    fix = res.best_fix
    assert fix is not None, "no valid PVT fix"
    err = np.linalg.norm(fix.pos_ecef - rx_ecef)
    assert err < 30.0, (err, fix.lat_deg, fix.lon_deg, fix.height_m)
    assert abs(fix.height_m - RX_LLA[2]) < 50.0


def test_receiver_chain_with_pcf_config():
    """The AcquisitionConfig.method knob plumbs the PCF search through the
    full receiver chain: same channels acquired as the std search."""
    tow0 = TOE + 30.0
    n = int(0.12 * FS)
    iq, truths, _ = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.3, seed=4)
    x = iq.astype(np.complex64)
    res_pcf = receiver.run_receiver(
        x, FS, acq_cfg=AcquisitionConfig(method="pcf"), max_channels=6)
    prns_pcf = {c.prn for c in res_pcf.channels if c.acquired}
    sim_prns = {t.prn for t in truths}
    assert len(prns_pcf) >= 4
    assert prns_pcf <= sim_prns, prns_pcf - sim_prns
