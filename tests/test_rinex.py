"""RINEX 2 nav reader/writer + GPS time conversion tests."""
import os

import numpy as np
import pytest

from gps_jamming_tpu.models.receiver import lnav
from gps_jamming_tpu.utils import gpstime, rinex

REF_NAV = "/root/reference/data/sim_data/brdc2830.25n"


def test_gps_time_roundtrip():
    week, tow = gpstime.calendar_to_week_tow(2025, 10, 10, 0, 0, 0.0)
    assert week == 2387 and tow == 432000.0      # known epoch of brdc2830
    t = gpstime.week_tow_to_calendar(week, tow)
    assert (t.year, t.month, t.day) == (2025, 10, 10)
    assert gpstime.leap_seconds(t) == 18
    assert gpstime.adjust_week_rollover(2387 % 1024, 2400) == 2387


def test_write_read_roundtrip(tmp_path):
    eph = lnav.Ephemeris(
        prn=7, week=2387, toc=432000.0, toe=432000.0, iode=91, iodc=91,
        af0=-5.44e-5, af1=8.75e-12, af2=0.0, tgd=-1.77e-8, ura=1, health=0,
        sqrt_a=5153.65, e=0.0166, m0=0.7097, delta_n=4.73e-9,
        omega0=-0.678, omega_dot=-8.66e-9, omega=-0.921, i0=0.9646,
        idot=-4.0e-10, cuc=-4.28e-6, cus=1.92e-6, crc=346.3, crs=-71.5,
        cic=1.19e-7, cis=-2.46e-7, have_subframes=(1, 2, 3))
    path = str(tmp_path / "t.25n")
    rinex.write_nav(path, [eph])
    back = rinex.read_nav(path)
    assert len(back) == 1
    b = back[0]
    for f in ("prn", "week", "iode", "iodc", "ura", "health"):
        assert getattr(b, f) == getattr(eph, f), f
    for f in ("toc", "toe", "af0", "af1", "sqrt_a", "e", "m0", "delta_n",
              "omega0", "omega_dot", "omega", "i0", "idot", "cuc", "cus",
              "crc", "crs", "cic", "cis", "tgd"):
        assert np.isclose(getattr(b, f), getattr(eph, f),
                          rtol=1e-11, atol=1e-30), f


@pytest.mark.skipif(not os.path.exists(REF_NAV),
                    reason="reference corpus not mounted")
def test_parse_reference_brdc():
    """The actual IGS broadcast file the reference ships feeds our Kepler
    solver: sane orbits (|r| ~ 26,560 km) for every record."""
    from gps_jamming_tpu.models.receiver import ephemeris as eph_mod
    ephs = rinex.read_nav(REF_NAV)
    assert len(ephs) >= 25
    assert all(1 <= e.prn <= 32 for e in ephs)
    assert all(e.week == 2387 for e in ephs[:5])
    batch = eph_mod.stack_ephemeris(ephs[:8])
    pos, clk = eph_mod.sat_pos_clock(batch,
                                     np.full(8, ephs[0].toe + 60.0))
    r = np.linalg.norm(pos, axis=-1)
    assert np.all((r > 2.5e7) & (r < 2.8e7)), r
    assert np.all(np.abs(clk) < 1e-2)


@pytest.mark.skipif(not os.path.exists(REF_NAV),
                    reason="reference corpus not mounted")
def test_parse_reference_fake_prn_variants():
    """The spoof-ephemeris corpus (`data/sim_data/*_fake_PRN.25n`, mode C
    inputs) parses too, and each variant actually differs from the legit
    broadcast for at least one shared PRN (that's the spoof)."""
    legit = {e.prn: e for e in rinex.read_nav(REF_NAV)}
    base = os.path.dirname(REF_NAV)
    for k in (2, 3, 4):
        p = os.path.join(base, f"{k}_fake_PRN.25n")
        if not os.path.exists(p):
            continue
        fakes = rinex.read_nav(p)
        assert len(fakes) >= 10          # the fake files are PRN subsets
        diff = sum(
            1 for e in fakes
            if e.prn in legit and not np.isclose(e.m0, legit[e.prn].m0))
        assert diff >= 1, f"{k}_fake_PRN.25n identical to brdc?"


@pytest.mark.skipif(not os.path.exists(REF_NAV),
                    reason="reference corpus not mounted")
def test_acquisition_on_reference_ephemeris_render():
    """Signal-level real-ephemeris parity: a capture rendered from the
    reference's actual IGS broadcast file (the gps-sdr-sim -e input,
    README.md:40-47) is acquirable, with Doppler matching the real-orbit
    truths — not just a self-consistent synthetic shell."""
    import jax.numpy as jnp

    from gps_jamming_tpu.config import DEFAULT_CONFIG as CFG
    from gps_jamming_tpu.models.receiver import acquisition as acq
    from gps_jamming_tpu.ops import cplx
    from gps_jamming_tpu.sim import constellation

    FS = 2.048e6
    ephs = rinex.read_nav(REF_NAV)
    tow0 = ephs[0].toe + 120.0
    n = 12 * 2048
    sig, truths, _ = constellation.simulate_constellation(
        ephs, (50.06, 19.94, 219.0), tow0, n, FS, noise_std=0.5, seed=2)
    assert len(truths) >= 6, "too few visible satellites from real orbits"

    blocks = cplx.from_complex(
        jnp.asarray(sig[: 10 * 2048].astype(np.complex64))
    ).reshape(10, 2048)
    res = acq.acquire_all(blocks, acq.gps_replica_table_host(FS, 2048),
                          FS, CFG.acquisition)
    mask = np.asarray(res.acquired)
    dop = np.asarray(res.doppler_hz)
    n_hit = 0
    for t in truths:
        if mask[t.prn - 1]:
            assert abs(dop[t.prn - 1] - t.doppler_hz) < 150.0, \
                (t.prn, float(dop[t.prn - 1]), t.doppler_hz)
            n_hit += 1
    assert n_hit >= 4, f"only {n_hit} real-ephemeris PRNs acquired"
