"""Spoofing-attack end-to-end test (the reference's Mode C scenario).

A spoofer broadcasting an overpowered, self-consistent constellation for
an impossible position (15 km altitude) captures the receiver; the
4-flag detector's F4 altitude-sanity flag (worker.py:93, :384-386) must
fire. Parity role: simulate/frontend mode C (`spoofer_mixer.py`,
`data/sim_data/*_fake_PRN.25n` fake-ephemeris workflow).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gps_jamming_tpu.models.receiver import lnav
from gps_jamming_tpu.ops import iq
from gps_jamming_tpu.runtime import pipeline
from gps_jamming_tpu.sim import constellation, mix

FS = 2.048e6
TRUE_LLA = (50.06, 19.94, 219.0)
FAKE_LLA = (50.30, 20.20, 15000.0)      # impossible altitude -> F4
TOE = 345600.0


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
def test_spoofed_altitude_fires_f4(tmp_path):
    tow0 = TOE - 1.3
    n = int(20.8 * FS)
    shell = _shell()
    legit, _, _ = constellation.simulate_constellation(
        shell, TRUE_LLA, tow0, n, FS, noise_std=0.0, seed=0)
    spoof, _, fake_ecef = constellation.simulate_constellation(
        shell, FAKE_LLA, tow0, n, FS, noise_std=0.0, seed=0)
    # spoofer already at full 4x power when the receiver cold-starts
    # (capture-from-cold: acquisition itself locks the stronger
    # replicas; start_s=-1 puts the ramp of spoofer_mixer's envelope
    # entirely before sample 0)
    mixed = np.asarray(mix.spoof_mix(
        jnp.asarray(legit.astype(np.complex64)),
        jnp.asarray(spoof.astype(np.complex64)),
        FS, start_s=-1.0, ramp_s=0.5, overpower=4.0))
    rng = np.random.default_rng(11)
    mixed = mixed + (rng.normal(0, 0.4, n) + 1j * rng.normal(0, 0.4, n))

    path = str(tmp_path / "spoof.bin")
    iq.write_iq_file(path, (mixed * 10.0).astype(np.complex64))
    res = pipeline.analyze_capture([path], run_receiver=True,
                                   localize=False)

    # the receiver is captured: its fix is the spoofed position
    fix = res.receiver.best_fix
    assert fix is not None
    assert np.linalg.norm(fix.pos_ecef - fake_ecef) < 100.0, \
        (fix.lat_deg, fix.lon_deg, fix.height_m)
    assert fix.height_m > 10_000.0

    # F4 altitude-sanity flag fired and produced a confirmed event
    f4 = np.asarray(res.flags_trace["f4"])
    assert f4.any(), "altitude flag never fired on a 15 km spoofed fix"
    assert len(res.events) >= 1
    assert any("F4" in str(ev.get("flags", "")) or ev for ev in res.events)
