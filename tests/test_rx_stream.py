"""Streaming receiver tests: health resets, re-acquisition, eph reuse.

The self-healing behaviors of the reference receiver (sdrmain.c:263-340
health checks, resetStructs :417-462): lock lost to mid-capture jamming
frees the channel slots; once the jam clears, slots re-acquire, re-anchor
timing from one subframe, reuse the cached ephemeris, and PVT resumes.
"""
import numpy as np
import pytest

import jax

from gps_jamming_tpu.models.receiver import lnav
from gps_jamming_tpu.runtime import rx_stream
from gps_jamming_tpu.sim import constellation, jammers

FS = 2.048e6
RX_LLA = (50.06, 19.94, 219.0)
TOE = 345600.0
JAM_START_S = 20.0
JAM_END_S = 26.0
TOTAL_S = 39.0


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
def test_streaming_receiver_survives_jam_and_reacquires():
    tow0 = TOE - 1.3
    n = int(TOTAL_S * FS)
    iq_sig, truths, rx_ecef = constellation.simulate_constellation(
        _shell(), RX_LLA, tow0, n, FS, noise_std=0.4, seed=6)
    assert len(truths) >= 4
    # strong enough to crush C/N0 below the 15 dB-Hz health threshold
    jam = np.asarray(jammers.broadband(
        int((JAM_END_S - JAM_START_S) * FS), jax.random.PRNGKey(3),
        amplitude=400.0))
    s0, s1 = int(JAM_START_S * FS), int(JAM_END_S * FS)
    x = iq_sig.copy()
    x[s0:s1] += jam

    rx = rx_stream.StreamingReceiver(FS, system="gps", segment_s=2.0)
    res = rx.process(x.astype(np.complex64))

    ep = np.asarray(res.fix_epochs, np.float64) / 1000.0
    errs = np.array([np.linalg.norm(f.pos_ecef - rx_ecef)
                     for f in res.fixes])
    valid = np.array([f.valid for f in res.fixes])
    pre = valid & (ep < JAM_START_S)
    post = valid & (ep > JAM_END_S + 2.0)
    assert pre.any(), "no valid fix before the jam"
    assert post.any(), ("no valid fix after the jam "
                        "(re-acquisition failed)", ep.tolist())
    assert np.median(errs[pre]) < 30.0, np.median(errs[pre])
    assert np.median(errs[post]) < 30.0, np.median(errs[post])
    # no trustworthy fixes reported from inside the jam window
    mid = valid & (ep > JAM_START_S + 2.0) & (ep < JAM_END_S)
    assert mid.sum() <= 2, f"{mid.sum()} fixes inside the jam window"
