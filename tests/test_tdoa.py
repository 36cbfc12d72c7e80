"""TDOA localization: lag recovery, bearing math, hyperbolic fix."""
import numpy as np
import jax.numpy as jnp

from gps_jamming_tpu.config import TdoaConfig
from gps_jamming_tpu.models import tdoa
from gps_jamming_tpu.utils import constants as C

FS = 2.048e6
CFG = TdoaConfig(noise_sample_size=50_000, correlation_slice_size=20_000)


def _two_antenna_captures(rng, delay_samples: float, n=300_000, onset=120_000):
    """Common broadband interference arriving delayed at antenna 1."""
    sig = (rng.standard_normal(n + 64) + 1j * rng.standard_normal(n + 64)).astype(np.complex64)
    # fractional delay via frequency-domain phase ramp
    f = np.fft.fftfreq(n + 64)
    delayed = np.fft.ifft(np.fft.fft(sig) * np.exp(-2j * np.pi * f * delay_samples))
    noise0 = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    noise1 = 0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    x0 = noise0.astype(np.complex64)
    x1 = noise1.astype(np.complex64)
    x0[onset:] += 10 * sig[:n - onset]
    x1[onset:] += 10 * delayed[:n - onset].astype(np.complex64)
    return jnp.asarray(x0), jnp.asarray(x1)


def test_integer_lag_recovery(rng):
    x0, x1 = _two_antenna_captures(rng, delay_samples=5.0)
    slices, onsets = tdoa.aligned_slices([x0, x1], CFG)
    lag = float(tdoa.pair_lags(slices, CFG)[0])
    # onset alignment may absorb the bulk delay; total = lag + onset diff
    total = lag + (onsets[1] - onsets[0])
    assert abs(total - 5.0) < 0.6


def test_subsample_lag(rng):
    x0, x1 = _two_antenna_captures(rng, delay_samples=3.37)
    slices, onsets = tdoa.aligned_slices([x0, x1], CFG)
    lag = float(tdoa.pair_lags(slices, CFG)[0])
    total = lag + (onsets[1] - onsets[0])
    assert abs(total - 3.37) < 0.25


def test_bearing_math_contract():
    # path difference = baseline -> theta = 0 -> both azimuths = baseline angle
    baseline = 0.5
    lag = baseline / C.SPEED_OF_LIGHT * FS
    r = tdoa.bearing_from_lag(lag, FS, (0.0, 0.0), (0.5, 0.0))
    assert r["valid"]
    assert abs(r["theta_deg"]) < 1e-3
    assert abs(r["azimuths_deg"][0] - 0.0) < 1e-3
    # perpendicular arrival: zero lag -> theta 90
    r = tdoa.bearing_from_lag(0.0, FS, (0.0, 0.0), (0.5, 0.0))
    assert abs(r["theta_deg"] - 90.0) < 1e-6
    assert set(np.round(r["azimuths_deg"], 3)) == {90.0, 270.0}


def test_bearing_invalid_when_exceeds_baseline():
    r = tdoa.bearing_from_lag(1000.0, FS, (0.0, 0.0), (0.5, 0.0))
    assert not r["valid"]


def test_hyperbolic_grid_fix_exact():
    ants = [(0.0, 0.0), (30.0, 0.0), (0.0, 30.0)]
    true = np.array([10.0, 18.0])
    d = [np.linalg.norm(true - np.array(a)) for a in ants]
    pairs = [(0, 1), (0, 2), (1, 2)]
    pds = [d[j] - d[i] for i, j in pairs]
    fix = tdoa.hyperbolic_grid_fix(ants, pairs, pds, span_m=40.0, density=800)
    assert np.linalg.norm(fix - true) < 0.2


def test_localize_end_to_end():
    """3 antennas, geometric delays from a known source, meter-scale array.

    Uses a private generator (not the shared session `rng`): the pair
    validity check is a one-sample-margin decision at this baseline, so the
    fixture's draw position (which depends on which tests ran before)
    must not pick the noise realization.
    """
    rng = np.random.default_rng(1234)
    ants = [(0.0, 0.0), (60.0, 0.0), (0.0, 60.0)]
    true = np.array([40.0, 25.0])
    d = [np.linalg.norm(true - np.array(a)) for a in ants]
    # per-antenna absolute delay in samples (relative to antenna 0)
    delays = [(di - d[0]) / C.SPEED_OF_LIGHT * FS for di in d]

    n = 300_000
    onset = 120_000
    base = (rng.standard_normal(n + 128) + 1j * rng.standard_normal(n + 128)).astype(np.complex64)
    f = np.fft.fftfreq(n + 128)
    caps = []
    for dl in delays:
        delayed = np.fft.ifft(np.fft.fft(base) * np.exp(-2j * np.pi * f * dl))
        x = (0.05 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(np.complex64)
        x[onset:] += 10 * delayed[:n - onset].astype(np.complex64)
        caps.append(jnp.asarray(x))

    res = tdoa.localize(caps, ants, FS, CFG)
    assert all(p["valid"] for p in res["pairs"])
    # NOTE: onset alignment subtracts the coarse delay; at 2.048 MS/s one
    # sample = 146 m, so the per-pair path differences carry that
    # quantization. The hyperbolic fix should still land within a few
    # hundred meters — here we check the pairs report finite values and the
    # pipeline runs; accuracy is exercised by test_hyperbolic_grid_fix_exact.
    assert res["position_m"] is not None
