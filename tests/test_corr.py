"""Correlation kernels vs scipy/numpy oracles (TDOA + acquisition math)."""
import numpy as np
import jax.numpy as jnp
from scipy import signal as ss

from gps_jamming_tpu.ops import corr


def test_xcorr_full_matches_scipy_complex(rng):
    a = (rng.standard_normal(257) + 1j * rng.standard_normal(257)).astype(np.complex64)
    b = (rng.standard_normal(200) + 1j * rng.standard_normal(200)).astype(np.complex64)
    got = np.asarray(corr.xcorr_full(jnp.asarray(a), jnp.asarray(b)))
    want = ss.correlate(a, b, mode="full")
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_known_lag_recovered(rng):
    n = 5000
    base = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    true_lag = 37
    a = np.roll(base, true_lag)        # a[n] = b[n - lag] -> peak at +lag
    lag, _ = corr.xcorr_peak_lag(jnp.asarray(a), jnp.asarray(base), subsample=False)
    assert int(lag) == true_lag


def test_subsample_lag_beats_integer(rng):
    # fractional-delay via frequency-domain shift
    n = 4096
    fs = 1.0
    spec = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    # band-limit to make interpolation well posed
    f = np.fft.fftfreq(n, 1 / fs)
    spec[np.abs(f) > 0.2] = 0
    b = np.fft.ifft(spec).astype(np.complex64)
    true_delay = 12.37
    a = np.fft.ifft(spec * np.exp(-2j * np.pi * f * true_delay)).astype(np.complex64)
    lag_int, _ = corr.xcorr_peak_lag(jnp.asarray(a), jnp.asarray(b), subsample=False)
    lag_sub, _ = corr.xcorr_peak_lag(jnp.asarray(a), jnp.asarray(b), subsample=True)
    assert abs(float(lag_sub) - true_delay) < abs(float(lag_int) - true_delay)
    assert abs(float(lag_sub) - true_delay) < 0.15


def test_circular_correlation_power_matches_numpy(rng):
    n = 2048
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)).astype(np.complex64)
    c = rng.choice([-1.0, 1.0], size=n).astype(np.float32)
    rf = np.conj(np.fft.fft(c)).astype(np.complex64)
    got = np.asarray(corr.circular_correlation_power(jnp.asarray(x), jnp.asarray(rf)))
    want = np.abs(np.fft.ifft(np.fft.fft(x) * np.conj(np.fft.fft(c)))) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=1e-3)


def test_second_peak_exclusion():
    row = np.zeros(100, dtype=np.float32)
    row[30] = 10.0     # main peak
    row[33] = 8.0      # sidelobe inside exclusion window
    row[70] = 5.0      # true second peak
    second = float(corr.second_peak_excluded(jnp.asarray(row), jnp.asarray(30), 5))
    assert second == 5.0
    m = float(corr.mean_excluded(jnp.asarray(row), jnp.asarray(30), 5))
    want = np.sum(row) - 10.0 - 8.0
    np.testing.assert_allclose(m, want / (100 - 11), rtol=1e-5)


def test_exclusion_wraps_circularly():
    row = np.zeros(100, dtype=np.float32)
    row[2] = 10.0
    row[98] = 9.0      # within circular distance 4 of the peak
    row[50] = 1.0
    second = float(corr.second_peak_excluded(jnp.asarray(row), jnp.asarray(2), 5))
    assert second == 1.0
