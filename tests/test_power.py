"""Power-profile ops vs the reference detector math.

Oracles: worker.py:198-275 (chunk power, percentile baseline, 6 dB threshold,
range extraction), triangulateTDOA.py:37-49 (onset), triangulateRSSI.py:37-40
(first above threshold).
"""
import numpy as np
import jax.numpy as jnp

from gps_jamming_tpu.ops import iq, power


def test_chunk_power_matches_worker(rng):
    n = 8 * 32768
    raw = rng.integers(0, 256, size=2 * n, dtype=np.uint8)
    x = iq.uint8_to_complex(jnp.asarray(raw))
    got = np.asarray(power.chunk_power(x, 32768))
    # reference oracle
    f = raw.astype(np.float32) - 127.5
    i, q = f[0::2], f[1::2]
    want = np.array([np.mean(i[k*32768:(k+1)*32768]**2 + q[k*32768:(k+1)*32768]**2) + 1e-10
                     for k in range(8)])
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_baseline_and_threshold(rng):
    pm = rng.uniform(10, 20, size=200).astype(np.float32)
    pm[50:60] = 500.0
    base = float(power.power_baseline(jnp.asarray(pm), 5.0))
    np.testing.assert_allclose(base, np.percentile(pm, 5), rtol=1e-5)
    thr = float(power.power_threshold_linear(jnp.asarray(base), 6.0))
    np.testing.assert_allclose(thr, base * 10 ** 0.6, rtol=1e-6)


def test_extract_ranges_matches_worker_logic():
    mask = np.array([1, 1, 0, 0, 1, 0, 1, 1, 1, 0, 0, 1], dtype=bool)
    got = power.extract_ranges(mask, chunk_size_bytes=10)
    assert got == [(0, 20), (40, 50), (60, 90), (110, 120)]
    assert power.extract_ranges(np.zeros(5, bool), 10) == []
    assert power.extract_ranges(np.ones(3, bool), 10) == [(0, 30)]


def test_find_onset_matches_tdoa_reference(rng):
    n = 500_000
    noise = 0.1 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))
    sig = noise.astype(np.complex64)
    onset_true = 300_000
    sig[onset_true:] += 10.0
    got = int(power.find_onset(jnp.asarray(sig), 200_000, 1000, 50.0))
    # reference oracle
    p = np.abs(sig) ** 2
    npow = np.mean(p[:200_000])
    mav = np.convolve(p, np.ones(1000) / 1000, mode="valid")
    idxs = np.where(mav > npow * 50.0)[0]
    want = idxs[0] + 500 if len(idxs) else -1
    assert got == want
    assert abs(got - onset_true) < 1500


def test_find_onset_not_found(rng):
    n = 300_000
    sig = (0.1 * (rng.standard_normal(n) + 1j * rng.standard_normal(n))).astype(np.complex64)
    assert int(power.find_onset(jnp.asarray(sig), 200_000, 1000, 50.0)) == -1


def test_first_above_and_mean_after_onset():
    amp = jnp.asarray(np.array([0.0, 0.05, 0.2, 0.5, 0.3], dtype=np.float32))
    idx = int(power.find_first_above(amp, 0.1))
    assert idx == 2
    m = float(power.mean_after_onset(amp, jnp.asarray(idx)))
    np.testing.assert_allclose(m, np.mean([0.2, 0.5, 0.3]), rtol=1e-6)


def test_moving_average_matches_convolve(rng):
    x = rng.standard_normal(10_000).astype(np.float32)
    got = np.asarray(power.moving_average(jnp.asarray(x), 250))
    want = np.convolve(x, np.ones(250) / 250, mode="valid")
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-5)
