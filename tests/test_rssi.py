"""RSSI localization: parity vs a NumPy transcription of the reference grid
search, and end-to-end accuracy on simulated captures (<1 m target)."""
import numpy as np
import jax.numpy as jnp

from gps_jamming_tpu.config import RssiConfig
from gps_jamming_tpu.models import rssi
from gps_jamming_tpu.ops import iq
from gps_jamming_tpu.sim import scenario

CFG = RssiConfig()
FS = 2.048e6


def _ref_grid_search(positions, radii, density=300, mult=1.5):
    positions = np.array(positions)
    radii = np.array(radii)
    max_r = np.max(radii)
    center = np.mean(positions, axis=0)
    span = max_r * mult
    x = np.linspace(center[0] - span, center[0] + span, density)
    y = np.linspace(center[1] - span, center[1] + span, density)
    gx, gy = np.meshgrid(x, y)
    err = np.zeros_like(gx)
    for pos, r in zip(positions, radii):
        err += np.abs(np.sqrt((gx - pos[0]) ** 2 + (gy - pos[1]) ** 2) - r)
    i = np.unravel_index(np.argmin(err), err.shape)
    return np.array([gx[i], gy[i]])


def test_grid_search_matches_reference():
    positions = [(0.0, 0.0), (0.5, 0.0), (0.0, 0.5)]
    radii = [10.0, 9.8, 10.3]
    want = _ref_grid_search(positions, radii)
    got = np.asarray(rssi.grid_search(jnp.asarray(positions, jnp.float32),
                                      jnp.asarray(radii, jnp.float32)))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_grid_search_exact_geometry():
    # consistent radii -> recovers the true point to grid resolution
    true = np.array([3.0, 4.0])
    positions = np.array([(0.0, 0.0), (10.0, 0.0), (0.0, 10.0)])
    radii = np.linalg.norm(positions - true, axis=1)
    got = np.asarray(rssi.grid_search(jnp.asarray(positions, jnp.float32),
                                      jnp.asarray(radii, jnp.float32),
                                      grid_density=600))
    assert np.linalg.norm(got - true) < 0.1


def test_range_from_iq_matches_reference_math(rng):
    # synthetic normalized capture: silence then a known-amplitude signal
    n = 100_000
    amp = 0.3
    x = np.zeros(n, np.complex64)
    x[40_000:] = amp * np.exp(2j * np.pi * 0.01 * np.arange(60_000))
    r = rssi.range_from_iq(jnp.asarray(x), CFG)
    # reference: Prx = 10log10(mean_amp^2); d = 10^((40 - Prx - PL1)/(30))
    prx = 10 * np.log10(amp ** 2)
    pl1 = 20 * np.log10(1575.42) - 27.55
    want = 10 ** ((40.0 - prx - pl1) / 30.0)
    np.testing.assert_allclose(float(r.distance_m), want, rtol=1e-3)
    assert int(r.onset_index) == 40_000


def test_range_no_signal_returns_nan():
    x = jnp.zeros(10_000, jnp.complex64)
    r = rssi.range_from_iq(x, CFG)
    assert np.isnan(float(r.distance_m))


def test_end_to_end_triangulation(tmp_path):
    """Simulated 3-antenna scenario -> localization near ground truth.

    Antenna spacing is meters-scale so the geometry is solvable (the
    reference's default 0.5 m baseline gives a degenerate ring geometry)."""
    true_jam = (4.0, 3.0)
    ants = [(0.0, 0.0), (3.0, 0.0), (0.0, 3.0)]
    scn = scenario.JammerScenario(kind="cw", position_m=true_jam,
                                  start_s=0.02, duration_s=0.25, seed=3)
    n = int(FS * 0.25)
    caps = [scenario.render_antenna_capture(scn, a, n, FS, noise_std=0.5,
                                            antenna_index=i)
            for i, a in enumerate(ants)]
    # normalized convention for the RSSI path
    caps_norm = [jnp.asarray(np.asarray(c) / 127.5) for c in caps]
    res = rssi.triangulate(caps_norm, ants, cfg=CFG)
    assert res["success"], res["message"]
    got = np.array(res["location_meters"])
    err = np.linalg.norm(got - np.array(true_jam))
    assert err < 2.0, f"localization error {err:.2f} m"


def test_triangulate_requires_two():
    res = rssi.triangulate([jnp.zeros(100, jnp.complex64)], None)
    assert not res["success"]


def test_top_k_minima_separation():
    err = np.ones((50, 50), np.float32) * 10
    err[10, 10] = 1.0
    err[10, 11] = 1.1      # within 5 m of the first -> suppressed
    err[40, 40] = 2.0
    xs = jnp.arange(50, dtype=jnp.float32)
    ys = jnp.arange(50, dtype=jnp.float32)
    picked, errs = rssi.top_k_minima(jnp.asarray(err), xs, ys, k=3)
    assert picked.shape[0] >= 2
    np.testing.assert_allclose(picked[0], [10, 10])
    np.testing.assert_allclose(picked[1], [40, 40])
