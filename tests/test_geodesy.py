"""Geodesy ops vs closed-form / reference oracles."""
import numpy as np
import jax.numpy as jnp

from gps_jamming_tpu.ops import geodesy, interp, pathloss


def test_lla_ecef_roundtrip():
    lat, lon, alt = 50.00898, 19.98287, 219.0
    x, y, z = geodesy.lla_to_ecef(lat, lon, alt)
    la, lo, h = geodesy.ecef_to_lla(x, y, z)
    assert abs(float(la) - lat) < 1e-5
    assert abs(float(lo) - lon) < 1e-5
    assert abs(float(h) - alt) < 1.0   # float32 ECEF limits height precision


def test_known_ecef_point():
    # equator / prime meridian at 0 height
    x, y, z = geodesy.lla_to_ecef(0.0, 0.0, 0.0)
    np.testing.assert_allclose(float(x), 6378137.0, rtol=1e-6)
    assert abs(float(y)) < 1.0 and abs(float(z)) < 1.0


def test_topocentric_zenith_and_horizon():
    obs = jnp.asarray(geodesy.lla_to_ecef(45.0, 10.0, 0.0))
    obs = jnp.stack([obs[0], obs[1], obs[2]])
    # straight up = along the position vector (spherical approx error ~0.2 deg)
    up = obs / jnp.linalg.norm(obs)
    az, el, d = geodesy.topocentric(obs, up * 1000.0)
    assert float(el) > 89.0 or abs(float(el) - 90) < 1.0
    np.testing.assert_allclose(float(d), 1000.0, rtol=1e-3)


def test_meters_degrees_roundtrip():
    dlat, dlon = geodesy.meters_to_degrees(100.0, 200.0, 50.0)
    np.testing.assert_allclose(float(dlat), 200.0 / 111320.0, rtol=1e-6)
    np.testing.assert_allclose(
        float(dlon), 100.0 / (111320.0 * np.cos(np.radians(50.0))), rtol=1e-6)
    dx, dy = geodesy.degrees_to_meters(dlat, dlon, 50.0)
    np.testing.assert_allclose(float(dx), 100.0, rtol=1e-5)
    np.testing.assert_allclose(float(dy), 200.0, rtol=1e-5)


def test_haversine_known_distance():
    # 1 degree of latitude ~ 111.2 km
    d = float(geodesy.haversine_m(50.0, 20.0, 51.0, 20.0))
    assert abs(d - 111_195) < 200


def test_pathloss_roundtrip():
    for dist in (5.0, 50.0, 500.0):
        prx = pathloss.forward_received_db(dist, 40.0, 3.0, 1575.42)
        back = float(pathloss.invert_distance_m(prx, 40.0, 3.0, 1575.42))
        np.testing.assert_allclose(back, dist, rtol=1e-5)


def test_pathloss_1m_constant():
    np.testing.assert_allclose(
        float(pathloss.path_loss_at_1m_db(1575.42)),
        20 * np.log10(1575.42) - 27.55, rtol=1e-7)


def test_lagrange_matches_polynomial():
    x = jnp.asarray(np.array([0.0, 1.0, 2.0, 3.0]))
    y = 2.0 * x ** 3 - x + 1.0         # cubic: exactly representable
    got = float(interp.lagrange_interp(x, y, 1.5))
    want = 2.0 * 1.5 ** 3 - 1.5 + 1.0
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_lagrange_batched_queries():
    x = jnp.asarray(np.array([0.0, 1.0, 2.0]))
    y = x ** 2
    got = np.asarray(interp.lagrange_interp(x, y, jnp.asarray([0.5, 1.5])))
    np.testing.assert_allclose(got, [0.25, 2.25], rtol=1e-5)
