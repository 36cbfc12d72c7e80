"""Receiver trajectory generation.

Library equivalent of `simulate/frontend/generate_trajectory.py:22-58`:
linear LLA interpolation sampled at 10 Hz, emitted as (time, x, y, z) ECEF
rows compatible with gps-sdr-sim's `-u` user-motion CSV format.
"""
from __future__ import annotations

import numpy as np

from ..ops import geodesy


def linear_trajectory(start_lla, end_lla, duration_s: float,
                      rate_hz: float = 10.0) -> np.ndarray:
    """Rows (t, x, y, z): linear LLA sweep converted to ECEF."""
    n = int(duration_s * rate_hz) + 1
    f = np.linspace(0.0, 1.0, n)
    lat = start_lla[0] + (end_lla[0] - start_lla[0]) * f
    lon = start_lla[1] + (end_lla[1] - start_lla[1]) * f
    alt = start_lla[2] + (end_lla[2] - start_lla[2]) * f
    x, y, z = geodesy.lla_to_ecef(lat, lon, alt)
    t = np.arange(n) / rate_hz
    return np.stack([t, np.asarray(x), np.asarray(y), np.asarray(z)], axis=1)


def write_user_motion_csv(path: str, rows: np.ndarray) -> None:
    """gps-sdr-sim -u format: time,x,y,z with 1 decimal place times."""
    with open(path, "w") as f:
        for t, x, y, z in rows:
            f.write(f"{t:.1f},{x:.3f},{y:.3f},{z:.3f}\n")


def jammer_distances(rows: np.ndarray, jammer_lla) -> np.ndarray:
    """Per-timestep receiver->jammer distance (add_jammer_and_mix.py:79-88)."""
    jx, jy, jz = geodesy.lla_to_ecef(*jammer_lla)
    d = rows[:, 1:4] - np.array([float(jx), float(jy), float(jz)])
    return np.sqrt((d ** 2).sum(axis=1))
