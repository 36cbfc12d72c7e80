"""Log-distance path-loss model and inversion.

The RSSI ranging math of `skrypty/triangulateRSSI.py:54-82` and
`skrypty/CalculateDistance.py:42-51`:
  PL(1m) = 20*log10(f_MHz) - 27.55
  d = 10^((Ptx - Prx - PL(1m)) / (10*n))
"""
from __future__ import annotations

import jax.numpy as jnp


def path_loss_at_1m_db(frequency_mhz: float):
    """Free-space path loss at 1 m for f in MHz (triangulateRSSI.py:74)."""
    return 20.0 * jnp.log10(frequency_mhz) - 27.55


def received_power_db(mean_amplitude):
    """Prx = 10*log10(amplitude^2) in the digital scale (triangulateRSSI.py:70)."""
    return 10.0 * jnp.log10(mean_amplitude ** 2)


def invert_distance_m(received_db, tx_power_dbm: float,
                      path_loss_exponent: float, frequency_mhz: float):
    """Distance from received power via the log-distance model."""
    pl1 = path_loss_at_1m_db(frequency_mhz)
    return 10.0 ** ((tx_power_dbm - received_db - pl1) / (10.0 * path_loss_exponent))


def forward_received_db(distance_m, tx_power_dbm: float,
                        path_loss_exponent: float, frequency_mhz: float):
    """Forward model (for simulation / tests): Prx at a given distance."""
    pl1 = path_loss_at_1m_db(frequency_mhz)
    return tx_power_dbm - pl1 - 10.0 * path_loss_exponent * jnp.log10(distance_m)
