"""Ephemeris-consistent GPS capture simulator (geometry-true fixtures).

The reference delegates this to the external `gps-sdr-sim` binary
(simulate/frontend/gnss_frontend.py:961-999, README.md:40-47); here it is a
library so tests can close the full receiver loop deterministically
(SURVEY.md §4 implication): given broadcast ephemerides and a receiver
position, render baseband where per-satellite code phase, carrier phase,
Doppler, and LNAV data bits are all consistent with the geometry — so
acquisition/tracking/decode/PVT can be verified against ground truth.

Signal model, per satellite:
  t_tx(t_rx) = t_gps(t_rx) - rho(t_rx)/c          (transit delay)
  chip(t)    = 1.023e6 * t_tx  (mod 1023)         (code phase)
  bit(t)     = LNAV bit at 50 bps of t_tx
  carrier    = exp(-j*2*pi*fL1*rho(t_rx)/c)       (geometric phase -> Doppler)
rho(t) is evaluated on a coarse grid from the Kepler solver and
quadratically interpolated per sample. Host float64 numpy (fixture
generation, not a hot path).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from ..models.receiver import ephemeris as eph_mod
from ..models.receiver import lnav, pvt
from ..ops import codes as codes_ops
from ..utils import constants as C


@dataclasses.dataclass(frozen=True)
class SatTruth:
    """Ground truth per satellite at capture start (for assertions)."""
    prn: int
    range_m: float
    doppler_hz: float
    code_phase_chips: float    # signal code phase at receiver sample 0
    pseudorange_m: float


def geometric_range(eph: eph_mod.EphArrays, t_gps, rx_ecef: np.ndarray,
                    light_time_iters: int = 2) -> np.ndarray:
    """Range at reception time t_gps: iterate transmit time for light time,
    with Sagnac handled by evaluating the satellite at t-tau and rotating
    (the same physics blsFilter corrects for, sdrpvt.c:240-245)."""
    t_gps = np.asarray(t_gps, np.float64)
    tau = np.full_like(t_gps, 0.075)
    for _ in range(light_time_iters + 1):
        pos, _ = eph_mod.sat_pos_clock(eph, t_gps - tau)
        pos = pvt.sagnac_rotate(pos, tau)
        rho = np.linalg.norm(pos - rx_ecef, axis=-1)
        tau = rho / C.SPEED_OF_LIGHT
    return rho


def render_satellite(eph1: eph_mod.EphArrays, prn: int, rx_ecef: np.ndarray,
                     t0_gps: float, n_samples: int, fs: float,
                     bits: np.ndarray, bits_t0: float,
                     amplitude: float = 1.0,
                     grid_step_s: float = 1.0,
                     out: np.ndarray | None = None,
                     chunk: int = 1 << 21) -> np.ndarray:
    """Render one satellite's complex baseband into `out` (complex128).

    eph1: single-satellite EphArrays (shape-(1,) columns).
    t0_gps: GPS ToW at receiver sample 0.
    bits / bits_t0: LNAV +/-1-valued chips of the data message and the GPS
    time of the first bit's leading edge. Renders in chunks to bound the
    float64 temporaries (the role of the reference's 1 MiB mixer chunks,
    spoofer_mixer.py:11).
    """
    if out is None:
        out = np.zeros(n_samples, dtype=np.complex128)
    # coarse range grid -> quadratic fit (range accel < 1 m/s^2 keeps the
    # fit error < 1 mm over tens of seconds)
    dur = n_samples / fs
    n_grid = max(int(np.ceil(dur / grid_step_s)) + 2, 5)
    tg = np.linspace(0.0, dur, n_grid)
    rho_g = geometric_range(eph1, t0_gps + tg, rx_ecef)
    coeffs = np.polyfit(tg, rho_g, 2)
    _, clk = eph_mod.sat_pos_clock(eph1, np.array([t0_gps]))
    code = codes_ops.gps_ca_code(prn).astype(np.float64)
    bits = np.asarray(bits, np.float64)

    phase0 = None
    for s0 in range(0, n_samples, chunk):
        s1 = min(s0 + chunk, n_samples)
        t = np.arange(s0, s1, dtype=np.float64) / fs
        rho = np.polyval(coeffs, t)
        tau = rho / C.SPEED_OF_LIGHT
        t_tx = t0_gps + t - tau + clk[0]

        chip_idx = (np.floor(C.GPS_CA_CHIP_RATE_HZ * t_tx).astype(np.int64)
                    % C.GPS_CA_CODE_LEN)
        chip_vals = code[chip_idx]
        bit_idx = np.floor((t_tx - bits_t0) * 50.0).astype(np.int64)
        bit_vals = bits[np.clip(bit_idx, 0, bits.size - 1)]

        phase = -2.0 * np.pi * C.GPS_L1_FREQ_HZ * tau
        if phase0 is None:
            phase0 = phase[0]          # arbitrary initial phase -> 0
        out[s0:s1] += amplitude * chip_vals * bit_vals * np.exp(
            1j * (phase - phase0))
    return out


def simulate_constellation(ephs: Sequence[lnav.Ephemeris],
                           rx_lla: tuple[float, float, float],
                           tow0: float, n_samples: int, fs: float,
                           amplitudes: Sequence[float] | None = None,
                           noise_std: float = 0.0, seed: int = 0,
                           min_elevation_deg: float = 10.0):
    """Render a multi-satellite capture + ground truth.

    Args:
      ephs: decoded-style Ephemeris records (one per satellite).
      rx_lla: receiver (lat_deg, lon_deg, height_m).
      tow0: GPS ToW at receiver sample 0; nav bits start at the previous
        subframe boundary so decoders see whole subframes.
      Returns (iq complex128 (n_samples,), truths: list[SatTruth],
      rx_ecef (3,)).
    """
    rx_ecef = pvt.lla_to_ecef(*rx_lla)
    batch = eph_mod.stack_ephemeris(ephs)
    out = np.zeros(n_samples, dtype=np.complex128)
    truths = []
    amplitudes = amplitudes or [1.0] * len(ephs)

    # visibility filter
    pos0, _ = eph_mod.sat_pos_clock(batch, np.full(len(ephs), tow0))
    e_, n_, u_ = pvt.topocentric(rx_ecef, pos0 - rx_ecef)
    el = np.rad2deg(np.arctan2(u_, np.hypot(e_, n_)))

    sf0 = np.floor(tow0 / 6.0) * 6.0 - 6.0       # one subframe of lead-in
    dur = n_samples / fs
    n_sf = int(np.ceil((dur + tow0 - sf0) / 6.0)) + 2

    for k, eph in enumerate(ephs):
        if el[k] < min_elevation_deg:
            continue
        one = eph_mod.EphArrays(*[c[k:k + 1] for c in batch])
        bits01 = lnav.encode_frames(eph, start_tow_s=sf0, n_subframes=n_sf)
        bits = bits01.astype(np.float64) * 2.0 - 1.0
        render_satellite(one, eph.prn, rx_ecef, tow0, n_samples, fs,
                         bits, sf0, amplitudes[k], out=out)

        rho0 = geometric_range(one, np.array([tow0]), rx_ecef)[0]
        rho1 = geometric_range(one, np.array([tow0 + 0.5]), rx_ecef)[0]
        doppler = -(rho1 - rho0) / 0.5 / C.SPEED_OF_LIGHT * C.GPS_L1_FREQ_HZ
        _, clk = eph_mod.sat_pos_clock(one, np.array([tow0]))
        t_tx0 = tow0 - rho0 / C.SPEED_OF_LIGHT + clk[0]
        cp = (C.GPS_CA_CHIP_RATE_HZ * t_tx0) % C.GPS_CA_CODE_LEN
        truths.append(SatTruth(
            prn=eph.prn, range_m=float(rho0), doppler_hz=float(doppler),
            code_phase_chips=float(cp),
            pseudorange_m=float(rho0 - C.SPEED_OF_LIGHT * clk[0])))

    if noise_std > 0.0:
        rng = np.random.default_rng(seed)
        out = out + (rng.normal(0.0, noise_std, n_samples)
                     + 1j * rng.normal(0.0, noise_std, n_samples))
    return out, truths, rx_ecef
