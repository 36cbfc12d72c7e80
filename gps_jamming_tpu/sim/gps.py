"""GPS L1 C/A baseband signal synthesis for fixtures.

Replaces the reference's external `gps-sdr-sim` dependency (README.md:40-47)
for test purposes: generates complex baseband containing one or more C/A
signals with configurable code phase, Doppler, carrier phase, nav-data bits
and amplitude, plus AWGN. Deterministic given a PRNG key — the "simulation as
fixture generator" strategy of SURVEY.md §4 made library-first.
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import codes as codes_ops
from ..utils import constants as C


@dataclasses.dataclass(frozen=True)
class SatelliteSignal:
    """One simulated satellite signal."""
    prn: int
    doppler_hz: float = 0.0
    code_phase_chips: float = 0.0      # initial code phase offset
    carrier_phase_rad: float = 0.0
    amplitude: float = 1.0
    nav_bits: tuple = ()               # +/-1 bits; empty = none
    bit_periods: int = 20              # code periods per data bit/symbol
    #   20 = GPS LNAV 50 bps; 2 = SBAS 500 sps symbols (PRN >= 120 selects
    #   the SBAS C/A-family code automatically)


def ca_baseband(sat: SatelliteSignal, n_samples: int,
                sample_rate: float) -> jax.Array:
    """Complex baseband for one satellite.

    Code Doppler is carrier-aided: fcode = chip_rate * (1 + fd/fL1), the same
    relation the tracking loop assumes (sdrtrk.c:105-107).
    """
    code = jnp.asarray(
        codes_ops.sbas_ca_code(sat.prn) if sat.prn >= 120
        else codes_ops.gps_ca_code(sat.prn), dtype=jnp.float32)
    fcode = C.GPS_CA_CHIP_RATE_HZ * (1.0 + sat.doppler_hz / C.GPS_L1_FREQ_HZ)
    chips = codes_ops.resample_code(code, fcode, sample_rate, n_samples,
                                    rem_chips=sat.code_phase_chips)
    t = jnp.arange(n_samples, dtype=jnp.float32) / sample_rate
    phase = 2.0 * jnp.pi * sat.doppler_hz * t + sat.carrier_phase_rad
    carrier = jax.lax.complex(jnp.cos(phase), jnp.sin(phase))

    if sat.nav_bits:
        bits = jnp.asarray(sat.nav_bits, dtype=jnp.float32)
        # bit_periods code periods per bit; which bit is each sample in?
        chips_elapsed = sat.code_phase_chips + t * fcode
        bit_idx = jnp.floor(chips_elapsed / (float(sat.bit_periods)
                                             * C.GPS_CA_CODE_LEN)
                            ).astype(jnp.int32)
        bit_idx = jnp.clip(bit_idx, 0, len(sat.nav_bits) - 1)
        data = jnp.take(bits, bit_idx)
    else:
        data = 1.0
    return sat.amplitude * chips * data * carrier


def scene(sats: Sequence[SatelliteSignal], n_samples: int, sample_rate: float,
          noise_std: float = 0.0, key: jax.Array | None = None) -> jax.Array:
    """Sum of satellite signals + complex AWGN."""
    out = jnp.zeros(n_samples, dtype=jnp.complex64)
    for sat in sats:
        out = out + ca_baseband(sat, n_samples, sample_rate)
    if noise_std > 0.0:
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        out = out + jax.lax.complex(
            noise_std * jax.random.normal(k1, (n_samples,), dtype=jnp.float32),
            noise_std * jax.random.normal(k2, (n_samples,), dtype=jnp.float32))
    return out
