"""GLONASS L1OF baseband simulation (FDMA channels, 511-chip code).

Sim-side counterpart of the GLONASS receiver path (models.receiver.glonass)
— the reference has no GLONASS simulator (gps-sdr-sim is GPS-only); this
closes the test loop for the FDMA acquisition and GNAV decode.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from ..models.receiver import glonass as glo_mod
from ..ops import codes as codes_ops
from ..ops import cplx
from ..utils import constants as C


@dataclasses.dataclass(frozen=True)
class GloSignal:
    freq_ch: int                  # FDMA frequency number (-7..6)
    doppler_hz: float = 0.0       # true Doppler on the channel carrier
    code_phase_chips: float = 0.0
    amplitude: float = 1.0
    symbols: tuple = ()           # 100 sps line symbols (0/1); empty = none


def baseband(sig: GloSignal, n_samples: int, sample_rate: float,
             center_freq_hz: float = C.GLO_G1_BASE_FREQ_HZ) -> jax.Array:
    """One GLONASS channel's complex baseband after front-end mix-down."""
    code = jnp.asarray(codes_ops.glonass_code(), jnp.float32)
    carrier_hz = C.GLO_G1_BASE_FREQ_HZ + sig.freq_ch * C.GLO_G1_CH_SPACING_HZ
    offset = carrier_hz - center_freq_hz + sig.doppler_hz
    fcode = C.GLO_CHIP_RATE_HZ * (1.0 + sig.doppler_hz / carrier_hz)
    chips = codes_ops.resample_code(code, fcode, sample_rate, n_samples,
                                    rem_chips=sig.code_phase_chips)
    t = jnp.arange(n_samples, dtype=jnp.float32) / sample_rate
    osc = cplx.expi(2.0 * jnp.pi * offset * t)
    if sig.symbols:
        sym = jnp.asarray(sig.symbols, jnp.float32) * -2.0 + 1.0  # 0->+1
        # 100 sps = 10 ms per symbol = 10 code periods
        chips_elapsed = sig.code_phase_chips + t * fcode
        idx = jnp.floor(chips_elapsed / (10.0 * C.GLO_CODE_LEN)
                        ).astype(jnp.int32)
        data = jnp.take(sym, jnp.clip(idx, 0, len(sig.symbols) - 1))
    else:
        data = 1.0
    return cplx.to_complex(cplx.scale(osc, sig.amplitude * chips * data))


def scene(signals, n_samples: int, sample_rate: float,
          center_freq_hz: float = C.GLO_G1_BASE_FREQ_HZ,
          noise_std: float = 0.0, key=None) -> jax.Array:
    out = jnp.zeros(n_samples, dtype=jnp.complex64)
    for s in signals:
        out = out + baseband(s, n_samples, sample_rate, center_freq_hz)
    if noise_std > 0.0:
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        out = out + jax.lax.complex(
            noise_std * jax.random.normal(k1, (n_samples,), jnp.float32),
            noise_std * jax.random.normal(k2, (n_samples,), jnp.float32))
    return out
