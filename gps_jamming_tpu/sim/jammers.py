"""Deterministic jammer waveform generators.

Library reimplementation of the reference's four GNU Radio flowgraphs
(`simulate/frontend/jammers/{cw,chirp,broadband,pulsed}Jammer.py`) as pure
jnp functions: complex baseband at the capture sample rate, unit-amplitude
(scaling happens in the mixer, sim/mix.py).

- CW      : complex exponential at a fixed offset (cwJammer.py:50).
- chirp   : sawtooth-driven VCO sweeping a band (chirpJammer.py:45-59).
- broadband: complex white Gaussian noise (broadbandJammer.py:50).
- pulsed  : CW gated by a square wave at the PRF (pulsedJammer.py:47-53).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _expj(phase: jax.Array) -> jax.Array:
    return jax.lax.complex(jnp.cos(phase), jnp.sin(phase))


def cw(n_samples: int, sample_rate: float, offset_hz: float = 100e3,
       amplitude: float = 1.0) -> jax.Array:
    """Continuous-wave tone at offset_hz from center."""
    t = jnp.arange(n_samples, dtype=jnp.float32) / sample_rate
    return amplitude * _expj(2.0 * jnp.pi * offset_hz * t)


def chirp(n_samples: int, sample_rate: float, f_start_hz: float = -500e3,
          f_stop_hz: float = 500e3, sweep_period_s: float = 2.0,
          amplitude: float = 1.0) -> jax.Array:
    """Sawtooth-swept chirp: frequency ramps f_start->f_stop each period.

    Phase is the cumulative integral of the instantaneous frequency, computed
    in closed form per sweep to avoid a scan: within a sweep of duration T,
    phase(t) = 2*pi*(f_start*t + (f_stop-f_start)*t^2/(2T)).
    """
    t = jnp.arange(n_samples, dtype=jnp.float32) / sample_rate
    tau = jnp.mod(t, sweep_period_s)
    k = (f_stop_hz - f_start_hz) / sweep_period_s
    phase = 2.0 * jnp.pi * (f_start_hz * tau + 0.5 * k * tau * tau)
    return amplitude * _expj(phase)


def broadband(n_samples: int, key: jax.Array, amplitude: float = 1.0) -> jax.Array:
    """Complex white Gaussian noise, unit power per component."""
    k1, k2 = jax.random.split(key)
    i = jax.random.normal(k1, (n_samples,), dtype=jnp.float32)
    q = jax.random.normal(k2, (n_samples,), dtype=jnp.float32)
    return amplitude * jax.lax.complex(i, q)


def pulsed(n_samples: int, sample_rate: float, offset_hz: float = 100e3,
           prf_hz: float = 1000.0, duty: float = 0.5,
           amplitude: float = 1.0) -> jax.Array:
    """CW gated by a square wave at prf_hz (pulsedJammer.py:47-53)."""
    t = jnp.arange(n_samples, dtype=jnp.float32) / sample_rate
    gate = (jnp.mod(t * prf_hz, 1.0) < duty).astype(jnp.float32)
    return amplitude * gate * _expj(2.0 * jnp.pi * offset_hz * t)


JAMMER_TYPES = ("cw", "chirp", "broadband", "pulsed")


def generate(kind: str, n_samples: int, sample_rate: float,
             key: jax.Array | None = None, **kwargs) -> jax.Array:
    """Dispatch by jammer kind (reference GUI mode B selector)."""
    if kind == "cw":
        return cw(n_samples, sample_rate, **kwargs)
    if kind == "chirp":
        return chirp(n_samples, sample_rate, **kwargs)
    if kind == "broadband":
        if key is None:
            key = jax.random.PRNGKey(0)
        return broadband(n_samples, key, **kwargs)
    if kind == "pulsed":
        return pulsed(n_samples, sample_rate, **kwargs)
    raise ValueError(f"unknown jammer kind {kind!r}; one of {JAMMER_TYPES}")
