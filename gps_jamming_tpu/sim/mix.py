"""Signal mixing: weaken GPS, inject distance-scaled jammers, spoofer mix.

Library reimplementation of the reference's mixer scripts:
- `weaken_gps.py:4-32`         : x0.125 + AWGN sigma=6.25 + clip + uint8 offset
- `add_jammer_and_mix.py:26-181`: distance-scaled jammer injection with static
  delay/duration windows or a per-trajectory linear-interpolated power profile
- `spoofer_mixer.py:29-171`    : legit + spoof mix with ramp-up envelope

All in the centered-float domain ([-128, 127.x]); use ops.iq.write_iq_file to
serialize to RTL-SDR uint8.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops import geodesy


def weaken(signal: jax.Array, scale: float = 0.125, noise_std: float = 6.25,
           key: jax.Array | None = None) -> jax.Array:
    """GPS weakening: scale + AWGN per component (weaken_gps.py:20-27)."""
    out = signal * scale
    if noise_std > 0:
        if key is None:
            key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        n = signal.shape[-1]
        out = out + jax.lax.complex(
            noise_std * jax.random.normal(k1, (n,), dtype=jnp.float32),
            noise_std * jax.random.normal(k2, (n,), dtype=jnp.float32))
    return out


def distance_power_scale(distance_m, max_range_m: float,
                         jammer_power: float = 0.605):
    """Amplitude scale vs distance (add_jammer_and_mix.py:86-95).

    ref = max_range/2; scale = P inside ref, P*(ref/d) between ref and max
    range, 0 beyond.
    """
    ref = max_range_m * 0.5
    d = jnp.asarray(distance_m)
    scale = jnp.where(d < ref, jammer_power, jammer_power * ref / jnp.maximum(d, 1e-9))
    return jnp.where(d > max_range_m, 0.0, scale)


def inject_static(gps: jax.Array, jammer: jax.Array, sample_rate: float,
                  delay_s: float, duration_s: float, power_scale) -> jax.Array:
    """Static-mode injection window (add_jammer_and_mix.py:158-172).

    Adds `power_scale * jammer` into gps over [delay, delay+duration] seconds.
    """
    n = gps.shape[-1]
    idx = jnp.arange(n)
    start = jnp.asarray(delay_s * sample_rate, dtype=jnp.float32)
    stop = jnp.asarray((delay_s + duration_s) * sample_rate, dtype=jnp.float32)
    gate = ((idx >= start) & (idx < stop)).astype(jnp.float32)
    # the jammer waveform starts at its own sample 0 when the gate opens
    shifted = jnp.roll(jammer, jnp.asarray(delay_s * sample_rate, jnp.int32))
    return gps + gate * power_scale * shifted


def inject_profile(gps: jax.Array, jammer: jax.Array,
                   power_profile: jax.Array) -> jax.Array:
    """Dynamic-mode injection: per-sample amplitude profile
    (add_jammer_and_mix.py:100-135, linear interpolation upstream)."""
    return gps + power_profile * jammer


def trajectory_power_profile(distances_m: jax.Array, samples_per_step: int,
                             max_range_m: float,
                             jammer_power: float = 0.605) -> jax.Array:
    """Per-sample power profile from per-timestep jammer distances.

    Linear interpolation between timesteps then a constant tail — the contract
    of add_jammer_and_mix.py:107-135.
    """
    p = distance_power_scale(distances_m, max_range_m, jammer_power)
    n_steps = p.shape[-1]
    # segments between consecutive steps + constant final segment
    frac = jnp.arange(samples_per_step, dtype=jnp.float32) / samples_per_step
    segs = p[:-1, None] + (p[1:, None] - p[:-1, None]) * frac[None, :]
    tail = jnp.full((1, samples_per_step), p[-1])
    return jnp.concatenate([segs, tail], axis=0).reshape(-1)


def spoof_mix(legit: jax.Array, spoof: jax.Array, sample_rate: float,
              start_s: float, ramp_s: float, overpower: float = 2.0) -> jax.Array:
    """Spoofing attack mix with ramp-up envelope (spoofer_mixer.py:29-171).

    The spoof signal fades in linearly over `ramp_s` starting at `start_s`
    and holds at `overpower` relative amplitude.
    """
    n = legit.shape[-1]
    t = jnp.arange(n, dtype=jnp.float32) / sample_rate
    env = jnp.clip((t - start_s) / jnp.maximum(ramp_s, 1e-9), 0.0, 1.0)
    return legit + overpower * env * spoof


def finalize_uint8_domain(x: jax.Array, noise_std: float = 0.0,
                          key: jax.Array | None = None) -> jax.Array:
    """Optional AWGN then clip to the uint8-representable centered range."""
    if noise_std > 0:
        if key is None:
            key = jax.random.PRNGKey(1)
        k1, k2 = jax.random.split(key)
        n = x.shape[-1]
        x = x + jax.lax.complex(
            noise_std * jax.random.normal(k1, (n,), dtype=jnp.float32),
            noise_std * jax.random.normal(k2, (n,), dtype=jnp.float32))
    re = jnp.clip(jnp.real(x), -128.0, 127.0)
    im = jnp.clip(jnp.imag(x), -128.0, 127.0)
    return jax.lax.complex(re, im)
