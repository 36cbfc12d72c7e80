"""High-level scenario builder: ground-truth-known jammed captures.

The test-fixture factory required by SURVEY.md §4: produces multi-antenna
RTL-SDR-format captures of a jamming scenario with known jammer location,
power, and timing — the library version of the reference's gps-sdr-sim +
jammer + mixer subprocess chain (gnss_frontend.py:955-1070).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import iq as iq_ops
from ..ops import pathloss
from ..utils import constants as C
from . import jammers, mix


@dataclasses.dataclass(frozen=True)
class JammerScenario:
    """Ground truth for a simulated jamming event."""
    kind: str = "cw"                     # cw | chirp | broadband | pulsed
    position_m: tuple = (10.0, 5.0)      # east/north meters from antenna 0
    tx_power_dbm: float = 40.0
    path_loss_exponent: float = 3.0
    frequency_mhz: float = 1575.42
    start_s: float = 2.0
    duration_s: float = 3.0
    seed: int = 0


def antenna_distances(scn: JammerScenario,
                      antenna_positions_m: Sequence) -> np.ndarray:
    pos = np.asarray(antenna_positions_m, dtype=np.float64)
    jam = np.asarray(scn.position_m, dtype=np.float64)
    return np.sqrt(((pos - jam) ** 2).sum(axis=1))


def jammer_amplitude_at(scn: JammerScenario, distance_m: float) -> float:
    """Digital-domain amplitude consistent with the RSSI inversion model.

    The RSSI localizer assumes Prx = 10*log10(mean_amplitude^2) in the
    normalized [-1,1] domain (triangulateRSSI.py:68-75); in the centered
    uint8 domain amplitudes are 127.5x larger. We synthesize so the
    normalized-domain amplitude inverts back to the true distance.
    """
    prx_db = pathloss.forward_received_db(
        distance_m, scn.tx_power_dbm, scn.path_loss_exponent, scn.frequency_mhz)
    amp_normalized = 10.0 ** (float(prx_db) / 20.0)
    return amp_normalized * 127.5


def render_antenna_capture(scn: JammerScenario, antenna_pos_m,
                           n_samples: int, sample_rate: float,
                           noise_std: float = 6.25,
                           background: jax.Array | None = None,
                           antenna_index: int = 0) -> jax.Array:
    """Centered-float complex capture seen by one antenna.

    background: optional pre-scaled GNSS baseband (centered domain); defaults
    to zeros. Noise/jammer PRNG streams are decorrelated per antenna.
    """
    key = jax.random.PRNGKey(scn.seed * 1000 + antenna_index)
    kj, kn = jax.random.split(key)
    d = float(np.sqrt(((np.asarray(antenna_pos_m, dtype=np.float64)
                        - np.asarray(scn.position_m)) ** 2).sum()))
    amp = jammer_amplitude_at(scn, max(d, 1e-3))
    jam = jammers.generate(scn.kind, n_samples, sample_rate, key=kj)
    base = background if background is not None else jnp.zeros(
        n_samples, dtype=jnp.complex64)
    out = mix.inject_static(base, amp * jam, sample_rate,
                            scn.start_s, scn.duration_s, 1.0)
    return mix.finalize_uint8_domain(out, noise_std=noise_std, key=kn)


def write_capture_set(scn: JammerScenario, antenna_positions_m: Sequence,
                      paths: Sequence[str], n_samples: int,
                      sample_rate: float = C.DEFAULT_SAMPLE_RATE_GPS,
                      noise_std: float = 6.25,
                      background: jax.Array | None = None) -> None:
    """Render + serialize one .bin per antenna (the test1..3.bin pattern of
    worker.py:613-627)."""
    for i, (pos, path) in enumerate(zip(antenna_positions_m, paths)):
        cap = render_antenna_capture(scn, pos, n_samples, sample_rate,
                                     noise_std, background, antenna_index=i)
        iq_ops.write_iq_file(path, np.asarray(cap))
