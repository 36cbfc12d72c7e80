"""PRN spreading-code generation and resampling.

TPU-native equivalent of `sdrcode.c` (gencode dispatch :598-623) and `rescode`
(sdrcmn.c:527-579). Codes are generated once on the host from the published
LFSR definitions (IS-GPS-200 for L1 C/A, GLONASS ICD for the 511-chip G1
sequence), cached, and shipped to device as +/-1 float tables; resampling to
the capture sample rate is a vectorized gather, and acquisition replicas are
precomputed as conj(FFT(.)) tables exactly like the reference precomputes
FFT-domain replicas at channel init (sdrinit.c:431-442).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import constants as C
from . import fftcore

# IS-GPS-200 G2 phase-selector tap pairs (1-indexed) for PRN 1..32.
_GPS_G2_TAPS = [
    (2, 6), (3, 7), (4, 8), (5, 9), (1, 9), (2, 10), (1, 8), (2, 9),
    (3, 10), (2, 3), (3, 4), (5, 6), (6, 7), (7, 8), (8, 9), (9, 10),
    (1, 4), (2, 5), (3, 6), (4, 7), (5, 8), (6, 9), (1, 3), (4, 6),
    (5, 7), (6, 8), (7, 9), (8, 10), (1, 6), (2, 7), (3, 8), (4, 9),
]


@functools.lru_cache(maxsize=64)
def gps_ca_code(prn: int) -> np.ndarray:
    """GPS L1 C/A code for one PRN as +/-1 int8, length 1023.

    Gold code: G1 (x^10 + x^3 + 1) XOR a two-tap phase of G2
    (x^10 + x^9 + x^8 + x^6 + x^3 + x^2 + 1). Same math as sdrcode.c:102-150
    expressed via the standard ICD LFSR definition.
    """
    if not 1 <= prn <= 32:
        raise ValueError(f"GPS PRN must be 1..32, got {prn}")
    t1, t2 = _GPS_G2_TAPS[prn - 1]
    g1 = np.ones(10, dtype=np.int8)
    g2 = np.ones(10, dtype=np.int8)
    out = np.empty(1023, dtype=np.int8)
    for i in range(1023):
        chip = g1[9] ^ (g2[t1 - 1] ^ g2[t2 - 1])
        out[i] = 1 - 2 * chip           # 0 -> +1, 1 -> -1
        fb1 = g1[2] ^ g1[9]
        fb2 = g2[1] ^ g2[2] ^ g2[5] ^ g2[7] ^ g2[8] ^ g2[9]
        g1[1:] = g1[:-1]
        g1[0] = fb1
        g2[1:] = g2[:-1]
        g2[0] = fb2
    return out


@functools.lru_cache(maxsize=1)
def glonass_code() -> np.ndarray:
    """GLONASS 511-chip ranging code as +/-1 int8 (all FDMA channels share it).

    9-stage LFSR x^9 + x^5 + 1, output from stage 7 (GLONASS ICD; the same
    sequence sdrcode.c:553-571 produces).
    """
    reg = np.ones(9, dtype=np.int8)
    out = np.empty(511, dtype=np.int8)
    for i in range(511):
        out[i] = 1 - 2 * reg[6]
        fb = reg[4] ^ reg[8]
        reg[1:] = reg[:-1]
        reg[0] = fb
    return out


def boc11(code: np.ndarray) -> np.ndarray:
    """BOC(1,1) modulation: each chip split into (+c, -c) half-chips.

    Used by Galileo E1B/E1C (sdrcode.c:573-596). Doubles the chip rate.
    """
    return np.stack([code, -code], axis=-1).reshape(-1).astype(np.int8)


@functools.lru_cache(maxsize=8)
def gps_ca_table() -> np.ndarray:
    """(32, 1023) float32 table of all GPS C/A codes."""
    return np.stack([gps_ca_code(p) for p in range(1, 33)]).astype(np.float32)


def resample_code(code: jax.Array, code_freq_hz: float | jax.Array,
                  sample_rate_hz: float, n_samples: int,
                  rem_chips: float | jax.Array = 0.0,
                  chip_shift: float | jax.Array = 0.0) -> jax.Array:
    """Nearest(floor)-neighbor resample of a chip sequence to sample rate.

    chip index for sample i: floor(rem + chip_shift + i * fcode/fs) mod clen —
    the `rescode` contract (sdrcmn.c:527-579). Batches over leading dims of
    `code`; `rem_chips`/`chip_shift` may be traced scalars.
    """
    clen = code.shape[-1]
    i = jnp.arange(n_samples, dtype=jnp.float32)
    phase = rem_chips + chip_shift + i * (code_freq_hz / sample_rate_hz)
    idx = jnp.floor(phase).astype(jnp.int32) % clen
    return jnp.take(code, idx, axis=-1)


def resample_code_bandlimited(code: jax.Array, code_freq_hz: float,
                              sample_rate_hz: float, n_samples: int,
                              rem_chips: float = 0.0,
                              oversample: int = 4) -> jax.Array:
    """Band-limited resample of a chip sequence (simulation-side).

    Models the receiver front-end: the code waveform is sampled at
    `oversample x sample_rate`, brick-wall filtered to +/- sample_rate/2,
    and decimated. Without this, nearest-neighbor sampling of square-wave
    codes aliases out-of-band lines into the Doppler search band — e.g.
    BOC(1,1)'s doubled-subcarrier product at 2.046 MHz folds to -2 kHz at
    a 2.048 MS/s rate, which can out-power the true acquisition peak. A
    real capture never contains that line (the RTL-SDR front-end filters
    before sampling), so synthetic fixtures must not either.
    """
    n_hi = n_samples * oversample
    hi = resample_code(code, code_freq_hz, sample_rate_hz * oversample,
                       n_hi, rem_chips)
    spec = jnp.fft.fft(hi.astype(jnp.complex64), axis=-1)
    keep = n_samples // 2
    low = jnp.concatenate([spec[..., :keep], spec[..., -keep:]], axis=-1)
    # ifft(n_samples) normalizes by n_samples, not n_hi: rescale by 1/os
    return (jnp.real(jnp.fft.ifft(low, axis=-1)) / oversample) \
        .astype(jnp.float32)


def sampled_code_fft_conj(code_table: np.ndarray, code_freq_hz: float,
                          sample_rate_hz: float, n_samples: int) -> jax.Array:
    """Precompute conj(FFT(sampled code)) replicas for acquisition.

    code_table: (n_code, clen) +/-1 floats -> (n_code, n_samples) complex64.
    Mirrors the FFT-domain replica precompute of sdrinit.c:431-442.
    """
    codes = jnp.asarray(code_table, dtype=jnp.float32)
    sampled = resample_code(codes, code_freq_hz, sample_rate_hz, n_samples)
    return jnp.conj(fftcore.fft(sampled.astype(jnp.complex64)))


def resample_code_np(code_table: np.ndarray, code_freq_hz: float,
                     sample_rate_hz: float, n_samples: int,
                     rem_chips: float = 0.0) -> np.ndarray:
    """Host (numpy) twin of `resample_code` for init-time precompute."""
    clen = code_table.shape[-1]
    phase = rem_chips + np.arange(n_samples) * (code_freq_hz / sample_rate_hz)
    idx = np.floor(phase).astype(np.int64) % clen
    return np.take(code_table, idx, axis=-1).astype(np.float32)


def sampled_code_fft_conj_host(code_table: np.ndarray, code_freq_hz: float,
                               sample_rate_hz: float,
                               n_samples: int) -> tuple[np.ndarray, np.ndarray]:
    """Host-precomputed conj(FFT(sampled code)) as (re, im) float32 planes.

    The TPU-native replica table: computed once at init on the host with
    numpy (mirroring the one-shot precompute of sdrinit.c:431-442) and fed
    to jitted planar kernels as embedded constants — device arrays never
    cross back to host during lowering, and no complex dtype reaches TPU.
    """
    sampled = resample_code_np(np.asarray(code_table, np.float32),
                               code_freq_hz, sample_rate_hz, n_samples)
    rep = np.conj(np.fft.fft(sampled, axis=-1))
    return (np.ascontiguousarray(rep.real, np.float32),
            np.ascontiguousarray(rep.imag, np.float32))


def glonass_carrier_hz(freq_ch: int) -> float:
    """GLONASS FDMA carrier for channel number k (sdrinit.c:391-399 maps
    prn -> k = prn - 8)."""
    return C.GLO_G1_BASE_FREQ_HZ + freq_ch * C.GLO_G1_CH_SPACING_HZ
