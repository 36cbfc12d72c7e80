"""GNSS signal acquisition: batched CAF search over (PRN x Doppler x lag).

TPU-native re-design of `sdracq.c` + `pcorrelator` (sdrcmn.c:742-773): the
reference spawns one pthread per PRN, each sequentially evaluating 71 Doppler
rows of a 2048-lag FFT correlation and integrating 10 code periods. Here the
whole constellation is acquired in ONE batched kernel: (32 PRN x 71 Doppler x
2048 lag x 10 integrations) evaluated as batched MXU DFT matmuls
(ops.caf/ops.fftcore), then the peak-ratio test of `checkacquisition`
(sdracq.c:52-81) vectorized over PRNs.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ...config import AcquisitionConfig, FrontendConfig
from ...ops import caf as caf_ops
from ...ops import codes as codes_ops
from ...ops import corr as corr_ops
from ...utils import constants as C


class AcquisitionResult(NamedTuple):
    """Per-PRN acquisition outputs (all arrays shape (n_prn,))."""
    acquired: jax.Array        # peak ratio > threshold
    code_phase: jax.Array      # samples (lag of code start in the block)
    doppler_hz: jax.Array
    peak_ratio: jax.Array
    cn0_dbhz: jax.Array
    peak_power: jax.Array


def gps_replica_table(sample_rate: float, n_samples: int) -> jax.Array:
    """conj(FFT) replicas for all 32 GPS PRNs at the capture rate."""
    return codes_ops.sampled_code_fft_conj(
        codes_ops.gps_ca_table(), C.GPS_CA_CHIP_RATE_HZ, sample_rate,
        n_samples)


def gps_replica_table_host(sample_rate: float, n_samples: int):
    """Host-precomputed planar replica table (TPU path): CArray of numpy
    (re, im) planes, safe to close over in jitted kernels."""
    from ...ops import cplx
    re, im = codes_ops.sampled_code_fft_conj_host(
        codes_ops.gps_ca_table(), C.GPS_CA_CHIP_RATE_HZ, sample_rate,
        n_samples)
    return cplx.CArray(re, im)


def acquire_all(blocks, replica_fft_conj,
                sample_rate: float, cfg: AcquisitionConfig,
                code_period_s: float = C.GPS_CA_PERIOD_S,
                code_len_chips: float = 1023.0) -> AcquisitionResult:
    """Acquire every PRN from `n_integration` code-period blocks.

    blocks: (n_intg, n_samples) complex or CArray baseband, one code period
    each. replica_fft_conj: (n_prn, n_samples) complex or CArray.
    """
    freqs = jnp.asarray(caf_ops.doppler_bins(cfg.doppler_max_hz,
                                             cfg.doppler_step_hz))
    surf = caf_ops.caf_accumulate(blocks, replica_fft_conj, freqs,
                                  sample_rate)           # (n_prn, n_f, n)
    return acquisition_test(surf, freqs, sample_rate, cfg, code_period_s,
                            code_len_chips)


def acquisition_test(surf: jax.Array, freqs: jax.Array, sample_rate: float,
                     cfg: AcquisitionConfig, code_period_s: float,
                     code_len_chips: float = 1023.0) -> AcquisitionResult:
    """Vectorized `checkacquisition` (sdracq.c:52-81) over the PRN axis.

    Peak over (Doppler, lag); second peak and mean taken over the SAME
    Doppler row with a +/-2-chip circular exclusion window around the peak;
    C/N0 = 10*log10(peak/mean/Tcode); acquired when peak/second > threshold.
    """
    n_prn, n_freq, n = surf.shape
    nsampchip = max(int(round(n / code_len_chips)), 1)
    excl = int(cfg.exclude_chips * nsampchip)

    flat = surf.reshape(n_prn, n_freq * n)
    idx = jnp.argmax(flat, axis=-1)
    freq_i = idx // n
    code_i = idx % n
    peak = jnp.take_along_axis(flat, idx[:, None], axis=-1)[:, 0]

    rows = jnp.take_along_axis(
        surf, freq_i[:, None, None], axis=1)[:, 0, :]    # (n_prn, n)
    second = corr_ops.second_peak_excluded(rows, code_i, excl)
    mean = corr_ops.mean_excluded(rows, code_i, excl)
    ratio = peak / jnp.maximum(second, 1e-30)
    cn0 = 10.0 * jnp.log10(peak / jnp.maximum(mean, 1e-30) / code_period_s)

    return AcquisitionResult(
        acquired=ratio > cfg.peak_ratio_threshold,
        code_phase=code_i.astype(jnp.int32),
        doppler_hz=jnp.take(freqs, freq_i),
        peak_ratio=ratio,
        cn0_dbhz=cn0,
        peak_power=peak,
    )


@functools.partial(jax.jit, static_argnames=("sample_rate", "cfg",
                                             "code_period_s"))
def acquire_all_jit(blocks, replica_fft_conj, sample_rate, cfg,
                    code_period_s=C.GPS_CA_PERIOD_S):
    return acquire_all(blocks, replica_fft_conj, sample_rate, cfg,
                       code_period_s)
