"""Cross-ambiguity function (CAF): delay x Doppler correlation surfaces.

The flagship batched kernel of the framework. Generalizes the reference's
acquisition correlator (`pcorrelator` + `cpxconv`, sdrcmn.c:124-147/:742-773),
which evaluates one (Doppler, all-lags) row at a time per channel thread, into
a single batched computation over (channel/PRN x Doppler x lag) that XLA maps
onto large batched FFTs — the natural TPU formulation (SURVEY.md §2 TPU
mapping notes).

Two flavours:
- `caf_surface`: signal vs precomputed replica FFT (GNSS acquisition).
- `caf_pair`: signal vs signal (TDOA/FDOA between antenna pairs) — a
  capability the reference only approximates with zero-Doppler xcorr.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx, fftcore


def doppler_bins(max_hz: float, step_hz: float) -> np.ndarray:
    """Symmetric Doppler grid, matching sdrinit.c:182-185 (71 bins default)."""
    n = int(round(2 * max_hz / step_hz)) + 1
    return (np.arange(n) * step_hz - max_hz).astype(np.float32)


def _doppler_mix_p(x: cplx.CArray, freqs: jax.Array,
                   sample_rate: float) -> cplx.CArray:
    """Mix x down by each Doppler bin: out[f, n] = x[n] * e^{-j 2 pi f n Ts}.

    x: (..., n) -> (..., n_freq, n). The phasor table is built once per shape
    under jit and fused into the FFT input.
    """
    n = x.shape[-1]
    t = jnp.arange(n, dtype=jnp.float32) / sample_rate
    phase = -2.0 * jnp.pi * freqs[:, None] * t[None, :]
    osc = cplx.expi(phase)
    return cplx.mul(cplx.apply(lambda a: a[..., None, :], x), osc)


def caf_surface(x, replica_fft_conj, freqs: jax.Array,
                sample_rate: float) -> jax.Array:
    """CAF power surface of a signal block against code replicas.

    Args:
      x: (n,) or (batch, n) complex (or CArray) baseband block.
      replica_fft_conj: (n_code, n) conj(FFT(replica)) per code (PRN),
        complex or CArray.
      freqs: (n_freq,) Doppler bins [Hz].
      sample_rate: [Hz].

    Returns float32 (..., n_code, n_freq, n) power: one circular-lag row per
    (code, Doppler).
    """
    x = cplx.asarray(x)
    rep = replica_fft_conj if isinstance(replica_fft_conj, cplx.CArray) \
        else cplx.asarray(replica_fft_conj)
    mixed = _doppler_mix_p(x, freqs, sample_rate)        # (..., n_freq, n)
    mf = fftcore.fft_p(mixed)
    prod = cplx.mul(cplx.apply(lambda a: a[..., None, :, :], mf),
                    cplx.apply(lambda a: a[:, None, :], rep))
    return fftcore.ifft_power_p(prod)


# Operand precision policy for the fused acquisition kernels.
#
# "auto" resolves per dispatched kernel:
#   - the lane-resident v2 kernel (`pallas_caf.caf_accumulate_fused_v2`) is
#     MXU-flop bound, and bf16 operands run the MXU at native rate — measured
#     7x kernel speedup on v5e. The CAF is a noncoherent POWER surface
#     consumed by a peak-ratio >= 3.0 test (sdracq.c:52-81); a ~3-digit
#     operand mantissa perturbs the peak by <0.1 dB, far below the noise
#     floor that sets the detection threshold. auto -> bf16.
#   - the v1 kernel (fallback for sizes v2 cannot factor) is layout-bound:
#     bf16 operands give no speedup there, so auto -> f32 (no accuracy loss
#     for no gain).
#   - if the user pinned `fftcore.set_precision(...)`, that choice governs
#     the fused path too (one knob: `ops.set_compute_precision` sets both).
#
# An explicit `precision=` argument to `caf_accumulate` overrides everything
# (it is a static/trace-time choice — see `set_acq_precision` note).
ACQ_FUSED_PRECISION = "auto"


def set_acq_precision(name: str) -> None:
    """Set the fused-acquisition precision policy: 'auto', 'f32' or 'bf16'.

    NOTE: this module global is read at TRACE time by jitted callers
    (e.g. `acquire_all_jit`). Calling it after a signature has already been
    compiled does not retrace — prefer passing `precision=` explicitly
    through `acquire_all`/`caf_accumulate` (it is a static argument), or
    call this before the first acquisition.
    """
    global ACQ_FUSED_PRECISION
    if name not in ("auto", "f32", "bf16"):
        raise ValueError(name)
    ACQ_FUSED_PRECISION = name


def resolve_acq_precision(precision: str | None, kernel: str) -> str:
    """Resolve an acquisition precision request for a given kernel
    ('v1'/'v2'/'v3').

    Explicit request > pinned fftcore precision > per-kernel auto default
    (bf16 for the MXU-bound v2/v3, f32 for the layout-bound v1)."""
    p = ACQ_FUSED_PRECISION if precision is None else precision
    if p != "auto":
        return p
    if fftcore.precision_pinned():
        return fftcore.get_precision()
    return "f32" if kernel == "v1" else "bf16"


def fused_dispatch(n: int, n_prn: int = 0) -> str | None:
    """Which fused Pallas kernel (if any) handles block length n on TPU.

    v3 (lane-merged PRN x k1 — no C-sized relayouts) when the factorization
    allows it, else v2 (lane-resident, >= 64-wide relayouts), else v1.
    """
    from . import pallas_caf
    if n_prn and pallas_caf.supported_v3(n, n_prn):
        return "v3"
    if pallas_caf.supported_v2(n):
        return "v2"
    if pallas_caf.supported(n):
        return "v1"
    return None


def caf_accumulate(blocks, replica_fft_conj, freqs,
                   sample_rate: float, *,
                   precision: str | None = None) -> jax.Array:
    """Non-coherent accumulation of CAF power over integration blocks.

    blocks: (n_blocks, n). Equivalent to the reference's `intg`-fold
    accumulation loop in `sdraqcuisition` (sdracq.c:15-27) but evaluated as
    one batched op and summed.

    When running on TPU with host-resident (numpy) replica planes and
    concrete Doppler bins, dispatches to a fused Pallas kernel
    (`ops.pallas_caf`) that keeps the (block x PRN x Doppler) product and
    inverse DFT in VMEM instead of materializing ~GBs in HBM — the
    lane-resident v2 kernel when the block length factors for it, else v1.
    `precision` (static): None -> `ACQ_FUSED_PRECISION` policy (see above).
    """
    if (jax.default_backend() == "tpu"
            and isinstance(freqs, np.ndarray)
            and isinstance(replica_fft_conj, cplx.CArray)
            and isinstance(replica_fft_conj.re, np.ndarray)
            and getattr(blocks, "ndim", 0) == 2):
        from . import pallas_caf
        kern = fused_dispatch(blocks.shape[-1], replica_fft_conj.re.shape[0])
        if kern == "v3":
            return pallas_caf.caf_accumulate_fused_v3(
                blocks, replica_fft_conj, freqs, sample_rate,
                precision=resolve_acq_precision(precision, "v3"))
        if kern == "v2":
            return pallas_caf.caf_accumulate_fused_v2(
                blocks, replica_fft_conj, freqs, sample_rate,
                precision=resolve_acq_precision(precision, "v2"))
        if kern == "v1":
            return pallas_caf.caf_accumulate_fused(
                blocks, replica_fft_conj, freqs, sample_rate,
                precision=resolve_acq_precision(precision, "v1"))
    p = caf_surface(blocks, replica_fft_conj, freqs, sample_rate)
    return jnp.sum(p, axis=0)


def caf_pair(a, b, freqs: jax.Array, sample_rate: float) -> jax.Array:
    """Signal-vs-signal CAF (delay x Doppler) for one antenna pair.

    out[f] = |IFFT(FFT(a * e^{-j2 pi f t}) * conj(FFT(b)))|^2 over circular
    lags. Zero-padding to 2*n makes lags linear within +/- n.
    Returns (n_freq, 2n) float32.
    """
    a = cplx.asarray(a)
    b = cplx.asarray(b)
    n = a.shape[-1]
    nfft = 2 * n
    mixed = _doppler_mix_p(a, freqs, sample_rate)
    af = fftcore.fft_p(mixed, n=nfft)
    bf = fftcore.fft_p(b, n=nfft)
    prod = cplx.mul_conj(af, cplx.apply(lambda v: v[..., None, :], bf))
    return fftcore.ifft_power_p(prod)


def caf_peak(power: jax.Array, n_code_axis: int = -1):
    """Peak location over a (n_freq, n_lag) CAF surface.

    Returns (freq_idx, lag_idx, peak_val) as traced scalars.
    """
    nf, nl = power.shape[-2], power.shape[-1]
    flat = power.reshape(power.shape[:-2] + (nf * nl,))
    idx = jnp.argmax(flat, axis=-1)
    return idx // nl, idx % nl, jnp.take_along_axis(flat, idx[..., None], -1)[..., 0]
