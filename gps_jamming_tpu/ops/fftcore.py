"""FFT core with an MXU (matmul) backend.

The production TPU environment this framework targets (and the axon tunnel it
is benchmarked on) lowers `jnp.fft.*` to an XLA FFT HLO that is NOT available
on all TPU runtimes — and, more importantly, on TPU the systolic array is the
fastest way to evaluate moderate-size DFTs anyway: a batched DFT is a matmul
against a precomputed DFT matrix, and a two-stage Cooley-Tukey decomposition
(row DFT -> twiddle -> column DFT, each stage a matmul) covers large sizes at
O(n*(n1+n2)) MACs fed straight to the MXU.

Backend selection:
- 'xla' : jnp.fft (CPU/GPU, and TPUs whose runtime implements FFT)
- 'mxu' : matmul DFT (single-stage for n <= _MAX_SINGLE, two-stage above)
- 'auto': 'mxu' on TPU-like backends, 'xla' elsewhere (decided at trace time
  from jax.default_backend()).

Complex data stays complex64 at the API boundary; inside the MXU path it is
carried as (real, imag) float32 pairs so every multiply is a real matmul with
float32 accumulation (preferred_element_type).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx

_BACKEND = "auto"
_MAX_SINGLE = 2048           # largest single-stage DFT matrix (n x n f32)
_PRECISION = "f32"           # matmul operand precision on the MXU path
_PRECISION_PINNED = False    # True once the user called set_precision()


def set_backend(name: str) -> None:
    global _BACKEND
    if name not in ("auto", "xla", "mxu"):
        raise ValueError(name)
    _BACKEND = name


def get_backend() -> str:
    if _BACKEND != "auto":
        return _BACKEND
    return "mxu" if jax.default_backend() in ("tpu", "axon") else "xla"


def set_precision(name: str) -> None:
    """MXU matmul operand precision: 'f32' (exact) or 'bf16'.

    bf16 operands run at the MXU's native rate with float32 accumulation
    (preferred_element_type) — the standard TPU mixed-precision recipe.
    For detection/acquisition surfaces the ~3 decimal digits of operand
    mantissa cost <0.1 dB of CAF peak fidelity while roughly doubling
    DFT throughput; keep 'f32' when bit-level spectral accuracy matters.
    """
    global _PRECISION, _PRECISION_PINNED
    if name not in ("f32", "bf16"):
        raise ValueError(name)
    _PRECISION = name
    _PRECISION_PINNED = True


def get_precision() -> str:
    return _PRECISION


def precision_pinned() -> bool:
    """True if the user explicitly chose a precision via set_precision().

    A pinned choice also governs the fused Pallas acquisition path
    (`ops.caf.resolve_acq_precision`) so that requesting 'f32' really does
    yield bit-level-comparable surfaces everywhere."""
    return _PRECISION_PINNED


def _cast_operand(x):
    return x.astype(jnp.bfloat16) if _PRECISION == "bf16" \
        else x.astype(jnp.float32)


@functools.lru_cache(maxsize=32)
def _dft_mats(n: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) parts of the DFT matrix W[j,k] = exp(-2pi i jk/n)."""
    j = np.arange(n)
    ang = (2.0 if inverse else -2.0) * np.pi * np.outer(j, j) / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


@functools.lru_cache(maxsize=32)
def _twiddle(n1: int, n2: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """W_n^{k1*t2} twiddles, shape (n1, n2)."""
    n = n1 * n2
    k1 = np.arange(n1)[:, None]
    t2 = np.arange(n2)[None, :]
    ang = (2.0 if inverse else -2.0) * np.pi * k1 * t2 / n
    return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)


def _split_factor(n: int) -> tuple[int, int]:
    """n = n1 * n2 with both <= _MAX_SINGLE, n1 as square as possible."""
    best = None
    for n1 in range(int(math.isqrt(n)), 0, -1):
        if n % n1 == 0:
            n2 = n // n1
            if n1 <= _MAX_SINGLE and n2 <= _MAX_SINGLE:
                best = (n1, n2)
                break
    if best is None:
        raise ValueError(f"cannot factor n={n} into two <={_MAX_SINGLE} parts")
    return best


def _cmatmul(ar, ai, br, bi):
    """(ar + i ai) @ (br + i bi) via real MXU matmuls, f32 accumulate."""
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    ar, ai = _cast_operand(ar), _cast_operand(ai)
    br, bi = _cast_operand(br), _cast_operand(bi)
    rr = dot(ar, br) - dot(ai, bi)
    ri = dot(ar, bi) + dot(ai, br)
    return rr, ri


def _dft_single(xr, xi, n: int, inverse: bool):
    """Batched single-stage DFT over the last axis via one complex matmul."""
    cr, ci = _dft_mats(n, inverse)
    return _cmatmul(xr, xi, jnp.asarray(cr), jnp.asarray(ci))


def _dft_two_stage(xr, xi, n: int, inverse: bool):
    """Cooley-Tukey row-column DFT over the last axis (length n = n1*n2)."""
    n1, n2 = _split_factor(n)
    batch = xr.shape[:-1]
    # x1[t1, t2] = x[n2*t1 + t2]
    xr1 = xr.reshape(batch + (n1, n2))
    xi1 = xi.reshape(batch + (n1, n2))
    # stage 1: DFT over t1 -> Y[k1, t2]: contract DFT_n1[k1,t1] * x1[t1,t2]
    c1r, c1i = _dft_mats(n1, inverse)
    dot = functools.partial(jnp.einsum, precision=None,
                            preferred_element_type=jnp.float32)
    xr1, xi1 = _cast_operand(xr1), _cast_operand(xi1)
    c1r = _cast_operand(jnp.asarray(c1r))
    c1i = _cast_operand(jnp.asarray(c1i))
    yr = dot("kt,...tn->...kn", c1r, xr1) - \
         dot("kt,...tn->...kn", c1i, xi1)
    yi = dot("kt,...tn->...kn", c1r, xi1) + \
         dot("kt,...tn->...kn", c1i, xr1)
    # twiddle W_n^{k1 t2}
    tr, ti = _twiddle(n1, n2, inverse)
    tr = jnp.asarray(tr)
    ti = jnp.asarray(ti)
    zr = yr * tr - yi * ti
    zi = yr * ti + yi * tr
    # stage 2: DFT over t2 -> Z[k1, k2]
    c2r, c2i = _dft_mats(n2, inverse)
    zr, zi = _cast_operand(zr), _cast_operand(zi)
    c2r = _cast_operand(jnp.asarray(c2r))
    c2i = _cast_operand(jnp.asarray(c2i))
    wr = dot("...kt,tm->...km", zr, c2r) - \
         dot("...kt,tm->...km", zi, c2i)
    wi = dot("...kt,tm->...km", zr, c2i) + \
         dot("...kt,tm->...km", zi, c2r)
    # X[k1 + n1*k2] = Z[k1, k2] -> transpose (k2, k1) then flatten
    wr = jnp.swapaxes(wr, -1, -2).reshape(batch + (n,))
    wi = jnp.swapaxes(wi, -1, -2).reshape(batch + (n,))
    return wr, wi


def _fft_pair(xr, xi, inverse: bool):
    n = xr.shape[-1]
    if n <= _MAX_SINGLE:
        yr, yi = _dft_single(xr, xi, n, inverse)
    else:
        yr, yi = _dft_two_stage(xr, xi, n, inverse)
    if inverse:
        yr = yr / n
        yi = yi / n
    return yr, yi


def _fit_last(x: jax.Array, n: int | None) -> jax.Array:
    """Pad/truncate the last axis to length n (no-op when n is None)."""
    if n is None or n == x.shape[-1]:
        return x
    if n > x.shape[-1]:
        pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
        return jnp.pad(x, pad)
    return x[..., :n]


# ---------------------------------------------------------------------------
# Planar (CArray) API — the TPU-native entry points. No complex dtype is
# ever materialized on the MXU path; the XLA path composes/decomposes
# complex64 (CPU/GPU only).
# ---------------------------------------------------------------------------

def fft_p(x: cplx.CArray, n: int | None = None) -> cplx.CArray:
    """DFT over the last axis of a planar complex array."""
    if get_backend() == "xla":
        y = jnp.fft.fft(cplx.to_complex(x), n=n, axis=-1)
        return cplx.from_complex(y)
    xr = _fit_last(x.re.astype(jnp.float32), n)
    xi = _fit_last(x.im.astype(jnp.float32), n)
    return cplx.CArray(*_fft_pair(xr, xi, inverse=False))


def ifft_p(x: cplx.CArray, n: int | None = None) -> cplx.CArray:
    if get_backend() == "xla":
        y = jnp.fft.ifft(cplx.to_complex(x), n=n, axis=-1)
        return cplx.from_complex(y)
    xr = _fit_last(x.re.astype(jnp.float32), n)
    xi = _fit_last(x.im.astype(jnp.float32), n)
    return cplx.CArray(*_fft_pair(xr, xi, inverse=True))


def fft_power_p(x: cplx.CArray, n: int | None = None) -> jax.Array:
    """|FFT(x)|^2 from planes, squaring the (re, im) pair directly."""
    y = fft_p(x, n=n)
    return y.re * y.re + y.im * y.im


def ifft_power_p(x: cplx.CArray) -> jax.Array:
    """|IFFT(x)|^2 from planes."""
    y = ifft_p(x)
    return y.re * y.re + y.im * y.im


def fft(x: jax.Array, n: int | None = None, axis: int = -1) -> jax.Array:
    """Drop-in jnp.fft.fft with backend dispatch (complex64 in/out)."""
    if get_backend() == "xla":
        return jnp.fft.fft(x, n=n, axis=axis)
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    if n is not None and n != x.shape[-1]:
        if n > x.shape[-1]:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
            x = jnp.pad(x, pad)
        else:
            x = x[..., :n]
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    yr, yi = _fft_pair(xr, xi, inverse=False)
    y = jax.lax.complex(yr, yi)
    if axis != -1 and axis != x.ndim - 1:
        y = jnp.moveaxis(y, -1, axis)
    return y


def ifft(x: jax.Array, n: int | None = None, axis: int = -1) -> jax.Array:
    if get_backend() == "xla":
        return jnp.fft.ifft(x, n=n, axis=axis)
    if axis != -1 and axis != x.ndim - 1:
        x = jnp.moveaxis(x, axis, -1)
    if n is not None and n != x.shape[-1]:
        if n > x.shape[-1]:
            pad = [(0, 0)] * (x.ndim - 1) + [(0, n - x.shape[-1])]
            x = jnp.pad(x, pad)
        else:
            x = x[..., :n]
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    yr, yi = _fft_pair(xr, xi, inverse=True)
    y = jax.lax.complex(yr, yi)
    if axis != -1 and axis != x.ndim - 1:
        y = jnp.moveaxis(y, -1, axis)
    return y


def fft_power(x: jax.Array, axis: int = -1) -> jax.Array:
    """|FFT(x)|^2 without materializing the complex result (MXU path keeps
    the (re, im) pair and squares directly)."""
    if get_backend() == "xla":
        f = jnp.fft.fft(x, axis=axis)
        return jnp.real(f) ** 2 + jnp.imag(f) ** 2
    xr = jnp.real(x).astype(jnp.float32)
    xi = jnp.imag(x).astype(jnp.float32)
    yr, yi = _fft_pair(xr, xi, inverse=False)
    return yr * yr + yi * yi


def fftshift(x: jax.Array, axis: int = -1) -> jax.Array:
    return jnp.fft.fftshift(x, axes=axis)
