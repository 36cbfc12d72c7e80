"""Fused Pallas Welch-PSD kernel (TPU).

The XLA Welch path (`spectral.welch_psd_p`) is HBM-bound: the framed
(n_segments, nperseg) tensor and every DFT stage intermediate round-trip
HBM (~6-8 passes of ~8 MB for a 512k-sample block) for a 4 KB result.
This kernel fuses detrend -> window -> two-stage Cooley-Tukey DFT ->
|.|^2 -> segment accumulation in VMEM: HBM sees the raw signal once
(twice, via the even/odd framing below) and the (nperseg,) output.

50%-overlap framing without overlapping BlockSpecs: hop = nperseg/2, so
the segment set splits into two NON-overlapping framings of the same
buffer — segments starting at even hops (`x.reshape(-1, nperseg)`) and at
odd hops (`x[hop:]` reshaped likewise). Both are free XLA reshapes; the
kernel runs over each and the host sums the two accumulators.

Kernel shape discipline (axon-runtime constraint): every tensor is
RANK-2 with minor dim n2 and every cross-row operation is a matmul — the
per-segment detrend mean is (ones-row-sum, block-diagonal average)
matmuls, and the final segment sum is a selection-matrix matmul. Rank-3
broadcasts / major-axis reductions (which the v2/v3 CAF kernels also
avoid) hit UNIMPLEMENTED on this runtime.

DFT factorization and permuted output order follow ops/pallas_caf.py's
v2 scheme (k = k1 + n1*k2; the power spectrum is de-permuted by one host
transpose of the (n1, n2) result).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx
from .pallas_caf import factorization_v2
from .spectral import _hann

_SEG_TILE = 64

_RUNTIME_OK: bool | None = None


def supported(nperseg: int) -> bool:
    return factorization_v2(nperseg) is not None


def runtime_supported() -> bool:
    """One-shot probe: does the attached TPU runtime execute this kernel?

    Some runtime builds reject otherwise-valid Mosaic programs at execute
    time (UNIMPLEMENTED) — compile alone does not prove executability, so
    the probe runs the real kernel on a minimal block eagerly and caches
    the verdict for the process. Called from the `spectral.welch_psd_p`
    dispatch gate; CPU/interpret callers never reach it.
    """
    global _RUNTIME_OK
    if _RUNTIME_OK is None:
        try:
            n = 1024
            z = jnp.zeros((2 * n,), jnp.float32)
            out = welch_psd_fused(cplx.CArray(z[:n], z[n:]), 1.0, n,
                                  interpret=False)
            jax.block_until_ready(out)
            _RUNTIME_OK = True
        except Exception:
            _RUNTIME_OK = False
    return _RUNTIME_OK


@functools.lru_cache(maxsize=8)
def _consts(nperseg: int, seg_tile: int) -> dict:
    n1, n2 = factorization_v2(nperseg)
    t1 = np.arange(n1)
    k1 = np.arange(n1)
    t2 = np.arange(n2)
    k2 = np.arange(n2)
    st = seg_tile
    rows = st * n1

    def cs(ang):
        return (np.cos(ang).astype(np.float32),
                np.sin(ang).astype(np.float32))

    eye = np.eye(st, dtype=np.float32)
    w1 = cs(-2.0 * np.pi * np.outer(t1, k1) / n1)
    l1 = (np.kron(eye, w1[0].T.copy()), np.kron(eye, w1[1].T.copy()))
    t1f = cs(-2.0 * np.pi * np.outer(k1, t2) / nperseg)     # (n1, n2)
    t1f_t = (np.tile(t1f[0], (st, 1)), np.tile(t1f[1], (st, 1)))
    d2f = cs(-2.0 * np.pi * np.outer(t2, k2) / n2)          # (n2, n2)
    win_t = np.tile(_hann(nperseg).reshape(n1, n2), (st, 1))
    ones2 = np.ones((n2, n2), np.float32)
    avg = np.kron(eye, np.full((n1, n1), 1.0 / nperseg, np.float32))
    sel = np.kron(np.ones((1, st), np.float32), np.eye(n1, dtype=np.float32))
    return {"n1": n1, "n2": n2, "l1": l1, "t1f_t": t1f_t, "d2f": d2f,
            "win_t": win_t, "ones2": ones2, "avg": avg, "sel": sel}


def _make_kernel(detrend: bool, precision: str):
    from jax.experimental import pallas as pl

    if precision == "bf16":
        def cast(a):
            return a.astype(jnp.bfloat16)
    else:
        def cast(a):
            return a

    def rdot(a, b):
        return jnp.dot(cast(a), cast(b),
                       preferred_element_type=jnp.float32)

    def kernel(x_re, x_im, win, onr, avg, l1r, l1i, t1fr, t1fi,
               d2fr, d2fi, sel, out_ref):
        i = pl.program_id(0)   # (grid is (n_tiles, 1): axon runtime rejects 1-D pallas grids)
        xr = x_re[:]                                   # (rows, n2)
        xi = x_im[:]
        if detrend:
            # per-segment complex mean via two matmuls: lane row-sums,
            # then block-diagonal average over each segment's n1 rows
            mr = rdot(avg[:], rdot(xr, onr[:]))
            mi = rdot(avg[:], rdot(xi, onr[:]))
            xr = xr - mr
            xi = xi - mi
        w = win[:]
        xr = xr * w
        xi = xi * w
        # fwd stage 1: contract t1 via the block-diagonal left matmul
        ur = rdot(l1r[:], xr) - rdot(l1i[:], xi)
        ui = rdot(l1r[:], xi) + rdot(l1i[:], xr)
        # fwd twiddle (tiled)
        vr = ur * t1fr[:] - ui * t1fi[:]
        vi = ur * t1fi[:] + ui * t1fr[:]
        # fwd stage 2: contract t2
        mr2 = rdot(vr, d2fr[:]) - rdot(vi, d2fi[:])
        mi2 = rdot(vr, d2fi[:]) + rdot(vi, d2fr[:])
        # |.|^2 and segment sum via the selection matmul
        p = rdot(sel[:], mr2 * mr2 + mi2 * mi2)        # (n1, n2)

        @pl.when(i == 0)
        def _():
            out_ref[:] = p

        @pl.when(i != 0)
        def _():
            out_ref[:] = out_ref[:] + p

    return kernel


def _run(seg_re, seg_im, nperseg: int, detrend: bool, precision: str,
         interpret: bool):
    """Sum of per-segment windowed |DFT|^2 over (n_segs, nperseg) planes,
    permuted (n1, n2) output."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n_segs = seg_re.shape[0]
    k = _consts(nperseg, _SEG_TILE)
    n1, n2 = k["n1"], k["n2"]
    pad = (-n_segs) % _SEG_TILE
    if pad:
        # zero segments: windowed power 0 (their detrend mean is 0 too)
        seg_re = jnp.concatenate(
            [seg_re, jnp.zeros((pad, nperseg), seg_re.dtype)])
        seg_im = jnp.concatenate(
            [seg_im, jnp.zeros((pad, nperseg), seg_im.dtype)])
    rows = _SEG_TILE * n1
    x2r = seg_re.reshape(-1, n2)            # (n_segs*n1, n2), row-major
    x2i = seg_im.reshape(-1, n2)
    n_tiles = x2r.shape[0] // rows

    kern = _make_kernel(detrend, precision)

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map)

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(n_tiles, 1),
        in_specs=[
            spec((rows, n2), lambda i, j: (i, 0)),
            spec((rows, n2), lambda i, j: (i, 0)),
            spec((rows, n2), lambda i, j: (0, 0)),          # win tiled
            spec((n2, n2), lambda i, j: (0, 0)),            # ones
            spec((rows, rows), lambda i, j: (0, 0)),        # avg blockdiag
            spec((rows, rows), lambda i, j: (0, 0)),        # L1
            spec((rows, rows), lambda i, j: (0, 0)),
            spec((rows, n2), lambda i, j: (0, 0)),          # fwd twiddle tiled
            spec((rows, n2), lambda i, j: (0, 0)),
            spec((n2, n2), lambda i, j: (0, 0)),            # d2 fwd
            spec((n2, n2), lambda i, j: (0, 0)),
            spec((n1, rows), lambda i, j: (0, 0)),          # selection
        ],
        out_specs=spec((n1, n2), lambda i, j: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((n1, n2), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(x2r, x2i, jnp.asarray(k["win_t"]), jnp.asarray(k["ones2"]),
      jnp.asarray(k["avg"]),
      jnp.asarray(k["l1"][0]), jnp.asarray(k["l1"][1]),
      jnp.asarray(k["t1f_t"][0]), jnp.asarray(k["t1f_t"][1]),
      jnp.asarray(k["d2f"][0]), jnp.asarray(k["d2f"][1]),
      jnp.asarray(k["sel"]))
    # de-permute: natural k = k1 + n1*k2 == flat index of (k2, k1)
    return jnp.transpose(out, (1, 0)).reshape(nperseg)


def welch_psd_fused(x: cplx.CArray, sample_rate: float, nperseg: int = 1024,
                    detrend: bool = True, *, precision: str = "f32",
                    interpret: bool | None = None) -> jax.Array:
    """Fused two-sided Welch PSD, 50% overlap, hann, density scaling —
    same contract as `spectral.welch_psd_p(..., overlap_frac=0.5)`.

    x: (n,) planar CArray. Returns (nperseg,) float32, natural FFT order.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    hop = nperseg // 2
    n = x.shape[-1]
    n_even = (n // nperseg)
    n_odd = (n - hop) // nperseg
    n_segs = 1 + (n - nperseg) // hop

    ev_re = x.re[: n_even * nperseg].reshape(n_even, nperseg)
    ev_im = x.im[: n_even * nperseg].reshape(n_even, nperseg)
    od_re = x.re[hop: hop + n_odd * nperseg].reshape(n_odd, nperseg)
    od_im = x.im[hop: hop + n_odd * nperseg].reshape(n_odd, nperseg)

    acc = (_run(ev_re, ev_im, nperseg, detrend, precision, interpret)
           + _run(od_re, od_im, nperseg, detrend, precision, interpret))
    win = _hann(nperseg)
    scale = 1.0 / (sample_rate * float(np.sum(win * win)))
    return acc * (scale / n_segs)
