"""Fused Pallas CAF acquisition kernel (TPU).

The XLA formulation of the acquisition CAF (`caf.caf_accumulate`) is
HBM-bound: the (n_blocks, n_prn, n_freq, n_lag) frequency-domain product and
its IFFT are materialized in HBM (~1.5 GB of traffic for the GPS 10x32x71x2048
search — the batched generalization of `pcorrelator`/`cpxconv`,
sdrcmn.c:124-147/:742-773). This kernel fuses Doppler mix -> forward DFT ->
replica product -> inverse DFT -> |.|^2 -> non-coherent accumulation into one
pass that keeps every intermediate in VMEM; HBM sees only the input blocks,
the oscillator/replica tables, and the final (n_prn, n_freq, n_lag) surface.

DFTs are evaluated as two-stage Cooley-Tukey matmuls in a *permuted frequency
order* chosen so that the kernel needs only right-multiplications and
minor-dim (sublane<->lane) swaps — no major-axis transposes:

  time index   t = n1*t2 + t1      (t1 in [0,n1), t2 in [0,n2))
  freq index   k = k2 + n2*k1      (k1 in [0,n1), k2 in [0,n2))

  forward:  Y[t1,k2]  = sum_t2 x[t1,t2] W_n2^{k2 t2}      (.,n2)@(n2,n2)
            Z[k2,t1]  = swap(Y) * W_n^{k2 t1}
            M[k2,k1]  = sum_t1 Z[k2,t1] W_n1^{k1 t1}      (.,n1)@(n1,n1)
  product:  P[c,k2,k1] = M[k2,k1] * rep_perm[c,k2,k1]
  inverse:  A[c,k2,t1] = sum_k1 P[c,k2,k1] W_n1^{-k1 t1}  (.,n1)@(n1,n1)
            B[c,t1,k2] = swap(W_n^{-k2 t1} * A)
            x[c,t1,t2] = sum_k2 B[c,t1,k2] W_n2^{-k2 t2}/n  (.,n2)@(n2,n2)
  power:    out[c, n1*t2 + t1] += |x[c,t1,t2]|^2   (minor swap then reshape)

The replica spectrum is pre-permuted on the host, so the point-wise product
is order-consistent and the final lag axis comes out in natural order — the
classic "decimation without bit-reversal" convolution trick.

Grid: (n_freq/freq_tile, n_blocks) with blocks innermost; the output block
for a Doppler tile stays resident in VMEM while the non-coherent sum
accumulates, and `freq_tile` Doppler bins are processed per step so the
inverse stage-B matmul is a well-shaped (freq_tile*n_prn*n1, n2) x (n2, n2)
MXU call instead of 71x10 slivers.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from . import cplx

_LANE = 128


def factorization(n: int) -> tuple[int, int] | None:
    """(n1, n2) with n = n1*n2, n2 a multiple of 128, n1 in [2, 256]."""
    best = None
    for n1 in range(2, 257):
        if n % n1 == 0:
            n2 = n // n1
            if n2 % _LANE == 0:
                if best is None or (n1 + n2) < sum(best):
                    best = (n1, n2)
    return best


def supported(n: int) -> bool:
    return factorization(n) is not None


@functools.lru_cache(maxsize=16)
def _dft_consts(n: int) -> dict:
    n1, n2 = factorization(n)
    k2 = np.arange(n2)
    t2 = np.arange(n2)
    k1 = np.arange(n1)
    t1 = np.arange(n1)

    def cs(ang):
        return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    d2fT = cs(-2.0 * np.pi * np.outer(t2, k2) / n2)         # (n2, n2) [t2,k2]
    twf = cs(-2.0 * np.pi * np.outer(k2, t1) / n)           # (n2, n1) [k2,t1]
    d1f = cs(-2.0 * np.pi * np.outer(t1, k1) / n1)          # (n1, n1) [t1,k1]
    id1 = cs(+2.0 * np.pi * np.outer(k1, t1) / n1)          # (n1, n1) [k1,t1]
    twi = cs(+2.0 * np.pi * np.outer(k2, t1) / n)           # (n2, n1) [k2,t1]
    ang = +2.0 * np.pi * np.outer(k2, t2) / n2
    id2 = (np.cos(ang).astype(np.float32) / n,
           np.sin(ang).astype(np.float32) / n)              # (n2, n2) [k2,t2]
    return {"n1": n1, "n2": n2, "d2fT": d2fT, "twf": twf, "d1f": d1f,
            "id1": id1, "twi": twi, "id2": id2}


def permute_replica(rep_re: np.ndarray, rep_im: np.ndarray,
                    n1: int, n2: int) -> tuple[np.ndarray, np.ndarray]:
    """(C, n) natural freq order -> (C, n2, n1) permuted k = k2 + n2*k1."""
    c = rep_re.shape[0]
    pr = np.ascontiguousarray(
        rep_re.reshape(c, n1, n2).transpose(0, 2, 1), dtype=np.float32)
    pi = np.ascontiguousarray(
        rep_im.reshape(c, n1, n2).transpose(0, 2, 1), dtype=np.float32)
    return pr, pi


@functools.lru_cache(maxsize=16)
def _osc_table(freqs_key: tuple, sample_rate: float, n: int, n1: int,
               n2: int, pad_to: int) -> tuple[np.ndarray, np.ndarray]:
    """Doppler phasors e^{-j 2 pi f t / fs}, (F_padded, n2, n1) time layout.

    Padding rows replicate the last bin (their output is sliced off)."""
    freqs = np.asarray(freqs_key, np.float64)
    if pad_to > freqs.shape[0]:
        freqs = np.concatenate(
            [freqs, np.full(pad_to - freqs.shape[0], freqs[-1])])
    t = np.arange(n) / sample_rate
    ang = -2.0 * np.pi * freqs[:, None] * t[None, :]
    osc_re = np.cos(ang).astype(np.float32).reshape(-1, n2, n1)
    osc_im = np.sin(ang).astype(np.float32).reshape(-1, n2, n1)
    return osc_re, osc_im


def _make_kernel(precision: str):
    from jax.experimental import pallas as pl

    if precision == "bf16":
        def cast(a):
            return a.astype(jnp.bfloat16)
    else:
        def cast(a):
            return a

    def mm(ar, ai, br, bi):
        """Complex matmul over the LAST axis of (.., k) against (k, m)."""
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        sh = ar.shape[:-1]
        k = ar.shape[-1]
        ar = cast(ar.reshape(-1, k))
        ai = cast(ai.reshape(-1, k))
        br, bi = cast(br), cast(bi)
        rr = dot(ar, br) - dot(ai, bi)
        ri = dot(ar, bi) + dot(ai, br)
        m = br.shape[-1]
        return rr.reshape(sh + (m,)), ri.reshape(sh + (m,))

    def swap(a):
        return jnp.swapaxes(a, -1, -2)

    def kernel(x_re, x_im, osc_re, osc_im, rep_re, rep_im,
               d2fTr, d2fTi, twfr, twfi, d1fr, d1fi,
               id1r, id1i, twir, twii, id2r, id2i, out_ref):
        b = pl.program_id(1)
        # Doppler mix: (Ft, n2, n1) = x (n2, n1) * osc (Ft, n2, n1)
        xr, xi = x_re[0], x_im[0]
        mr = xr[None] * osc_re[:] - xi[None] * osc_im[:]
        mi = xr[None] * osc_im[:] + xi[None] * osc_re[:]
        # forward stage A over t2: swap -> (Ft, n1, n2), right-mult d2fT
        yr, yi = mm(swap(mr), swap(mi), d2fTr[:], d2fTi[:])  # (Ft, n1, k2)
        # twiddle in [k2, t1] layout: swap first
        yr, yi = swap(yr), swap(yi)                          # (Ft, n2, n1)
        zr = yr * twfr[:][None] - yi * twfi[:][None]
        zi = yr * twfi[:][None] + yi * twfr[:][None]
        # forward stage B over t1 -> M[ft, k2, k1]
        mr2, mi2 = mm(zr, zi, d1fr[:], d1fi[:])
        # replica product: (Ft, 1, n2, n1) x (1, C, n2, n1)
        pr = rep_re[:][None] * mr2[:, None] - rep_im[:][None] * mi2[:, None]
        pi = rep_re[:][None] * mi2[:, None] + rep_im[:][None] * mr2[:, None]
        # inverse stage A over k1
        ar, ai = mm(pr, pi, id1r[:], id1i[:])            # (Ft, C, n2, t1)
        br = ar * twir[:][None, None] - ai * twii[:][None, None]
        bi = ar * twii[:][None, None] + ai * twir[:][None, None]
        # swap -> (Ft, C, n1, k2); inverse stage B over k2
        xr2, xi2 = mm(swap(br), swap(bi), id2r[:], id2i[:])  # (Ft, C, n1, t2)
        p = xr2 * xr2 + xi2 * xi2                        # (Ft, C, n1, n2)
        # the [t1, t2] -> [t2, t1] de-permute happens outside the kernel
        # (XLA transpose of the final surface) — one less VMEM relayout here

        @pl.when(b == 0)
        def _():
            out_ref[:] = p

        @pl.when(b != 0)
        def _():
            out_ref[:] = out_ref[:] + p

    return kernel


def _pick_freq_tile(nf: int, nprn: int, n: int) -> int:
    """Largest tile with bounded VMEM (several (Ft,C,n2,n1) f32 pairs).

    Measured on v5e for the GPS search (C=32, n=2048): ft=8 is the knee —
    larger tiles re-spill the intermediates, smaller ones leave MXU calls
    sliver-shaped.
    """
    budget = 16 * (1 << 20)                # intermediates' VMEM share
    per_freq = nprn * n * 4 * 6            # ~6 live (re, im) planes
    ft = max(1, min(8, budget // max(per_freq, 1)))
    return int(ft)


def caf_accumulate_fused(blocks, replica_fft_conj, freqs,
                         sample_rate: float, *,
                         precision: str = "f32",
                         freq_tile: int | None = None,
                         interpret: bool | None = None) -> jax.Array:
    """Drop-in fused version of `caf.caf_accumulate`.

    blocks: CArray/complex (n_blocks, n). replica_fft_conj: CArray (n_prn, n)
    with HOST (numpy) planes, natural frequency order. freqs: concrete
    (n_freq,) array of Doppler bins [Hz]. Returns (n_prn, n_freq, n) float32.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = cplx.asarray(blocks)
    nb, n = x.shape
    k = _dft_consts(n)
    n1, n2 = k["n1"], k["n2"]

    rep = replica_fft_conj
    if not isinstance(rep, cplx.CArray):
        rep = cplx.asarray(rep)
    rep_re = np.asarray(rep.re, np.float32)
    rep_im = np.asarray(rep.im, np.float32)
    nprn = rep_re.shape[0]
    prr, pri = permute_replica(rep_re, rep_im, n1, n2)

    freqs_np = np.asarray(freqs, np.float64).reshape(-1)
    nf = freqs_np.shape[0]
    if freq_tile is None:
        freq_tile = _pick_freq_tile(nf, nprn, n)
    nfp = -(-nf // freq_tile) * freq_tile
    osc_re, osc_im = _osc_table(tuple(freqs_np.tolist()), float(sample_rate),
                                n, n1, n2, nfp)

    x3 = cplx.apply(lambda a: a.reshape(nb, n2, n1), x)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    kern = _make_kernel(precision)

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map)

    ft = freq_tile
    in_specs = [
        spec((1, n2, n1), lambda f, b: (b, 0, 0)),       # x re
        spec((1, n2, n1), lambda f, b: (b, 0, 0)),       # x im
        spec((ft, n2, n1), lambda f, b: (f, 0, 0)),      # osc re
        spec((ft, n2, n1), lambda f, b: (f, 0, 0)),      # osc im
        spec((nprn, n2, n1), lambda f, b: (0, 0, 0)),    # rep re
        spec((nprn, n2, n1), lambda f, b: (0, 0, 0)),    # rep im
        spec((n2, n2), lambda f, b: (0, 0)),             # d2fT re
        spec((n2, n2), lambda f, b: (0, 0)),
        spec((n2, n1), lambda f, b: (0, 0)),             # twf
        spec((n2, n1), lambda f, b: (0, 0)),
        spec((n1, n1), lambda f, b: (0, 0)),             # d1f
        spec((n1, n1), lambda f, b: (0, 0)),
        spec((n1, n1), lambda f, b: (0, 0)),             # id1
        spec((n1, n1), lambda f, b: (0, 0)),
        spec((n2, n1), lambda f, b: (0, 0)),             # twi
        spec((n2, n1), lambda f, b: (0, 0)),
        spec((n2, n2), lambda f, b: (0, 0)),             # id2
        spec((n2, n2), lambda f, b: (0, 0)),
    ]
    out_spec = spec((ft, nprn, n1, n2), lambda f, b: (f, 0, 0, 0))

    kwargs = {}
    if not interpret:
        # v5e has 128 MiB of VMEM; the default 16 MiB scoped limit is too
        # small for the (ft, C, n2, n1) intermediates at useful freq tiles.
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(nfp // ft, nb),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nfp, nprn, n1, n2), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(x3.re, x3.im,
      jnp.asarray(osc_re), jnp.asarray(osc_im),
      jnp.asarray(prr), jnp.asarray(pri),
      jnp.asarray(k["d2fT"][0]), jnp.asarray(k["d2fT"][1]),
      jnp.asarray(k["twf"][0]), jnp.asarray(k["twf"][1]),
      jnp.asarray(k["d1f"][0]), jnp.asarray(k["d1f"][1]),
      jnp.asarray(k["id1"][0]), jnp.asarray(k["id1"][1]),
      jnp.asarray(k["twi"][0]), jnp.asarray(k["twi"][1]),
      jnp.asarray(k["id2"][0]), jnp.asarray(k["id2"][1]))

    # (Fp, C, n1, n2) [f, c, t1, t2] -> (C, F, n2, n1) -> (C, F, n): the lag
    # t = n1*t2 + t1 is the natural minor flatten of (n2, n1).
    out = jnp.transpose(out, (1, 0, 3, 2)).reshape(nprn, nfp, n)
    return out[:, :nf]


# ---------------------------------------------------------------------------
# v2 kernel: lane-resident layout.
#
# Profiling the v1 kernel on v5e showed its cost is linear in (n_prn x
# n_freq) with bf16 operands giving no speedup — i.e. it is NOT MXU-flop
# bound. The culprit is layout: v1 carries the big (freq_tile, C, ., .)
# tensors through the replica product / inverse stage A / twiddle section
# with a minor dimension of n1 (16 for the GPS 2048-lag search). TPU vregs
# are 8x128; a minor dim of 16 wastes 7/8 of every lane AND makes the k=16
# stage-A matmuls 8x-padded MXU slivers.
#
# v2 picks the dual decimation  t = t2 + n2*t1,  k = k1 + n1*k2  (n2 a lane
# multiple, n1 a power-of-two divisor of 128) so that every tensor that
# scales with (freq x PRN) keeps a minor dimension of n2 >= 128:
#
#   mix:     m[f, t1, t2]   = x[t1, t2] * osc[f, t1, t2]        (natural
#            reshape of both: t = t2 + n2*t1 is row-major order)
#   fwd 1:   U[f, k1, t2]   = sum_t1 W_n1^{t1 k1} m[f, t1, t2]
#            == (I_ft (x) W1^T) @ m_flat          one (ft*n1, ft*n1) matmul
#   fwd tw:  V = U * W_n^{k1 t2}                                (n1, n2) tbl
#   fwd 2:   M[f, k1, k2]   = sum_t2 V[f, k1, t2] W_n2^{t2 k2}  full-k mm
#   product: P[f, c, k1, k2] = M * rep[c, k1, k2]               minor n2
#   inv 1:   Q[f, c, k1, t2] = sum_k2 P W_n2^{-k2 t2}           full-k mm
#            (the C-heavy matmul — now k = n2 >= 128, full MXU)
#   inv tw:  R = Q * W_n^{-k1 t2}
#   inv 2:   y[f, c, t1, t2] = sum_k1 R W_n1^{-k1 t1} / n
#            swap -> (.., t2, k1), (n1, n1) matmul, swap back; power; acc.
#
# Only inv 2 needs (two) minor-dim swaps of a big tensor and one (n1, n1)
# sliver matmul (a row-grouped block-diagonal (128, 128) formulation would
# remove the sliver, but Mosaic cannot shape-cast the minor 16 -> 128 row
# merge); everything else — in particular the replica product, the C-heavy
# inverse-1 matmul, and both twiddles — is lane-resident with full-width
# contractions. The lag comes out in natural order: t = t2 + n2*t1.
# ---------------------------------------------------------------------------


_MAX_N2_V2 = 1024   # (n2, n2) DFT matrices must stay VMEM-friendly


def factorization_v2(n: int) -> tuple[int, int] | None:
    """(n1, n2): n1 the largest power-of-two divisor of 128 with n2 = n/n1 a
    multiple of 128. Minimizing n2 minimizes inv-1 matmul FLOPs (ft*C*n*n2).

    Returns None when the best achievable n2 exceeds `_MAX_N2_V2` (the two
    complex (n2, n2) stage matrices would blow the VMEM budget) — those
    sizes fall back to the v1 kernel, whose n1 range is not power-of-two
    constrained (e.g. n = 81*128)."""
    for n1 in (128, 64, 32, 16, 8, 4, 2, 1):
        if n % n1 == 0 and (n // n1) % _LANE == 0:
            n2 = n // n1
            return (n1, n2) if n2 <= _MAX_N2_V2 else None
    return None


def supported_v2(n: int) -> bool:
    return factorization_v2(n) is not None


@functools.lru_cache(maxsize=16)
def _dft_consts_v2(n: int, freq_tile: int,
                   fact: tuple[int, int] | None = None) -> dict:
    n1, n2 = factorization_v2(n) if fact is None else fact
    t1 = np.arange(n1)
    k1 = np.arange(n1)
    t2 = np.arange(n2)
    k2 = np.arange(n2)

    def cs(ang):
        return np.cos(ang).astype(np.float32), np.sin(ang).astype(np.float32)

    def blockdiag(mat_re, mat_im, reps):
        eye = np.eye(reps, dtype=np.float32)
        return np.kron(eye, mat_re), np.kron(eye, mat_im)

    # fwd 1: U_flat = L1 @ m_flat, L1 = blockdiag_ft(W1^T),
    # W1[t1, k1] = e^{-2 pi i t1 k1 / n1}
    w1 = cs(-2.0 * np.pi * np.outer(t1, k1) / n1)
    l1 = blockdiag(w1[0].T.copy(), w1[1].T.copy(), freq_tile)
    t1f = cs(-2.0 * np.pi * np.outer(k1, t2) / n)            # (n1, n2) fwd tw
    d2f = cs(-2.0 * np.pi * np.outer(t2, k2) / n2)           # (n2, n2) [t2,k2]
    d2i = cs(+2.0 * np.pi * np.outer(k2, t2) / n2)           # (n2, n2) [k2,t2]
    t2i = cs(+2.0 * np.pi * np.outer(k1, t2) / n)            # (n1, n2) inv tw
    ang = +2.0 * np.pi * np.outer(k1, t1) / n1
    b2 = (np.cos(ang).astype(np.float32) / n,
          np.sin(ang).astype(np.float32) / n)                # [k1, t1], /n
    return {"n1": n1, "n2": n2, "l1": l1, "t1f": t1f,
            "d2f": d2f, "d2i": d2i, "t2i": t2i, "b2": b2}


def permute_replica_v2(rep_re: np.ndarray, rep_im: np.ndarray,
                       n1: int, n2: int) -> tuple[np.ndarray, np.ndarray]:
    """(C, n) natural freq order -> (C, n1, n2) permuted k = k1 + n1*k2."""
    c = rep_re.shape[0]
    pr = np.ascontiguousarray(
        rep_re.reshape(c, n2, n1).transpose(0, 2, 1), dtype=np.float32)
    pi = np.ascontiguousarray(
        rep_im.reshape(c, n2, n1).transpose(0, 2, 1), dtype=np.float32)
    return pr, pi


@functools.lru_cache(maxsize=16)
def _osc_table_v2(freqs_key: tuple, sample_rate: float, n: int, n1: int,
                  n2: int, pad_to: int) -> tuple[np.ndarray, np.ndarray]:
    """Doppler phasors e^{-j 2 pi f t / fs}, natural (F, n1, n2) layout."""
    freqs = np.asarray(freqs_key, np.float64)
    if pad_to > freqs.shape[0]:
        freqs = np.concatenate(
            [freqs, np.full(pad_to - freqs.shape[0], freqs[-1])])
    t = np.arange(n) / sample_rate
    ang = -2.0 * np.pi * freqs[:, None] * t[None, :]
    osc_re = np.cos(ang).astype(np.float32).reshape(-1, n1, n2)
    osc_im = np.sin(ang).astype(np.float32).reshape(-1, n1, n2)
    return osc_re, osc_im


def _make_kernel_v2(precision: str, n1: int, n2: int):
    from jax.experimental import pallas as pl

    if precision == "bf16":
        def cast(a):
            return a.astype(jnp.bfloat16)
    else:
        def cast(a):
            return a

    def mm(ar, ai, br, bi):
        """Complex matmul over the LAST axis of (.., k) against (k, m)."""
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        sh = ar.shape[:-1]
        k = ar.shape[-1]
        ar = cast(ar.reshape(-1, k))
        ai = cast(ai.reshape(-1, k))
        br, bi = cast(br), cast(bi)
        rr = dot(ar, br) - dot(ai, bi)
        ri = dot(ar, bi) + dot(ai, br)
        m = br.shape[-1]
        return rr.reshape(sh + (m,)), ri.reshape(sh + (m,))

    def kernel(x_re, x_im, osc_re, osc_im, rep_re, rep_im,
               l1r, l1i, t1fr, t1fi, d2fr, d2fi, d2ir, d2ii,
               t2ir, t2ii, b2r, b2i, out_ref):
        b = pl.program_id(1)
        ft = osc_re.shape[0]
        # Doppler mix, natural [t1, t2] layout (minor n2)
        xr, xi = x_re[0], x_im[0]
        mr = xr[None] * osc_re[:] - xi[None] * osc_im[:]
        mi = xr[None] * osc_im[:] + xi[None] * osc_re[:]
        # fwd 1: one block-diagonal left-matmul over (ft*t1)
        ur, ui = mm(l1r[:], l1i[:],
                    mr.reshape(ft * n1, n2), mi.reshape(ft * n1, n2))
        ur = ur.reshape(ft, n1, n2)
        ui = ui.reshape(ft, n1, n2)
        # fwd twiddle [k1, t2]
        vr = ur * t1fr[:][None] - ui * t1fi[:][None]
        vi = ur * t1fi[:][None] + ui * t1fr[:][None]
        # fwd 2: contract t2 (minor, full lanes) -> M[ft, k1, k2]
        mr2, mi2 = mm(vr, vi, d2fr[:], d2fi[:])
        # replica product, minor n2 throughout: (ft, 1, ..) x (1, C, ..)
        pr = rep_re[:][None] * mr2[:, None] - rep_im[:][None] * mi2[:, None]
        pi = rep_re[:][None] * mi2[:, None] + rep_im[:][None] * mr2[:, None]
        # inv 1: contract k2 (minor, full lanes) — the C-heavy matmul
        qr, qi = mm(pr, pi, d2ir[:], d2ii[:])            # (ft, C, k1, t2)
        # inv twiddle [k1, t2]
        rr = qr * t2ir[:][None, None] - qi * t2ii[:][None, None]
        ri = qr * t2ii[:][None, None] + qi * t2ir[:][None, None]
        # inv 2: swap to [t2, k1], contract k1 (n1-wide), swap back.
        # (A row-grouped (I_g (x) W1i) full-width matmul would be ideal, but
        # Mosaic cannot shape-cast the minor dim 16 -> 128 merge; the (n1,n1)
        # matmul is the one remaining sliver — everything C-scaled and
        # elementwise is already lane-resident.)
        sr = jnp.swapaxes(rr, -1, -2)                    # (ft, C, t2, k1)
        si = jnp.swapaxes(ri, -1, -2)
        yr, yi = mm(sr, si, b2r[:], b2i[:])              # (ft, C, t2, t1)
        yr = jnp.swapaxes(yr, -1, -2)                    # (ft, C, t1, t2)
        yi = jnp.swapaxes(yi, -1, -2)
        p = yr * yr + yi * yi                            # (ft, C, t1, t2)

        @pl.when(b == 0)
        def _():
            out_ref[:] = p

        @pl.when(b != 0)
        def _():
            out_ref[:] = out_ref[:] + p

    return kernel


def caf_accumulate_fused_v2(blocks, replica_fft_conj, freqs,
                            sample_rate: float, *,
                            precision: str = "f32",
                            freq_tile: int | None = None,
                            interpret: bool | None = None) -> jax.Array:
    """Lane-resident variant of `caf_accumulate_fused` (see module notes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = cplx.asarray(blocks)
    nb, n = x.shape
    n1, n2 = factorization_v2(n)

    rep = replica_fft_conj
    if not isinstance(rep, cplx.CArray):
        rep = cplx.asarray(rep)
    rep_re = np.asarray(rep.re, np.float32)
    rep_im = np.asarray(rep.im, np.float32)
    nprn = rep_re.shape[0]
    prr, pri = permute_replica_v2(rep_re, rep_im, n1, n2)

    freqs_np = np.asarray(freqs, np.float64).reshape(-1)
    nf = freqs_np.shape[0]
    if freq_tile is None:
        freq_tile = _pick_freq_tile(nf, nprn, n)
    nfp = -(-nf // freq_tile) * freq_tile
    k = _dft_consts_v2(n, freq_tile)
    osc_re, osc_im = _osc_table_v2(tuple(freqs_np.tolist()),
                                   float(sample_rate), n, n1, n2, nfp)

    x3 = cplx.apply(lambda a: a.reshape(nb, n1, n2), x)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    kern = _make_kernel_v2(precision, n1, n2)

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map)

    ft = freq_tile
    in_specs = [
        spec((1, n1, n2), lambda f, b: (b, 0, 0)),       # x re
        spec((1, n1, n2), lambda f, b: (b, 0, 0)),       # x im
        spec((ft, n1, n2), lambda f, b: (f, 0, 0)),      # osc re
        spec((ft, n1, n2), lambda f, b: (f, 0, 0)),      # osc im
        spec((nprn, n1, n2), lambda f, b: (0, 0, 0)),    # rep re
        spec((nprn, n1, n2), lambda f, b: (0, 0, 0)),    # rep im
        spec((ft * n1, ft * n1), lambda f, b: (0, 0)),   # L1
        spec((ft * n1, ft * n1), lambda f, b: (0, 0)),
        spec((n1, n2), lambda f, b: (0, 0)),             # fwd twiddle
        spec((n1, n2), lambda f, b: (0, 0)),
        spec((n2, n2), lambda f, b: (0, 0)),             # d2 fwd
        spec((n2, n2), lambda f, b: (0, 0)),
        spec((n2, n2), lambda f, b: (0, 0)),             # d2 inv
        spec((n2, n2), lambda f, b: (0, 0)),
        spec((n1, n2), lambda f, b: (0, 0)),             # inv twiddle
        spec((n1, n2), lambda f, b: (0, 0)),
        spec((n1, n1), lambda f, b: (0, 0)),             # W1 inverse (/n)
        spec((n1, n1), lambda f, b: (0, 0)),
    ]
    out_spec = spec((ft, nprn, n1, n2), lambda f, b: (f, 0, 0, 0))

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(nfp // ft, nb),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nfp, nprn, n1, n2), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(x3.re, x3.im,
      jnp.asarray(osc_re), jnp.asarray(osc_im),
      jnp.asarray(prr), jnp.asarray(pri),
      jnp.asarray(k["l1"][0]), jnp.asarray(k["l1"][1]),
      jnp.asarray(k["t1f"][0]), jnp.asarray(k["t1f"][1]),
      jnp.asarray(k["d2f"][0]), jnp.asarray(k["d2f"][1]),
      jnp.asarray(k["d2i"][0]), jnp.asarray(k["d2i"][1]),
      jnp.asarray(k["t2i"][0]), jnp.asarray(k["t2i"][1]),
      jnp.asarray(k["b2"][0]), jnp.asarray(k["b2"][1]))

    # (Fp, C, t1, t2) -> (C, F, t1, t2) -> (C, F, n): the lag t = t2 + n2*t1
    # is the natural row-major flatten of (t1, t2) — major-axis transpose only.
    out = jnp.transpose(out, (1, 0, 2, 3)).reshape(nprn, nfp, n)
    return out[:, :nf]


# ---------------------------------------------------------------------------
# v3 kernel: lane-merged (PRN x k1) layout.
#
# Ablating v2 on v5e (GPS search: C=32, n=2048, n1=16) shows its cost is NOT
# the matmuls: mix + forward DFT + replica product + inverse stage 1 +
# twiddle together take 0.36 ms — the two `swapaxes` around inverse stage 2
# take ~1.9 ms. With n1=16 the swap retiles every (freq, PRN)-sized tensor
# to a 16-wide minor dimension (7/8 of every vreg wasted, sublane/lane
# shuffles for the whole volume), and the (n1, n1) stage-2 matmul is an
# 8x-padded MXU sliver.
#
# v3 removes the swaps entirely by merging (C, k1) into ONE lane axis of
# width C*n1 (>= 128):
#
#   fwd (C-free, identical to v2)      -> M[f, k1, k2]
#   transpose M (small, C-free)        -> Mt[f, k2, k1]; tile C times over
#                                         lanes -> (f, k2, C*n1)
#   product against host-permuted      P[f, k2, (c,k1)] = Mt * R'
#     replica R'[k2, (c,k1)]             (elementwise, full lanes)
#   inv 1: LEFT matmul per freq row    Q[f] = D2i^T @ P[f]
#     ((n2, n2) @ (n2, C*n1))            (contract k2, full lanes)
#   inv twiddle (tiled to lanes)       R = Q * T'[t2, (c,k1)]
#   inv 2: per 128-lane group, matmul  y_g = R[:, g] @ (I_{128/n1} (x) W1inv)
#     against ONE shared (128, 128)      (contract (c,k1) -> (c,t1) within
#     block-diagonal kron                each lane group; the block-diagonal
#                                        pattern repeats every 128 lanes, so
#                                        all groups share the same small
#                                        matrix and the zero-block waste is
#                                        128/n1-fold, not C-fold — measured
#                                        1.60 -> 0.87 ms on the GPS search
#                                        vs the dense (C*n1, C*n1) kron)
#   power, accumulate                  out[f, t2, (c,t1)] += |y|^2
#
# The de-permute (F, t2, C, t1) -> (C, F, t1, t2) happens outside the kernel
# as one XLA transpose of the final 18 MB surface.
#
# Applicability: C*n1 must be a lane multiple (pad C with zero replicas
# otherwise) and the kron must stay VMEM-sized -> n1 <= 32. For n1 >= 64 the
# v2 swaps move >= 64-wide tiles and v2 remains the better kernel.
# ---------------------------------------------------------------------------

_MAX_N1_V3 = 32


def factorization_v3(n: int) -> tuple[int, int] | None:
    """(n1, n2) for the lane-merged kernel: n1 the largest power-of-two
    <= _MAX_N1_V3 with n2 = n/n1 a lane multiple within the VMEM cap.

    Searched independently of `factorization_v2` because v2's greedy pick can
    exceed v3's n1 cap while a smaller-n1 split still qualifies (e.g.
    n = 16384: v2 picks (128, 128); v3 uses (32, 512) — the Galileo E1B
    10 ms coherent block at 2 samples/chip)."""
    for n1 in (32, 16, 8, 4, 2, 1):
        if n % n1 == 0 and (n // n1) % _LANE == 0:
            n2 = n // n1
            return (n1, n2) if n2 <= _MAX_N2_V2 else None
    return None


def supported_v3(n: int, n_prn: int) -> bool:
    f = factorization_v3(n)
    if f is None:
        return False
    n1, _ = f
    cp = _pad_prn_v3(n_prn, n1)
    # keep the kron and the per-tile product planes VMEM-reasonable
    return cp * n1 <= 4096


def _pad_prn_v3(n_prn: int, n1: int) -> int:
    """Smallest C' >= n_prn with C'*n1 a lane multiple."""
    step = _LANE // np.gcd(_LANE, n1)
    return -(-n_prn // step) * step


@functools.lru_cache(maxsize=16)
def _dft_consts_v3(n: int, freq_tile: int, n_prn_padded: int) -> dict:
    base = _dft_consts_v2(n, freq_tile, factorization_v3(n))
    n1, n2 = base["n1"], base["n2"]
    cp = n_prn_padded
    # inverse stage 1 as a LEFT matmul: Q = D2iT @ P, D2iT[t2, k2]
    d2iT = (base["d2i"][0].T.copy(), base["d2i"][1].T.copy())
    # inverse twiddle tiled over merged (c, k1) lanes: T'[t2, c*n1 + k1]
    t2i_r, t2i_i = base["t2i"]                    # (n1, n2) [k1, t2]
    ttile_r = np.ascontiguousarray(
        np.broadcast_to(t2i_r.T[:, None, :], (n2, cp, n1)).reshape(n2, cp * n1))
    ttile_i = np.ascontiguousarray(
        np.broadcast_to(t2i_i.T[:, None, :], (n2, cp, n1)).reshape(n2, cp * n1))
    # inverse stage 2: shared per-lane-group kron I_{gw/n1} (x) W1inv.
    # The (cp*n1, cp*n1) block-diagonal repeats every gw = _LANE lanes, so
    # one (gw, gw) matrix serves every group (cp*n1 is a lane multiple by
    # construction and n1 | _LANE since n1 is a power of two <= 128).
    eye = np.eye(_LANE // n1, dtype=np.float32)
    g_r = np.kron(eye, base["b2"][0])
    g_i = np.kron(eye, base["b2"][1])
    return {**base, "d2iT": d2iT, "ttile": (ttile_r, ttile_i),
            "g": (g_r, g_i), "cp": cp}


def permute_replica_v3(rep_re: np.ndarray, rep_im: np.ndarray,
                       n1: int, n2: int,
                       n_prn_padded: int) -> tuple[np.ndarray, np.ndarray]:
    """(C, n) natural freq order -> (n2, Cp*n1) lane-merged (k2, (c, k1))."""
    c = rep_re.shape[0]
    cp = n_prn_padded

    def prep(a):
        # (C, n) -> (C, n2, n1) [c, k2, k1] (k = k1 + n1*k2)
        p = a.reshape(c, n2, n1)
        if cp > c:
            p = np.concatenate(
                [p, np.zeros((cp - c, n2, n1), np.float32)], axis=0)
        # -> (k2, c, k1) -> (k2, cp*n1)
        return np.ascontiguousarray(
            p.transpose(1, 0, 2).reshape(n2, cp * n1), dtype=np.float32)

    return prep(np.asarray(rep_re, np.float32)), \
        prep(np.asarray(rep_im, np.float32))


def permute_replica_v3_jnp(rep_re, rep_im, n1: int, n2: int,
                           n_prn_padded: int):
    """`permute_replica_v3` as traceable jnp ops, for device-resident /
    traced replica planes (e.g. the in-trace coarse-shifted replicas of
    the PCF search, which must NOT be baked into the program as host
    constants — a 57-coarse-bin Galileo table is ~270 MB of inlined HLO,
    which remote-compile services reject outright)."""
    c = rep_re.shape[0]
    cp = n_prn_padded

    def prep(a):
        p = jnp.asarray(a, jnp.float32).reshape(c, n2, n1)
        if cp > c:
            p = jnp.concatenate(
                [p, jnp.zeros((cp - c, n2, n1), jnp.float32)], axis=0)
        return jnp.transpose(p, (1, 0, 2)).reshape(n2, cp * n1)

    return prep(rep_re), prep(rep_im)


def _make_kernel_v3(precision: str, n1: int, n2: int, cp: int,
                    block_axis: int = 1, n_blocks: int | None = None,
                    stats_excl: int | None = None):
    """block_axis: which grid axis is the accumulate-over-blocks axis
    (1 for the classic (freq, block) grid; 2 for the single-launch PCF
    (row, chunk, block) grid — it must be the INNERMOST axis so the
    output block stays resident across the accumulation).

    n_blocks (channel-major store mode): when set, the kernel
    accumulates the power into a VMEM scratch in the compute-natural
    (t2, (c, t1)) layout and, on the LAST block step, stores the
    TRANSPOSED ((c, t1), t2) block — so the host-side de-permute of the
    final surface needs only major-axis moves (contiguous n-length rows)
    instead of a minor-dim relayout of the whole surface. One (n2, cm)
    VMEM transpose per output tile replaces an HBM round trip of the
    full surface through an XLA transpose (the r4 CAF epilogue cost).

    stats_excl (requires n_blocks): instead of the surface, the last
    block step REDUCES the accumulated (n2, cm) tile to per-channel
    acquisition statistics — peak, peak lag, second peak outside a
    circular +/-stats_excl-sample window (checkacquisition's exclusion,
    sdracq.c:52-68), total sum and window sum — and stores an 8-row
    (8, cp) stats tile. The full delay x Doppler surface then NEVER
    leaves VMEM: output HBM traffic drops from the whole surface
    (~24 MB for the GPS search) to ~100 KB, and the XLA-side
    `acquisition_test` reductions disappear with it."""
    from jax.experimental import pallas as pl

    if precision == "bf16":
        def cast(a):
            return a.astype(jnp.bfloat16)
    else:
        def cast(a):
            return a

    def dot(a, b):
        return jnp.dot(cast(a), cast(b), preferred_element_type=jnp.float32)

    def kernel(x_re, x_im, osc_re, osc_im, rep_re, rep_im,
               l1r, l1i, t1fr, t1fi, d2fr, d2fi,
               d2iTr, d2iTi, ttr, tti, gr, gi, out_ref,
               *scratch):
        b = pl.program_id(block_axis)
        ft = osc_re.shape[0]
        # Doppler mix + forward DFT: identical to v2 (C-free)
        xr, xi = x_re[0], x_im[0]
        mr = xr[None] * osc_re[:] - xi[None] * osc_im[:]
        mi = xr[None] * osc_im[:] + xi[None] * osc_re[:]
        ur = (dot(l1r[:], mr.reshape(ft * n1, n2))
              - dot(l1i[:], mi.reshape(ft * n1, n2))).reshape(ft, n1, n2)
        ui = (dot(l1r[:], mi.reshape(ft * n1, n2))
              + dot(l1i[:], mr.reshape(ft * n1, n2))).reshape(ft, n1, n2)
        vr = ur * t1fr[:][None] - ui * t1fi[:][None]
        vi = ur * t1fi[:][None] + ui * t1fr[:][None]
        m2r = (dot(vr.reshape(ft * n1, n2), d2fr[:])
               - dot(vi.reshape(ft * n1, n2), d2fi[:])).reshape(ft, n1, n2)
        m2i = (dot(vr.reshape(ft * n1, n2), d2fi[:])
               + dot(vi.reshape(ft * n1, n2), d2fr[:])).reshape(ft, n1, n2)
        # transpose the SMALL C-free spectrum and tile over merged lanes
        mtr = jnp.tile(jnp.swapaxes(m2r, -1, -2), (1, 1, cp))  # (ft,n2,cp*n1)
        mti = jnp.tile(jnp.swapaxes(m2i, -1, -2), (1, 1, cp))
        # replica product, full lanes
        pr = rep_re[:][None] * mtr - rep_im[:][None] * mti
        pi = rep_re[:][None] * mti + rep_im[:][None] * mtr
        # inv 1: left matmul per freq row (contract k2)
        qs = []
        for f in range(ft):
            qr = dot(d2iTr[:], pr[f]) - dot(d2iTi[:], pi[f])
            qi = dot(d2iTr[:], pi[f]) + dot(d2iTi[:], pr[f])
            qs.append((qr, qi))
        qr = jnp.stack([q[0] for q in qs])               # (ft, t2, cp*n1)
        qi = jnp.stack([q[1] for q in qs])
        # inv twiddle (tiled)
        rr = qr * ttr[:][None] - qi * tti[:][None]
        ri = qr * tti[:][None] + qi * ttr[:][None]
        # inv 2: per 128-lane group, matmul against the SHARED small kron
        # (the block-diagonal repeats every _LANE lanes); aligned lane
        # slices + concat, no relayouts.
        cm = cp * n1
        rr2 = rr.reshape(ft * n2, cm)
        ri2 = ri.reshape(ft * n2, cm)
        parts = []
        for g in range(cm // _LANE):
            s = g * _LANE
            ar = rr2[:, s:s + _LANE]
            ai = ri2[:, s:s + _LANE]
            yr = dot(ar, gr[:]) - dot(ai, gi[:])
            yi = dot(ar, gi[:]) + dot(ai, gr[:])
            parts.append(yr * yr + yi * yi)
        p = jnp.concatenate(parts, axis=-1).reshape(ft, n2, cm)

        if n_blocks is None:               # classic layout-preserving store
            @pl.when(b == 0)
            def _():
                out_ref[:] = p

            @pl.when(b != 0)
            def _():
                out_ref[:] = out_ref[:] + p
            return

        acc = scratch[0]                   # (n2, cm) VMEM accumulator

        @pl.when(b == 0)
        def _():
            acc[:] = p[0]

        @pl.when(b != 0)
        def _():
            acc[:] = acc[:] + p[0]

        if stats_excl is None:
            @pl.when(b == n_blocks - 1)
            def _():
                out_ref[0] = jnp.swapaxes(acc[:], 0, 1)    # ((c, t1), t2)
            return

        n = n1 * n2
        cm = cp * n1
        # Mosaic supports lane rotates + sublane reductions but NOT
        # vector reshapes that regroup lanes — so every reduction below
        # stays in (n2, cm)/(1, cm) shapes: sublane (t2) reductions
        # first, then SEGMENTED lane reductions over each channel's n1
        # consecutive lanes via log2(n1) roll-trees. Channel results
        # land on the group-lead lane (ch*n1); the launcher selects
        # them outside the kernel (a tiny strided slice in XLA).
        shifts = []
        k = 1
        while k < n1:
            shifts.append(k)
            k *= 2
        assert k == n1, f"n1 {n1} must be a power of two for stats mode"

        def seg_max(v):
            for s in shifts:
                v = jnp.maximum(v, jnp.roll(v, -s, axis=1))
            return v

        def seg_max_arg(v, a):
            for s in shifts:
                vr = jnp.roll(v, -s, axis=1)
                ar = jnp.roll(a, -s, axis=1)
                take = vr > v                  # ties keep the lower t1
                v = jnp.maximum(v, vr)
                a = jnp.where(take, ar, a)
            return v, a

        def seg_sum(v):
            for s in shifts:
                v = v + jnp.roll(v, -s, axis=1)
            return v

        def seg_bcast(v, lane_off):
            # v valid at group-lead lanes -> broadcast to all n1 lanes
            # (prefix doubling: after step s, offsets < 2s are filled)
            for s in shifts:
                v = jnp.where(lane_off >= s,
                              jnp.roll(v, s, axis=1), v)
            return v

        # n1 is a power of two (asserted above); n, n2 power-of-two lets
        # the circular-lag arithmetic use AND masks instead of integer
        # modulo (a real VPU cost at (n2, cm) scale)
        pow2 = (n & (n - 1)) == 0 and (n2 & (n2 - 1)) == 0

        @pl.when(b == n_blocks - 1)
        def _():
            A = acc[:]                                     # (n2, cm)
            # element (t2, ch*n1 + t1) holds lag t = n2*t1 + t2 of
            # channel ch
            lane1 = jax.lax.broadcasted_iota(jnp.int32, (1, cm), 1)
            lane_off = lane1 & (n1 - 1)                    # t1 per lane
            t1_l = jax.lax.broadcasted_iota(jnp.int32, (n2, cm), 1)
            t1_l = t1_l & (n1 - 1) if pow2 else t1_l % n1
            t2_l = jax.lax.broadcasted_iota(jnp.int32, (n2, cm), 0)
            lag = n2 * t1_l + t2_l
            # per-lane max / lag-argmax over t2 (lowest-t2 tie-break)
            m_lane = jnp.max(A, axis=0, keepdims=True)     # (1, cm)
            a_lane = jnp.min(jnp.where(A == m_lane, lag, n),
                             axis=0, keepdims=True)
            # channel max + argmax at the group-lead lane
            max1, arg1 = seg_max_arg(m_lane, a_lane)
            zero = jnp.zeros_like(max1)
            if stats_excl < 0:
                # peak-only mode: the detection statistic alone (the
                # flagship chain's per-PRN peak) — no exclusion passes
                out_ref[0] = jnp.concatenate(
                    [max1, arg1.astype(jnp.float32), zero, zero, zero,
                     zero, zero, zero], axis=0)            # (8, cm)
                return
            # circular +/-excl window around the channel peak
            argb = seg_bcast(arg1, lane_off)               # (1, cm)
            d0 = lag - argb + n
            d0 = d0 & (n - 1) if pow2 else d0 % n
            dist = jnp.minimum(d0, n - d0)
            ex = dist <= stats_excl
            exmax = seg_max(jnp.max(jnp.where(ex, -jnp.inf, A),
                                    axis=0, keepdims=True))
            wsum = seg_sum(jnp.sum(jnp.where(ex, A, 0.0),
                                   axis=0, keepdims=True))
            tot = seg_sum(jnp.sum(A, axis=0, keepdims=True))
            out_ref[0] = jnp.concatenate(
                [max1, arg1.astype(jnp.float32), exmax, tot, wsum,
                 zero, zero, zero], axis=0)                # (8, cm)

    return kernel


def _pick_freq_tile_v3(nf: int, cp: int, n1: int, n2: int) -> int:
    """Several (ft, n2, cp*n1) f32 plane pairs must fit in VMEM."""
    budget = 24 * (1 << 20)
    per_freq = cp * n1 * n2 * 4 * 8        # ~8 live planes
    ft = max(1, min(8, budget // max(per_freq, 1)))
    return int(ft)


def caf_accumulate_fused_v3(blocks, replica_fft_conj, freqs,
                            sample_rate: float, *,
                            precision: str = "f32",
                            freq_tile: int | None = None,
                            interpret: bool | None = None) -> jax.Array:
    """Lane-merged variant of `caf_accumulate_fused` (see module notes)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    x = cplx.asarray(blocks)
    nb, n = x.shape
    n1, n2 = factorization_v3(n)

    rep = replica_fft_conj
    if not isinstance(rep, cplx.CArray):
        rep = cplx.asarray(rep)
    nprn = rep.re.shape[0]
    cp = _pad_prn_v3(nprn, n1)
    if isinstance(rep.re, np.ndarray):
        prr, pri = permute_replica_v3(np.asarray(rep.re, np.float32),
                                      np.asarray(rep.im, np.float32),
                                      n1, n2, cp)
    else:
        # traced / device replicas (PCF coarse shifts): permute in-trace
        prr, pri = permute_replica_v3_jnp(rep.re, rep.im, n1, n2, cp)

    freqs_np = np.asarray(freqs, np.float64).reshape(-1)
    nf = freqs_np.shape[0]
    if freq_tile is None:
        freq_tile = _pick_freq_tile_v3(nf, cp, n1, n2)
    nfp = -(-nf // freq_tile) * freq_tile
    k = _dft_consts_v3(n, freq_tile, cp)
    osc_re, osc_im = _osc_table_v2(tuple(freqs_np.tolist()),
                                   float(sample_rate), n, n1, n2, nfp)

    x3 = cplx.apply(lambda a: a.reshape(nb, n1, n2), x)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)

    kern = _make_kernel_v3(precision, n1, n2, cp)

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map)

    ft = freq_tile
    cm = cp * n1
    in_specs = [
        spec((1, n1, n2), lambda f, b: (b, 0, 0)),       # x re
        spec((1, n1, n2), lambda f, b: (b, 0, 0)),       # x im
        spec((ft, n1, n2), lambda f, b: (f, 0, 0)),      # osc re
        spec((ft, n1, n2), lambda f, b: (f, 0, 0)),      # osc im
        spec((n2, cm), lambda f, b: (0, 0)),             # rep' re
        spec((n2, cm), lambda f, b: (0, 0)),             # rep' im
        spec((ft * n1, ft * n1), lambda f, b: (0, 0)),   # L1
        spec((ft * n1, ft * n1), lambda f, b: (0, 0)),
        spec((n1, n2), lambda f, b: (0, 0)),             # fwd twiddle
        spec((n1, n2), lambda f, b: (0, 0)),
        spec((n2, n2), lambda f, b: (0, 0)),             # d2 fwd
        spec((n2, n2), lambda f, b: (0, 0)),
        spec((n2, n2), lambda f, b: (0, 0)),             # d2 inv (transposed)
        spec((n2, n2), lambda f, b: (0, 0)),
        spec((n2, cm), lambda f, b: (0, 0)),             # inv twiddle (tiled)
        spec((n2, cm), lambda f, b: (0, 0)),
        spec((_LANE, _LANE), lambda f, b: (0, 0)),   # kron I_{128/n1}(x)W1inv
        spec((_LANE, _LANE), lambda f, b: (0, 0)),
    ]
    out_spec = spec((ft, n2, cm), lambda f, b: (f, 0, 0))

    kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(nfp // ft, nb),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nfp, n2, cm), jnp.float32),
        interpret=interpret,
        **kwargs,
    )(x3.re, x3.im,
      jnp.asarray(osc_re), jnp.asarray(osc_im),
      jnp.asarray(prr), jnp.asarray(pri),
      jnp.asarray(k["l1"][0]), jnp.asarray(k["l1"][1]),
      jnp.asarray(k["t1f"][0]), jnp.asarray(k["t1f"][1]),
      jnp.asarray(k["d2f"][0]), jnp.asarray(k["d2f"][1]),
      jnp.asarray(k["d2iT"][0]), jnp.asarray(k["d2iT"][1]),
      jnp.asarray(k["ttile"][0]), jnp.asarray(k["ttile"][1]),
      jnp.asarray(k["g"][0]), jnp.asarray(k["g"][1]))

    # (Fp, t2, (c, t1)) -> (C, F, t1, t2) -> (C, F, n): t = t2 + n2*t1 is the
    # row-major flatten of (t1, t2); the padded PRN rows are sliced off.
    out = out.reshape(nfp, n2, cp, n1)
    out = jnp.transpose(out, (2, 0, 3, 1)).reshape(cp, nfp, n)
    return out[:nprn, :nf]


# ---------------------------------------------------------------------------
# PCF acquisition on the v3 kernel.
#
# `ops.caf.caf_accumulate_pcf` factorizes the Doppler search into
# (coarse integer-bin shifts x sub-bin sets x cross-block fine DFT) —
# ~4x fewer inverse DFTs than the per-Doppler form. The factorized search
# maps onto the EXISTING v3 kernel with no kernel changes:
#
#   - the group-fine combination is linear, so it folds into the TIME
#     domain: y[(s,fine), g](t) = e^{-j2pi s*off*t} sum_{b in g} w[b] x_b(t)
#     (one tiny XLA einsum prologue);
#   - each (s,fine) row is one v3 call with the n_groups combined signals
#     as the "blocks" axis — the kernel's non-coherent block accumulation
#     IS the group sum;
#   - the coarse axis rides the CHANNEL axis: host-precomputed circularly
#     shifted replica spectra rep[p, (k - c) mod n] (the shift phase falls
#     out of |.|^2), chunked so cp*n1 stays within the v3 VMEM gate.
#
# GPS search (32 PRN x 10 blocks x 2048): inverse-row count drops
# 22720 -> 5760 vs the direct v3 dispatch.
# ---------------------------------------------------------------------------


def supported_pcf(n: int, n_prn: int) -> bool:
    return factorization_v3(n) is not None and supported_v3(n, n_prn)


def pcf_stats_supported(n: int, n_prn: int, max_doppler_hz: float,
                        sample_rate: float) -> bool:
    """True when the in-kernel stats reduction is available: the fused
    PCF must take the single-launch path (host-precomputed coarse-shifted
    replicas within the inline-constant cap)."""
    if not supported_pcf(n, n_prn):
        return False
    n1, n2 = factorization_v3(n)
    # the segmented roll-trees need power-of-two lane groups, and the
    # circular-lag arithmetic uses AND masks for power-of-two n
    if (n1 & (n1 - 1)) or (n & (n - 1)) or (n2 & (n2 - 1)):
        return False
    bin_hz = sample_rate / n
    n_c = 2 * int(np.floor(max_doppler_hz / bin_hz)) + 1
    return n_prn * n_c * n * 8 <= PCF_HOST_REPLICA_MAX_BYTES


# Above this, the PCF coarse-shifted replica table is gathered in-trace
# from one natural-order constant instead of being host-precomputed and
# inlined into the program (tests monkeypatch it to force the gather path)
PCF_HOST_REPLICA_MAX_BYTES = 32 << 20

# Single-launch PCF: store each output tile channel-major from inside the
# kernel (one VMEM transpose per tile at the last group step) so the
# surface epilogue is major-axis-only. False = the r4 layout-preserving
# store + XLA minor-dim transpose epilogue (kept for A/B measurement).
PCF_CHANNEL_MAJOR_STORE = True


def caf_accumulate_pcf_fused(blocks, replica_fft_conj, sample_rate: float,
                             max_doppler_hz: float = 7000.0,
                             n_sets: int = 2,
                             fine_hz=(-200.0, 0.0, 200.0),
                             n_groups: int = 2, *,
                             precision: str = "bf16",
                             interpret: bool | None = None,
                             stats_excl: int | None = None):
    """Fused post-correlation-FFT acquisition surface.

    Same contract as `ops.caf.caf_accumulate_pcf` (returns
    (n_prn, n_coarse*n_sets*n_fine, n) with Doppler axis ordered
    (coarse, set, fine)); evaluated as n_sets*n_fine v3-kernel calls over
    coarse-chunked shifted replicas.

    stats_excl (single-launch path only — requires
    `pcf_stats_supported`): reduce the surface to per-(PRN, Doppler-row)
    acquisition statistics INSIDE the kernel and return the 5-tuple
    (max, arglag, excluded_max, total_sum, window_sum), each
    (n_prn, n_coarse*n_sets*n_fine) float32, where the exclusion is the
    circular +/-stats_excl-sample window of `checkacquisition`
    (sdracq.c:52-68). stats_excl=-1 is PEAK-ONLY mode: just (max,
    arglag) live, the three exclusion rows are zeros — the cheapest
    reduction for callers that only need the detection statistic. The
    surface never reaches HBM either way.
    """
    x = cplx.asarray(blocks)
    nb, n = x.shape
    if nb % n_groups:
        raise ValueError(f"n_blocks {nb} % n_groups {n_groups}")
    gl = nb // n_groups
    n1, _ = factorization_v3(n)
    bin_hz = sample_rate / n
    set_off = bin_hz / n_sets
    n_c = 2 * int(np.floor(max_doppler_hz / bin_hz)) + 1
    cvals = np.arange(n_c) - n_c // 2
    fine = np.asarray(fine_hz, np.float64)
    nF = fine.size
    t_block = n / sample_rate

    rep = replica_fft_conj
    if not isinstance(rep, cplx.CArray):
        rep = cplx.asarray(rep)
    rep_re = np.asarray(rep.re, np.float32)
    rep_im = np.asarray(rep.im, np.float32)
    nprn = rep_re.shape[0]

    # coarse-shifted replica spectra, chunked to the v3 VMEM gate
    k_idx = (np.arange(n)[None, :] - cvals[:, None]) % n        # (C, n)
    max_chunk = max((4096 // n1) // nprn, 1)
    chunks = [list(range(i, min(i + max_chunk, n_c)))
              for i in range(0, n_c, max_chunk)]
    # Host-precompute the shifted copies only while they stay a small
    # inlined constant; above the cap (Galileo E1B: 36 PRN x 57 coarse x
    # 16k lags = 269 MB -> remote-compile HTTP 413) embed ONE natural-order
    # replica and gather the shifts in-trace (loop-invariant, so XLA
    # hoists them out of scan loops).
    host_bytes = nprn * n_c * n * 8
    if host_bytes <= PCF_HOST_REPLICA_MAX_BYTES:
        rep_chunks = None            # single-launch path builds its own
    else:
        rep_d = cplx.CArray(jnp.asarray(rep_re), jnp.asarray(rep_im))
        iot = jnp.arange(n, dtype=jnp.int32)[None, :]
        rep_chunks = []
        for ch in chunks:
            cv = jnp.asarray(cvals[ch], jnp.int32)[:, None]
            idx = jnp.remainder(iot - cv, n)          # (len, n)
            rep_chunks.append(cplx.apply(
                lambda a, i=idx: jnp.take(a, i, axis=-1)
                .reshape(nprn * i.shape[0], n), rep_d))

    # XLA prologue: combined group signals y[(s,fine), g, t]
    b_idx = np.arange(nb, dtype=np.float64)
    wf = (fine[None, :] + (np.arange(n_sets, dtype=np.float64)
                           * set_off)[:, None])             # (S, F)
    ang = -2.0 * np.pi * wf[:, :, None] * (b_idx * t_block)[None, None, :]
    w_re = jnp.asarray(np.cos(ang).astype(np.float32))      # (S, F, B)
    w_im = jnp.asarray(np.sin(ang).astype(np.float32))
    t = jnp.arange(n, dtype=jnp.float32) / np.float32(sample_rate)
    sets = jnp.arange(n_sets, dtype=jnp.float32) * np.float32(set_off)
    mix = cplx.expi(-2.0 * jnp.pi * sets[:, None] * t[None, :])  # (S, n)

    xg_re = x.re.reshape(n_groups, gl, n)
    xg_im = x.im.reshape(n_groups, gl, n)
    wg_re = w_re.reshape(n_sets, nF, n_groups, gl)
    wg_im = w_im.reshape(n_sets, nF, n_groups, gl)
    y_re = (jnp.einsum("sfgb,gbn->sfgn", wg_re, xg_re)
            - jnp.einsum("sfgb,gbn->sfgn", wg_im, xg_im))
    y_im = (jnp.einsum("sfgb,gbn->sfgn", wg_re, xg_im)
            + jnp.einsum("sfgb,gbn->sfgn", wg_im, xg_re))
    # apply the per-set sub-bin mix (within-block time)
    mr = mix.re[:, None, None, :]
    mi = mix.im[:, None, None, :]
    yr = y_re * mr - y_im * mi
    yi = y_re * mi + y_im * mr                              # (S, F, G, n)

    zero = np.zeros(1, np.float64)
    if host_bytes <= PCF_HOST_REPLICA_MAX_BYTES:
        # SINGLE pallas launch: grid (rows, chunks, groups). The multi-
        # launch form paid ~10 us of launch overhead x (S*F x n_chunks)
        # kernels — for the GPS search that overhead exceeded the actual
        # MXU work. Rows and replica chunks become grid axes; the block
        # (group) axis stays innermost so the kernel's non-coherent
        # accumulation pattern is unchanged (block_axis=2).
        return _pcf_single_launch(
            cplx.CArray(yr, yi), chunks, rep_re, rep_im, k_idx,
            sample_rate, n_sets, nF, n_groups, n_c, nprn, n,
            precision=precision, interpret=interpret,
            stats_excl=stats_excl)
    if stats_excl is not None:
        raise ValueError(
            "stats_excl needs the single-launch PCF path; check "
            "pcf_stats_supported() before requesting stats")
    rows = []
    for s in range(n_sets):
        for f in range(nF):
            y_row = cplx.CArray(yr[s, f], yi[s, f])          # (G, n)
            per_chunk = []
            for ch, repc in zip(chunks, rep_chunks):
                out = caf_accumulate_fused_v3(
                    y_row, repc, zero, sample_rate,
                    precision=precision,
                    interpret=interpret)                     # (P*len, 1, n)
                per_chunk.append(out.reshape(nprn, len(ch), n))
            rows.append(jnp.concatenate(per_chunk, axis=1))  # (P, C, n)
    surf = jnp.stack(rows, axis=2)          # (P, C, S*F, n), row = s*nF+f
    return surf.reshape(nprn, n_c * n_sets * nF, n)


def _pcf_single_launch(y, chunks, rep_re, rep_im, k_idx, sample_rate,
                       n_sets, nF, n_groups, n_c, nprn, n, *,
                       precision: str, interpret: bool | None,
                       stats_excl: int | None = None):
    """One pallas_call for the whole PCF surface.

    y: (S, F, G, n) combined coherent-group signals (planar CArray).
    Every replica chunk is padded to the SAME channel count (the last
    chunk gets zero replicas, sliced off afterward) so all grid steps
    share one BlockSpec; grid = (S*F, n_chunks, G) with the group axis
    innermost for in-register accumulation.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, n2 = factorization_v3(n)
    R = n_sets * nF
    G = n_groups
    C = len(chunks)
    L = len(chunks[0])                       # max chunk length
    cp = _pad_prn_v3(nprn * L, n1)
    cm = cp * n1

    # replica planes per chunk, all padded to nprn*L channels
    prr_list, pri_list = [], []
    for ch in chunks:
        rr = rep_re[:, k_idx[ch]]                # (nprn, len, n)
        ri = rep_im[:, k_idx[ch]]
        if len(ch) < L:                          # pad PER PRN so channel
            pad = np.zeros((nprn, L - len(ch), n), np.float32)
            rr = np.concatenate([rr, pad], axis=1)   # index = p*L + ci
            ri = np.concatenate([ri, pad], axis=1)
        a, b_ = permute_replica_v3(rr.reshape(nprn * L, n),
                                   ri.reshape(nprn * L, n), n1, n2, cp)
        prr_list.append(a)
        pri_list.append(b_)
    prr = np.ascontiguousarray(np.stack(prr_list).reshape(C * n2, cm))
    pri = np.ascontiguousarray(np.stack(pri_list).reshape(C * n2, cm))

    k = _dft_consts_v3(n, 1, cp)
    osc_re, osc_im = _osc_table_v2((0.0,), float(sample_rate), n, n1, n2, 1)

    x3_re = y.re.reshape(R * G, n1, n2)
    x3_im = y.im.reshape(R * G, n1, n2)

    if interpret is None:
        interpret = jax.default_backend() not in ("tpu",)
    cmaj_store = PCF_CHANNEL_MAJOR_STORE or stats_excl is not None
    kern = _make_kernel_v3(precision, n1, n2, cp, block_axis=2,
                           n_blocks=G if cmaj_store else None,
                           stats_excl=stats_excl)

    def spec(shape, index_map):
        return pl.BlockSpec(shape, index_map)

    # grid order (chunk, row, group): the replica chunk (the LARGE
    # operand, n2 x cm x 2 planes ~ 2 MB) stays VMEM-resident across all
    # R rows before the next chunk loads — (row, chunk, ...) order would
    # re-stream every chunk R times from HBM. The group (block) axis
    # stays innermost for the in-register accumulation (block_axis=2).
    in_specs = [
        spec((1, n1, n2), lambda c, r, b: (r * G + b, 0, 0)),   # x re
        spec((1, n1, n2), lambda c, r, b: (r * G + b, 0, 0)),   # x im
        spec((1, n1, n2), lambda c, r, b: (0, 0, 0)),           # osc (zero f)
        spec((1, n1, n2), lambda c, r, b: (0, 0, 0)),
        spec((n2, cm), lambda c, r, b: (c, 0)),                 # rep' chunk
        spec((n2, cm), lambda c, r, b: (c, 0)),
        spec((n1, n1), lambda c, r, b: (0, 0)),                 # L1 (ft=1)
        spec((n1, n1), lambda c, r, b: (0, 0)),
        spec((n1, n2), lambda c, r, b: (0, 0)),                 # fwd twiddle
        spec((n1, n2), lambda c, r, b: (0, 0)),
        spec((n2, n2), lambda c, r, b: (0, 0)),                 # d2 fwd
        spec((n2, n2), lambda c, r, b: (0, 0)),
        spec((n2, n2), lambda c, r, b: (0, 0)),                 # d2 inv^T
        spec((n2, n2), lambda c, r, b: (0, 0)),
        spec((n2, cm), lambda c, r, b: (0, 0)),                 # inv twiddle
        spec((n2, cm), lambda c, r, b: (0, 0)),
        spec((_LANE, _LANE), lambda c, r, b: (0, 0)),           # kron
        spec((_LANE, _LANE), lambda c, r, b: (0, 0)),
    ]
    cmaj = cmaj_store
    if stats_excl is not None:
        out_spec = spec((1, 8, cm), lambda c, r, b: (r * C + c, 0, 0))
        out_sds = jax.ShapeDtypeStruct((R * C, 8, cm), jnp.float32)
        kwargs = {"scratch_shapes": [pltpu.VMEM((n2, cm), jnp.float32)]}
    elif cmaj:
        out_spec = spec((1, cm, n2), lambda c, r, b: (r * C + c, 0, 0))
        out_sds = jax.ShapeDtypeStruct((R * C, cm, n2), jnp.float32)
        kwargs = {"scratch_shapes": [pltpu.VMEM((n2, cm), jnp.float32)]}
    else:
        out_spec = spec((1, n2, cm), lambda c, r, b: (r * C + c, 0, 0))
        out_sds = jax.ShapeDtypeStruct((R * C, n2, cm), jnp.float32)
        kwargs = {}
    if not interpret:
        kwargs["compiler_params"] = pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)
    out = pl.pallas_call(
        kern,
        grid=(C, R, G),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_sds,
        interpret=interpret,
        **kwargs,
    )(x3_re, x3_im,
      jnp.asarray(osc_re), jnp.asarray(osc_im),
      jnp.asarray(prr), jnp.asarray(pri),
      jnp.asarray(k["l1"][0]), jnp.asarray(k["l1"][1]),
      jnp.asarray(k["t1f"][0]), jnp.asarray(k["t1f"][1]),
      jnp.asarray(k["d2f"][0]), jnp.asarray(k["d2f"][1]),
      jnp.asarray(k["d2iT"][0]), jnp.asarray(k["d2iT"][1]),
      jnp.asarray(k["ttile"][0]), jnp.asarray(k["ttile"][1]),
      jnp.asarray(k["g"][0]), jnp.asarray(k["g"][1]))

    if stats_excl is not None:
        # (R*C, 8, cm) per-LANE stats tiles; channel values sit on the
        # group-lead lanes (ch*n1) -> strided select, then reorder to
        # (5, nprn, n_c*R) with the row axis ordered exactly like the
        # surface's axis 1 ((coarse, set, fine) = row index c_i*R + r)
        st = out.reshape(R, C, 8, cp, n1)[:, :, :, : nprn * L, 0]
        st = st.reshape(R, C, 8, nprn, L)
        per_chunk = [st[:, ci, :, :, : len(ch)]
                     for ci, ch in enumerate(chunks)]
        st = jnp.concatenate(per_chunk, axis=-1)      # (R, 8, P, n_c)
        st = jnp.transpose(st, (1, 2, 3, 0))          # (8, P, n_c, R)
        st = st.reshape(8, nprn, n_c * R)
        return (st[0], st[1], st[2], st[3], st[4])

    if cmaj:
        # channel-major tiles ((c, t1), t2): the de-permute below moves
        # only MAJOR axes (contiguous (n1, n2) rows ride along), so the
        # surface never pays a minor-dim relayout outside the kernel
        out = out.reshape(R, C, cp, n1, n2)[:, :, : nprn * L]
        out = out.reshape(R, C, nprn, L, n1, n2)
        per_chunk = [out[:, ci, :, : len(ch)]
                     for ci, ch in enumerate(chunks)]
        surf = jnp.concatenate(per_chunk, axis=2)  # (R, P, n_c, n1, n2)
        surf = jnp.transpose(surf, (1, 2, 0, 3, 4))
        return surf.reshape(nprn, n_c * R, n)      # t = n2*t1 + t2

    # (R*C, n2, (cL, n1)) -> per (row, chunk): (cp, n) channel-major, then
    # channels -> (prn, coarse-in-chunk); concat chunks, stack rows
    out = out.reshape(R, C, n2, cp, n1)
    out = jnp.transpose(out, (0, 1, 3, 4, 2)).reshape(R, C, cp, n)
    out = out[:, :, : nprn * L].reshape(R, C, nprn, L, n)
    per_chunk = [out[:, ci, :, : len(ch)]
                 for ci, ch in enumerate(chunks)]
    surf = jnp.concatenate(per_chunk, axis=2)     # (R, P, n_c, n)
    surf = jnp.transpose(surf, (1, 2, 0, 3))      # (P, n_c, R, n)
    return surf.reshape(nprn, n_c * R, n)
