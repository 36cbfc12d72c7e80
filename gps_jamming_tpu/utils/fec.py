"""Convolutional FEC: K=7 rate-1/2 encoder + Viterbi decoder (numpy).

Replaces the reference's libfec dependency (`predecodefec`,
sdrnav.c:194-236, used for SBAS and — in spirit — Galileo I/NAV). The
generator polynomials are the CCSDS/Galileo pair G1=171o, G2=133o; Galileo
E1B additionally INVERTS the second branch (ICD 4.1.4), controlled by
`invert_g2`. Vectorized over the 64-state trellis so decoding a 240-symbol
page is a handful of numpy ops per step (host-side: bit-rate work stays
off the TPU per SURVEY.md §7).
"""
from __future__ import annotations

import numpy as np

K = 7
_NSTATES = 64
_G1 = 0o171
_G2 = 0o133


def _parity(x: np.ndarray) -> np.ndarray:
    x = x.astype(np.uint32)
    x ^= x >> 16
    x ^= x >> 8
    x ^= x >> 4
    x ^= x >> 2
    x ^= x >> 1
    return x & 1


# transition tables: for state s (6 bits of history, newest in MSB?) we use
# the convention: register = [b_new, b_old1, ..., b_old5]; state = 6 most
# recent bits with the newest bit as the LOW bit.
_STATES = np.arange(_NSTATES, dtype=np.uint32)
# output bits for (input u, state s): register value r = u<<6 | s  (u is
# the OLDEST bit in G terms? choose: r = (s << 1 | u) is the 7-bit window
# with u newest). Encoder shifts u in; window = u + previous 6 bits.
_OUT1 = np.empty((2, _NSTATES), np.uint8)
_OUT2 = np.empty((2, _NSTATES), np.uint8)
_NEXT = np.empty((2, _NSTATES), np.uint32)
for _u in (0, 1):
    _r = (_STATES << 1) | _u                 # 7-bit window, newest = LSB...
    # define window bits w6..w0 with w0 = newest input; polynomial taps
    # applied MSB-first: G & window
    _OUT1[_u] = _parity(_r & _G1)
    _OUT2[_u] = _parity(_r & _G2)
    _NEXT[_u] = _r & (_NSTATES - 1) | 0      # drop oldest bit
    _NEXT[_u] = ((_STATES << 1) | _u) & (_NSTATES - 1)


def encode(bits: np.ndarray, invert_g2: bool = True,
           terminate: bool = True) -> np.ndarray:
    """Encode 0/1 bits -> interleaved symbol pairs (2*n [+12 tail]).

    invert_g2: Galileo E1B convention (second branch complemented).
    terminate: append K-1 zero tail bits to flush the register.
    """
    bits = np.asarray(bits, np.int64) & 1
    if terminate:
        bits = np.concatenate([bits, np.zeros(K - 1, np.int64)])
    out = np.empty(2 * bits.size, np.int64)
    s = 0
    for i, u in enumerate(bits):
        o1 = int(_OUT1[u, s])
        o2 = int(_OUT2[u, s])
        if invert_g2:
            o2 ^= 1
        out[2 * i] = o1
        out[2 * i + 1] = o2
        s = int(_NEXT[u, s])
    return out


def viterbi_decode(symbols: np.ndarray, invert_g2: bool = True,
                   terminated: bool = True) -> np.ndarray:
    """Hard/soft-decision Viterbi decode of interleaved symbol pairs.

    symbols: (2n,) values in [0, 1] (hard 0/1 or soft probabilities of a
    '1'). Returns the decoded bits (tail stripped when `terminated`).
    """
    sym = np.asarray(symbols, np.float64).reshape(-1, 2)
    n = sym.shape[0]
    if invert_g2:
        sym = sym.copy()
        sym[:, 1] = 1.0 - sym[:, 1]

    # branch metric: squared distance to expected (o1, o2) per (u, state)
    pm = np.full(_NSTATES, 1e9)
    pm[0] = 0.0
    back = np.empty((n, _NSTATES), np.uint8)      # chosen input bit u
    prev = np.empty((n, _NSTATES), np.uint8)      # chosen predecessor

    # predecessor table: state s' -> its two predecessors and the input u
    # that led s_prev -> s': s' = ((s_prev << 1) | u) & 63; so
    # s_prev in { (s' >> 1), (s' >> 1) | 32 } with u = s' & 1
    sp = np.arange(_NSTATES)
    u_in = (sp & 1).astype(np.uint8)
    p0 = sp >> 1
    p1 = (sp >> 1) | (_NSTATES >> 1)
    o1_p0 = _OUT1[u_in, p0].astype(np.float64)
    o2_p0 = _OUT2[u_in, p0].astype(np.float64)
    o1_p1 = _OUT1[u_in, p1].astype(np.float64)
    o2_p1 = _OUT2[u_in, p1].astype(np.float64)

    for i in range(n):
        r1, r2 = sym[i]
        bm_p0 = (r1 - o1_p0) ** 2 + (r2 - o2_p0) ** 2
        bm_p1 = (r1 - o1_p1) ** 2 + (r2 - o2_p1) ** 2
        cand0 = pm[p0] + bm_p0
        cand1 = pm[p1] + bm_p1
        take1 = cand1 < cand0
        pm = np.where(take1, cand1, cand0)
        prev[i] = take1
        back[i] = u_in
    # traceback from state 0 when terminated, else best state
    s = 0 if terminated else int(np.argmin(pm))
    bits = np.empty(n, np.int64)
    for i in range(n - 1, -1, -1):
        bits[i] = s & 1
        s = (s >> 1) | ((_NSTATES >> 1) if prev[i, s] else 0)
    if terminated:
        bits = bits[: n - (K - 1)]
    return bits
