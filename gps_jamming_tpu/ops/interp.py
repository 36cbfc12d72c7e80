"""Interpolation utilities.

Lagrange polynomial interpolation matching the reference's `interp1`
(sdrcmn.c:442-504), used for observable alignment in measurement sync
(sdrsync.c:47-93).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lagrange_interp(x: jax.Array, y: jax.Array, xq) -> jax.Array:
    """Lagrange interpolation of y(x) at query points xq.

    x: (n,) strictly monotonic sample locations; y: (..., n) values;
    xq: scalar or (...,) query. Full-order polynomial through all points —
    the same scheme as sdrcmn.c:442-504 (which uses the whole ring window).
    """
    xq = jnp.asarray(xq)
    n = x.shape[0]
    eye = jnp.eye(n, dtype=bool)
    diffs = xq[..., None] - x                              # (..., n)
    denom = jnp.where(eye, 1.0, x[:, None] - x[None, :])   # (n, n)

    # L_j(xq) = prod_{k != j} (xq - x_k) / (x_j - x_k)
    num = jnp.where(eye, 1.0, diffs[..., None, :])         # (..., n, n)
    basis = jnp.prod(num, axis=-1) / jnp.prod(denom, axis=-1)
    return jnp.sum(y * basis, axis=-1)
