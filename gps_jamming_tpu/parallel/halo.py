"""Overlap-save halo exchange across time shards.

The reference streams a capture through a ring buffer and lets every channel
read windows at arbitrary sample offsets (sdrrcv.c:82-107) — windows freely
straddle block boundaries. When the time axis is sharded across devices, a
window straddling a shard boundary needs the first `halo` samples of the NEXT
shard appended to the local block. That is a single `ppermute` shift over the
'time' mesh axis (SURVEY.md §5 long-context note).

Used inside shard_map: operands are the per-device local blocks.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .mesh import TIME_AXIS


def halo_from_next(x_local: jax.Array, halo: int,
                   axis_name: str = TIME_AXIS) -> jax.Array:
    """Append the first `halo` samples of the next time shard.

    x_local: (..., block_len) per-device block. The last shard receives zeros
    (capture tail). Returns (..., block_len + halo).
    """
    n_shards = jax.lax.axis_size(axis_name)
    head = x_local[..., :halo]
    # send my head to the PREVIOUS shard: perm maps src -> dst
    perm = [(i, i - 1) for i in range(1, n_shards)]
    recv = jax.lax.ppermute(head, axis_name, perm)
    # shard i receives shard i+1's head; last shard gets zeros (ppermute
    # semantics: missing source -> zeros)
    return jnp.concatenate([x_local, recv], axis=-1)


def halo_from_prev(x_local: jax.Array, halo: int,
                   axis_name: str = TIME_AXIS) -> jax.Array:
    """Prepend the last `halo` samples of the previous time shard.

    First shard gets zeros. Returns (..., halo + block_len).
    """
    n_shards = jax.lax.axis_size(axis_name)
    tail = x_local[..., -halo:]
    perm = [(i, i + 1) for i in range(n_shards - 1)]
    recv = jax.lax.ppermute(tail, axis_name, perm)
    return jnp.concatenate([recv, x_local], axis=-1)
