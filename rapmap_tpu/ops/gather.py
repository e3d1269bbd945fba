"""Gather helpers that stay on XLA's fast paths.

Two concerns shape these helpers:
  1. XLA:CPU's emitter degenerates (minutes-long compiles) on batched 2-D
     take_along_axis chained with table gathers; flattening every gather to the
     plain 1-D operand + 1-D indices form keeps compiles in seconds.
  2. Tables may be host numpy constants (preferred for anything static — device
     constants must be fetched back through the axon TPU tunnel at lowering,
     which costs seconds per constant), so indexing goes through jnp.take.

Indices must be pre-clipped in range (promise_in_bounds).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def row_gather(tab, idx: jnp.ndarray) -> jnp.ndarray:
    """tab (B, N), idx (B, M) int -> (B, M): tab[b, idx[b, m]] (idx pre-clipped)."""
    B, N = tab.shape
    flat = (np.arange(B, dtype=np.int32)[:, None] * N + idx).reshape(-1)
    return jnp.take(tab.reshape(-1), flat, mode="clip").reshape(idx.shape)


def flat_gather(tab, idx: jnp.ndarray) -> jnp.ndarray:
    """tab (N,), idx any-shape int (pre-clipped) -> tab[idx] via 1-D gather."""
    return jnp.take(tab, idx.reshape(-1), mode="clip").reshape(idx.shape)


def row_gather_nd(tab, idx: jnp.ndarray) -> jnp.ndarray:
    """tab (N, C), idx any-shape int (pre-clipped) -> (*idx.shape, C).

    One multi-column row per index: on this hardware gather cost is per index
    and row width (<= 16 B) is free, so pack related columns into rows."""
    C = tab.shape[1]
    out = jnp.take(tab, idx.reshape(-1), axis=0, mode="clip")
    return out.reshape(*idx.shape, C)
