"""Gather helpers that stay on XLA's fast paths.

XLA:CPU's emitter degenerates (minutes-long compiles) on batched 2-D
take_along_axis chained with table gathers; flattening every gather to the
plain 1-D operand + 1-D indices form keeps compiles in seconds on both CPU and
TPU. Use these for any gather whose index array is 2-D.
"""

from __future__ import annotations

import jax.numpy as jnp


def row_gather(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """tab (B, N), idx (B, M) int -> (B, M): tab[b, idx[b, m]] (idx pre-clipped)."""
    B, N = tab.shape
    flat = (jnp.arange(B, dtype=jnp.int32)[:, None] * N + idx).reshape(-1)
    return tab.reshape(-1)[flat].reshape(idx.shape)


def flat_gather(tab: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """tab (N,), idx any-shape int (pre-clipped) -> tab[idx] via 1-D gather."""
    return tab[idx.reshape(-1)].reshape(idx.shape)
