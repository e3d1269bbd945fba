"""Device-side read preprocessing: reverse complement, k-mer keys, N scanning.

All ops are shape-static and batched over a (R, L) int8 code array
(SEMANTICS.md §1 codes). jnp analog of rapmap_tpu.index.encode.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

NCODE = 5


def revcomp_batch(reads: jnp.ndarray, lens: jnp.ndarray) -> jnp.ndarray:
    """(R, L) int8, per-row lengths -> per-row reverse complement, pad NCODE."""
    R, L = reads.shape
    i = np.arange(L, dtype=np.int32)[None, :]
    src = lens[:, None] - 1 - i
    vals = jnp.take_along_axis(reads, jnp.clip(src, 0, L - 1).astype(jnp.int32), axis=1)
    comp = jnp.where((vals >= 1) & (vals <= 4), 5 - vals, np.int8(NCODE)).astype(jnp.int8)
    return jnp.where(src >= 0, comp, np.int8(NCODE))


def kmer_keys_batch(reads: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(R, L) -> (hi, lo, valid) each (R, S) with S = L - k + 1.

    Big-endian 2-bit packing split across two uint32 words (SEMANTICS.md §1);
    valid iff the window is pure ACGT.
    """
    R, L = reads.shape
    S = L - k + 1
    assert S >= 1, "reads shorter than k"
    hi = np.zeros((R, S), dtype=np.uint32)
    lo = np.zeros((R, S), dtype=np.uint32)
    valid = np.ones((R, S), dtype=bool)
    for i in range(k):
        c = reads[:, i : i + S].astype(jnp.int32)
        valid = valid & (c >= 1) & (c <= 4)
        bits = ((c - 1) & 3).astype(jnp.uint32)
        hi = (hi << np.uint32(2)) | (lo >> np.uint32(30))
        lo = (lo << np.uint32(2)) | bits
    return hi, lo, valid


def next_bad_batch(reads: jnp.ndarray, L_sentinel: int) -> jnp.ndarray:
    """next_bad[r, p] = smallest q >= p with code outside 1..4, else L_sentinel."""
    R, L = reads.shape
    i = np.arange(L, dtype=np.int32)[None, :]
    bad_at = jnp.where((reads < 1) | (reads > 4), i, np.int32(L_sentinel))
    rev = jnp.flip(bad_at, axis=1)
    run = lax.associative_scan(jnp.minimum, rev, axis=1)
    return jnp.flip(run, axis=1)
