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


def comp_flip_batch(reads: jnp.ndarray) -> jnp.ndarray:
    """(R, L) int8 -> RIGHT-ALIGNED reverse complement: jnp.flip of the
    complemented full row (a static permutation — no per-row gather, unlike
    revcomp_batch). A row of length `len` occupies columns [L-len, L); rc
    position p lives at column p + (L - len). Pad/N codes flip to NCODE."""
    comp = jnp.where(
        (reads >= 1) & (reads <= 4), np.int8(5) - reads, np.int8(NCODE)
    ).astype(jnp.int8)
    return jnp.flip(comp, axis=1)


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


def kmer_keys_from_packed(
    preads: jnp.ndarray,    # (R, L) uint32 packed words (extend_packed.pack_reads)
    next_bad: jnp.ndarray,  # (R, L) int32 (next_bad_batch)
    k: int,
    S: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """kmer_keys_batch equivalent derived from the packed-word arrays the
    extension phase already computes: two shifts per window instead of a
    k-iteration shift loop (the dense phase's dominant ALU cost).

    word[p] holds bases p..p+15 big-endian, so the 2k-bit key at p is the
    64-bit pair (word[p], word[p+16]) >> (64-2k). Non-ACGT bases contribute
    arbitrary bits; validity comes from next_bad exactly as the charwise
    builder's window-purity test (tested equal in test_encode)."""
    w0 = preads[:, :S]
    s = 64 - 2 * k
    if s == 0:
        hi, lo = w0, preads[:, 16 : 16 + S]
    elif s < 32:
        w1 = preads[:, 16 : 16 + S]
        hi = w0 >> np.uint32(s)
        lo = (w0 << np.uint32(32 - s)) | (w1 >> np.uint32(s))
    elif s == 32:
        hi, lo = jnp.zeros_like(w0), w0
    else:
        hi = jnp.zeros_like(w0)
        lo = w0 >> np.uint32(s - 32)
    pos = np.arange(S, dtype=np.int32)[None, :]
    valid = next_bad[:, :S] >= pos + np.int32(k)
    return hi, lo, valid


def next_bad_batch(reads: jnp.ndarray, L_sentinel: int) -> jnp.ndarray:
    """next_bad[r, p] = smallest q >= p with code outside 1..4, else L_sentinel."""
    R, L = reads.shape
    i = np.arange(L, dtype=np.int32)[None, :]
    bad_at = jnp.where((reads < 1) | (reads > 4), i, np.int32(L_sentinel))
    rev = jnp.flip(bad_at, axis=1)
    run = lax.associative_scan(jnp.minimum, rev, axis=1)
    return jnp.flip(run, axis=1)


def _rev2_32(w: jnp.ndarray) -> jnp.ndarray:
    """Reverse the 16 2-bit groups within each uint32."""
    m2 = np.uint32(0x33333333)
    m4 = np.uint32(0x0F0F0F0F)
    m8 = np.uint32(0x00FF00FF)
    w = ((w & m2) << np.uint32(2)) | ((w >> np.uint32(2)) & m2)
    w = ((w & m4) << np.uint32(4)) | ((w >> np.uint32(4)) & m4)
    w = ((w & m8) << np.uint32(8)) | ((w >> np.uint32(8)) & m8)
    return (w << np.uint32(16)) | (w >> np.uint32(16))


def rc_keys_batch(hi: jnp.ndarray, lo: jnp.ndarray, k: int) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Reverse-complement keys from (hi, lo) uint32 pairs without touching
    the reads: complement the 2k bits, reverse the 2-bit groups, re-align.
    Pure VPU bit ops (64-bit ints are unavailable on device); must match
    index.chd.rc_key64_np exactly (tested in test_canonical_chd)."""
    nb = 2 * k
    # complement of the low-aligned 2k-bit field
    ch = (~hi) & (np.uint32(0xFFFFFFFF) if nb >= 64 else np.uint32((1 << max(nb - 32, 0)) - 1))
    cl = (~lo) & (np.uint32(0xFFFFFFFF) if nb >= 32 else np.uint32((1 << nb) - 1))
    # reverse all 32 groups of the 64-bit pair: words swap and self-reverse
    rhi = _rev2_32(cl)
    rlo = _rev2_32(ch)
    # shift right by s = 64 - 2k to re-align low
    s = 64 - nb
    if s == 0:
        return rhi, rlo
    if s < 32:
        out_lo = (rlo >> np.uint32(s)) | (rhi << np.uint32(32 - s))
        out_hi = rhi >> np.uint32(s)
    elif s == 32:
        out_lo, out_hi = rhi, jnp.zeros_like(rhi)
    else:
        out_lo = rhi >> np.uint32(s - 32)
        out_hi = jnp.zeros_like(rhi)
    return out_hi, out_lo
