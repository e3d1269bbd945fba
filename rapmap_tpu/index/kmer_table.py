"""k-mer -> SA-interval table construction (host-side).

Replaces the reference's sparsepp hash / BooPHF MPHF (SURVEY.md §2.2) with a
TPU-friendly *sorted* k-mer table: keys as (hi, lo) uint32 pairs in ascending
order plus parallel [b, e) interval arrays, probed on-device by branchless
binary search accelerated by a first-p-bases prefix LUT.
"""

from __future__ import annotations

import numpy as np


def build_kmer_table(
    text_codes: np.ndarray, sa: np.ndarray, k: int, chunk: int = 1 << 22
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Single pass over the SA grouping suffixes by their first k chars
    (the reference indexer's SA->hash scan, SURVEY.md §3.1), chunked.

    Returns (kmer_hi, kmer_lo, kmer_b, kmer_e); intervals index SA slots and
    cover exactly the suffixes whose first k chars are sentinel-free.
    """
    t = np.asarray(text_codes, dtype=np.int8)
    n = len(sa)
    # text padded so gathers sa+i stay in range
    tp = np.concatenate([t, np.zeros(k, dtype=np.int8)])
    keys = np.empty(n, dtype=np.uint64)
    valid = np.empty(n, dtype=bool)
    for s in range(0, n, chunk):
        e = min(s + chunk, n)
        sl = np.asarray(sa[s:e], dtype=np.int64)
        key = np.zeros(e - s, dtype=np.uint64)
        v = np.ones(e - s, dtype=bool)
        for i in range(k):
            w = tp[sl + i].astype(np.int64)
            v &= w >= 1
            key = (key << np.uint64(2)) | ((w - 1) & 3).astype(np.uint64)
        keys[s:e] = key
        valid[s:e] = v
    # group: run boundaries where key changes or validity changes
    vidx = np.nonzero(valid)[0]
    if len(vidx) == 0:
        z = np.zeros(0, dtype=np.uint32)
        return z, z.copy(), np.zeros(0, np.int32), np.zeros(0, np.int32)
    vkeys = keys[vidx]
    # valid slots with equal keys are contiguous in SA order (SEMANTICS.md §2)
    starts = np.nonzero(np.concatenate([[True], vkeys[1:] != vkeys[:-1]]))[0]
    ends = np.concatenate([starts[1:], [len(vidx)]])
    kb = vidx[starts].astype(np.int64)
    ke = (vidx[ends - 1] + 1).astype(np.int64)
    ukeys = vkeys[starts]
    # sanity: each group must be contiguous (no invalid slot interleaves a group)
    assert np.all((ke - kb) == (ends - starts)), "k-mer group interleaved by invalid slot"
    hi = (ukeys >> np.uint64(32)).astype(np.uint32)
    lo = (ukeys & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    return hi, lo, kb.astype(np.int32), ke.astype(np.int32)


def build_prefix_lut(kmer_hi: np.ndarray, kmer_lo: np.ndarray, k: int, prefix_bases: int) -> np.ndarray:
    """prefix_lut[v] = first k-mer-table row whose first-p-bases value >= v.

    len = 4^p + 1; bucket for prefix v is rows [lut[v], lut[v+1]).
    """
    p = prefix_bases
    key = (kmer_hi.astype(np.uint64) << np.uint64(32)) | kmer_lo.astype(np.uint64)
    pref = (key >> np.uint64(2 * (k - p))).astype(np.int64)
    lut = np.searchsorted(pref, np.arange(4**p + 1, dtype=np.int64), side="left")
    return lut.astype(np.int32)


def pack_text_2bit(text_codes: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """2-bit packed text words (16 bases/uint32, big-endian within word) and a
    sentinel bitmask (bit set where code==0), both padded to a word boundary.

    Fast path for packed-word LCP compares in the extension kernel.
    """
    t = np.asarray(text_codes, dtype=np.int64)
    n = len(t)
    nw = (n + 15) // 16
    tpad = np.zeros(nw * 16, dtype=np.int64)
    tpad[:n] = t
    bits = np.where(tpad >= 1, (tpad - 1) & 3, 0).astype(np.uint32).reshape(nw, 16)
    sent = (tpad == 0).astype(np.uint32).reshape(nw, 16)
    packed = np.zeros(nw, dtype=np.uint32)
    smask = np.zeros(nw, dtype=np.uint32)
    for i in range(16):
        packed = (packed << np.uint32(2)) | bits[:, i]
        # sentinel mask: 2 bits per base (11 where sentinel) keeps alignment with packed
        smask = (smask << np.uint32(2)) | (sent[:, i] * np.uint32(3))
    return packed, smask
