"""Host-side CHD perfect-hash construction over the k-mer table.

Replaces the reference's BooPHF minimal perfect hash role
(upstream:include/BooPHF.hpp, SURVEY.md §2.2): the sorted k-mer table stays
the canonical on-disk structure; CHD adds a displacement directory + slot
permutation so the device resolves a k-mer with two gathers flat, instead of
a binary search whose trip count tracks the worst prefix-LUT bucket.
"""

from __future__ import annotations

import logging
import math

import numpy as np

log = logging.getLogger("tqm.index")

MAXD = 65535


def mix32_np(x: np.ndarray) -> np.ndarray:
    """murmur3 fmix32 (must match native/chd.cpp and ops/lookup.py exactly)."""
    x = x.astype(np.uint32)
    x ^= x >> np.uint32(16)
    x = (x * np.uint32(0x85EBCA6B)).astype(np.uint32)
    x ^= x >> np.uint32(13)
    x = (x * np.uint32(0xC2B2AE35)).astype(np.uint32)
    x ^= x >> np.uint32(16)
    return x


def chd_params(n: int) -> tuple[int, int]:
    """(m_bits, t_bits): ~4 keys/bucket, table load factor <= 0.85."""
    m_bits = max(1, math.ceil(math.log2(max(n / 4.0, 1.0))))
    t_bits = max(1, math.ceil(math.log2(n / 0.85)))
    return m_bits, t_bits


def build_chd(khi: np.ndarray, klo: np.ndarray, seed0: int = 1):
    """-> dict(dir, perm, seed, m_bits, t_bits) or None when the native
    library is unavailable / placement failed (engine keeps binary search)."""
    n = len(khi)
    if n == 0:
        return None
    try:
        from rapmap_tpu.native import bindings as nat

        if not nat.available():
            return None
    except Exception:  # pragma: no cover - import/runtime issues
        return None
    m_bits, t_bits = chd_params(n)
    for attempt in range(8):
        seed = (seed0 + attempt * 1000003) & 0xFFFFFFFF
        res = nat.chd_build(khi, klo, m_bits, t_bits, seed, MAXD)
        if res is not None:
            dirv, perm = res
            return dict(dir=dirv, perm=perm, seed=int(seed), m_bits=m_bits, t_bits=t_bits)
        log.warning("CHD placement failed for seed %d; reseeding", seed)
    log.warning("CHD build gave up after 8 seeds; falling back to binary search")
    return None


def attach_chd(idx, save_dir: str | None = None) -> bool:
    """Build + attach a CHD section to an existing index (upgrades indexes
    built before CHD existed). Returns True when attached. The caller must
    have loaded the index with mmap=False if save_dir rewrites in place."""
    if getattr(idx, "chd_dir", None) is not None:
        return True
    chd = build_chd(
        np.asarray(idx.kmer_hi, np.uint32),
        np.asarray(idx.kmer_lo, np.uint32),
        seed0=idx.seed + 1,
    )
    if chd is None:
        return False
    idx.chd_dir, idx.chd_perm = chd["dir"], chd["perm"]
    idx.meta["chd"] = {k: chd[k] for k in ("seed", "m_bits", "t_bits")}
    if save_dir:
        from rapmap_tpu.index.format import save_index

        save_index(idx, save_dir)
    return True


def chd_query_np(khi, klo, dirv, perm, seed: int, m_bits: int, t_bits: int):
    """Numpy reference of the device probe: -> row index or -1 (pre-verify).

    The caller must still compare the row's (hi, lo) against the key: alien
    keys return an arbitrary slot whose row simply fails the compare.
    """
    hi = np.asarray(khi, dtype=np.uint32)
    lo = np.asarray(klo, dtype=np.uint32)
    sa = np.uint32((seed * 0x9E3779B9 + 1) & 0xFFFFFFFF)
    sb = np.uint32((seed * 0x85EBCA6B + 2) & 0xFFFFFFFF)
    g = mix32_np(hi ^ mix32_np(lo ^ sa)) & np.uint32((1 << m_bits) - 1)
    hb = mix32_np(hi ^ mix32_np(lo ^ sb))
    d = dirv[g].astype(np.uint32)
    slot = mix32_np(hb + d) & np.uint32((1 << t_bits) - 1)
    return perm[slot]
