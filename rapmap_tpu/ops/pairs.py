"""Paired-end merge on device (mergeLeftRightHits rebuild, SEMANTICS.md §5).

Each mate's MapOut rows are unique per (t, strand) and sorted by (t, strand),
so the concordant join is a per-slot binary search of `t*2 + (1-strand)` in the
mate's key list — O(MO log MO) per read, fully batched.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.config import MapConfig
from rapmap_tpu.ops.collate import BIG, MapOut
from rapmap_tpu.ops.gather import row_gather


class PairOut(NamedTuple):
    t: jnp.ndarray    # (B, MO) int32, -1 = empty slot
    p1: jnp.ndarray   # (B, MO) int32 left-mate pos (valid iff has1)
    s1: jnp.ndarray   # (B, MO) int32 strand
    has1: jnp.ndarray  # (B, MO) bool
    p2: jnp.ndarray
    s2: jnp.ndarray
    has2: jnp.ndarray
    concordant: jnp.ndarray     # (B,) bool
    n_records: jnp.ndarray      # (B,) int32 pre-cap record count
    too_ambiguous: jnp.ndarray  # (B,) bool
    any_record: jnp.ndarray     # (B,) bool
    out_truncated: jnp.ndarray  # (B,) bool


def _keys(out: MapOut) -> jnp.ndarray:
    """Ascending (t*2 + strand) with empty slots pushed to BIG."""
    return jnp.where(out.t == -1, BIG, out.t * 2 + out.strand)


def _searchsorted_rows(keys: jnp.ndarray, query: jnp.ndarray, steps: int) -> jnp.ndarray:
    """Row-wise lower bound of query (B, M) in sorted keys (B, N)."""
    B, N = keys.shape

    def step(_, iv):
        lo, hi = iv
        mid = (lo + hi) >> 1
        v = row_gather(keys, jnp.clip(mid, 0, N - 1))
        less = v < query
        cont = lo < hi
        lo2 = jnp.where(less, mid + 1, lo)
        hi2 = jnp.where(less, hi, mid)
        return jnp.where(cont, lo2, lo), jnp.where(cont, hi2, hi)

    lo0 = query * 0
    hi0 = query * 0 + N
    lo_f, _ = lax.fori_loop(0, steps, step, (lo0, hi0))
    return lo_f


def merge_pairs_batch(out1: MapOut, out2: MapOut, cfg: MapConfig) -> PairOut:
    B, MO = out1.t.shape
    import math

    steps = max(1, math.ceil(math.log2(MO + 1)) + 1)
    k1 = _keys(out1)
    k2 = _keys(out2)

    # ---- concordant join: for each left entry, find (t, 1-strand) on right --
    want = jnp.where(out1.t == -1, BIG - 1, out1.t * 2 + (1 - out1.strand))
    loc = _searchsorted_rows(k2, want, steps)
    loc_c = jnp.clip(loc, 0, MO - 1)
    hit = (loc < MO) & (jnp.take_along_axis(k2, loc_c, axis=1) == want) & (out1.t != -1)

    def g2(x):
        return row_gather(x, loc_c)

    # [REF-VERIFY] optional PE fidelity constraints (config.py notes); each
    # left row has at most one opposite-strand candidate, so filtering the
    # join predicate matches the oracle exactly
    if cfg.max_frag_len or cfg.pair_order:
        cand_p2 = g2(out2.pos)
        if cfg.max_frag_len:
            hit = hit & (jnp.abs(out1.pos - cand_p2) <= cfg.max_frag_len)
        if cfg.pair_order:
            fwd_pos = jnp.where(out1.strand == 0, out1.pos, cand_p2)
            rc_pos = jnp.where(out1.strand == 0, cand_p2, out1.pos)
            hit = hit & (fwd_pos <= rc_pos)

    pair_t = jnp.where(hit, out1.t, -1)
    pair_p2 = jnp.where(hit, g2(out2.pos), 0)
    pair_s2 = jnp.where(hit, g2(out2.strand), 0)
    n_pairs = jnp.sum(hit, axis=1, dtype=jnp.int32)
    concordant = n_pairs >= 1

    # compact pairs to slot front (stable sort by hit order)
    order = jnp.where(hit, np.arange(MO, dtype=np.int32)[None, :], BIG)
    _, ct, cp1, cs1, cp2, cs2 = lax.sort(
        [order, pair_t, out1.pos, out1.strand, pair_p2, pair_s2], dimension=1, num_keys=1
    )
    cvalid = ct != -1

    # ---- orphan fallback ----------------------------------------------------
    if cfg.no_orphans:
        o_t = np.full((B, MO), -1, np.int32)
        o_p = np.zeros((B, MO), np.int32)
        o_s = np.zeros((B, MO), np.int32)
        o_is1 = np.zeros((B, MO), bool)
        n_orph = out1.n_mappings * 0
    else:
        seq = np.arange(MO, dtype=np.int32)[None, :]
        ordL = jnp.where(out1.t != -1, seq, BIG)
        ordR = jnp.where(out2.t != -1, seq + MO, BIG)
        cat_ord = jnp.concatenate([ordL, ordR], axis=1)
        cat_t = jnp.concatenate([out1.t, out2.t], axis=1)
        cat_p = jnp.concatenate([out1.pos, out2.pos], axis=1)
        cat_s = jnp.concatenate([out1.strand, out2.strand], axis=1)
        cat_is1 = np.concatenate(
            [np.ones((B, MO), np.int32), np.zeros((B, MO), np.int32)], axis=1
        )
        _, o_t2, o_p2, o_s2, o_is12 = lax.sort(
            [cat_ord, cat_t, cat_p, cat_s, cat_is1], dimension=1, num_keys=1
        )
        o_t, o_p, o_s = o_t2[:, :MO], o_p2[:, :MO], o_s2[:, :MO]
        o_is1 = o_is12[:, :MO] == 1
        n_orph = jnp.sum(out1.t != -1, axis=1, dtype=jnp.int32) + jnp.sum(
            out2.t != -1, axis=1, dtype=jnp.int32
        )

    # ---- select concordant vs orphan per read -------------------------------
    c = concordant[:, None]
    t = jnp.where(c, jnp.where(cvalid, ct, -1), o_t)
    p1 = jnp.where(c, cp1, jnp.where(o_is1, o_p, 0))
    s1 = jnp.where(c, cs1, jnp.where(o_is1, o_s, 0))
    has1 = jnp.where(c, cvalid, o_is1 & (o_t != -1))
    p2 = jnp.where(c, cp2, jnp.where(~o_is1, o_p, 0))
    s2 = jnp.where(c, cs2, jnp.where(~o_is1, o_s, 0))
    has2 = jnp.where(c, cvalid, ~o_is1 & (o_t != -1))

    # mates that were individually too-ambiguous already arrive blanked (t=-1),
    # so they simply contribute no entries here — matching the oracle.
    n_rec = jnp.where(concordant, n_pairs, n_orph)
    too_amb = n_rec > cfg.max_num_hits
    out_trunc = (n_rec > MO) & ~too_amb
    blank = too_amb[:, None]
    t = jnp.where(blank, -1, t)
    has1 = jnp.where(blank, False, has1)
    has2 = jnp.where(blank, False, has2)
    return PairOut(
        t=t, p1=p1, s1=s1, has1=has1, p2=p2, s2=s2, has2=has2,
        concordant=concordant & ~too_amb,
        n_records=n_rec,
        too_ambiguous=too_amb,
        any_record=(n_rec >= 1) & ~too_amb,
        out_truncated=out_trunc,
    )
