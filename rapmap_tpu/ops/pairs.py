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


def pe_direct_eligible(st, cfg: MapConfig, C: int) -> bool:
    """collate_records_pe packs (read, t*2+strand) into one uint32 join key;
    needs the index stats known and C * 2 * n_txps to fit 32 bits."""
    return (
        st is not None
        and getattr(st, "n_txps", 0) > 0
        and C * (2 * st.n_txps) < (1 << 32)
    )


def collate_records_pe(
    didx, st, hits1, lens1, hits2, lens2, cfg: MapConfig, cap: int, rec_spec=None,
    reads1=None, reads2=None,
):
    """PE merge DIRECTLY from the two mates' collate cores (mergeLeftRightHits
    rebuild, SEMANTICS.md §5; upstream:src/RapMapUtils.cpp role).

    Skips the slotted (B, MAX_OUT) MapOut layout and the O(MO log MO)
    per-slot join entirely: each mate's winner rows (already (read, t*2+s)
    sorted, unique per key) compact to a dense (cap,) list; one sort of the
    2*cap concatenation by a packed uint32 (read, t, left-strand) join key
    makes concordant partners ADJACENT rows. Orphan records come from the
    per-side compact lists (each in its own reference order: left mappings
    then right). Output matches merge_pairs_batch -> compact_pe bit-for-bit
    (minus its MAX_OUT pre-cap: records here are capped only by `cap`, with
    the overflow flagged).

    Returns (PERecords, pair MapFlags, per-read concordant bool).
    """
    import jax

    from rapmap_tpu.ops.collate import _collate_core
    from rapmap_tpu.ops.compact import PERecords
    from rapmap_tpu.ops.gather import flat_gather

    FULLW = np.uint32(0xFFFFFFFF)
    C = hits1.q.shape[0] // 2
    KT = np.uint32(2 * st.n_txps)
    c1 = _collate_core(didx, st, hits1, lens1, cfg)
    c2 = _collate_core(didx, st, hits2, lens2, cfg)
    CAPG = c1.keep.shape[0]

    # mate-level ambiguity blanks that mate's list (SEMANTICS §5)
    emit1 = c1.keep & ~flat_gather(c1.too_ambiguous, c1.rclip)
    emit2 = c2.keep & ~flat_gather(c2.too_ambiguous, c2.rclip)

    # join keys: left rows at (r, 2t+s); right rows at (r, 2t+(1-s)) so a
    # concordant pair shares one key whose LOW BIT is the left strand
    jk1 = c1.rclip.astype(jnp.uint32) * KT + c1.k2s.astype(jnp.uint32)
    jk2 = c2.rclip.astype(jnp.uint32) * KT + (c2.k2s ^ 1).astype(jnp.uint32)

    def side_compact(emit, jk, pos):
        """Sparse (CAPG,) winner rows -> dense (cap,) key/pos lists."""
        gidx = jnp.cumsum(emit.astype(jnp.int32)) - 1
        dest = jnp.where(emit, jnp.minimum(gidx, cap), cap)
        kbuf = jnp.full((cap + 1,), FULLW, jnp.uint32)
        kd = kbuf.at[dest].set(jnp.where(emit, jk, FULLW), mode="drop")[:cap]
        pbuf = jnp.zeros((cap + 1,), jnp.int32)
        pd = pbuf.at[dest].set(jnp.where(emit, pos, 0), mode="drop")[:cap]
        return kd, pd

    k1d, p1d = side_compact(emit1, jk1, c1.p2)
    k2d, p2d = side_compact(emit2, jk2, c2.p2)

    # ---- one sort makes concordant partners adjacent ------------------------
    k_all = jnp.concatenate([k1d, k2d])
    side = np.concatenate([
        np.zeros(cap, np.int32), np.ones(cap, np.int32)
    ])
    k_s, side_s, pos_s = lax.sort(
        [k_all, jnp.asarray(side), jnp.concatenate([p1d, p2d])],
        dimension=0, num_keys=2,
    )
    N2 = 2 * cap
    valid_s = k_s != FULLW
    nxt_same = jnp.concatenate([k_s[1:] == k_s[:-1], np.zeros(1, bool)])
    conc = (
        valid_s
        & nxt_same
        & (side_s == 0)
        & (jnp.concatenate([side_s[1:], np.zeros(1, np.int32)]) == 1)
    )
    pp2 = jnp.concatenate([pos_s[1:], np.zeros(1, np.int32)])  # partner pos
    s1_s = (k_s & np.uint32(1)).astype(jnp.int32)
    # [REF-VERIFY] optional PE fidelity constraints (config.py notes)
    if cfg.max_frag_len:
        conc = conc & (jnp.abs(pos_s - pp2) <= cfg.max_frag_len)
    if cfg.pair_order:
        fwd_pos = jnp.where(s1_s == 0, pos_s, pp2)
        rc_pos = jnp.where(s1_s == 0, pp2, pos_s)
        conc = conc & (fwd_pos <= rc_pos)

    r_s = jnp.where(valid_s, (k_s // KT).astype(jnp.int32), C)
    r_sc = jnp.clip(r_s, 0, C - 1)
    # invalid rows carry conc=False, so clipping them onto read C-1 adds 0
    n_pairs = jax.ops.segment_sum(conc.astype(jnp.int32), r_sc, num_segments=C)
    concordant = n_pairs >= 1

    # ---- per-read record counts / flags -------------------------------------
    n_left = jax.ops.segment_sum(emit1.astype(jnp.int32), c1.rclip, num_segments=C)
    n_left = jnp.where(c1.too_ambiguous, 0, n_left)
    n_right = jax.ops.segment_sum(emit2.astype(jnp.int32), c2.rclip, num_segments=C)
    n_right = jnp.where(c2.too_ambiguous, 0, n_right)
    if cfg.no_orphans:
        n_orph = n_left * 0
    else:
        n_orph = n_left + n_right
    n_rec = jnp.where(concordant, n_pairs, n_orph)
    too_amb = n_rec > cfg.max_num_hits
    emit_n = jnp.where(too_amb, 0, n_rec)
    base = jnp.cumsum(emit_n) - emit_n  # per-read record base

    # ---- assemble records: three masked scatter sources ---------------------
    # with mapping_score the rows scatter UNPACKED, get scored on the dense
    # cap rows (ops.align, both mates in one DP pass), then pack elementwise
    scoring = cfg.mapping_score and reads1 is not None
    W = 2 if (rec_spec is not None and not scoring) else 7
    buf = jnp.zeros((cap + 1, W), jnp.int32)

    def rec_rows(t, p1, s1, has1, p2, s2, has2):
        fields = [t, p1, s1, has1, p2, s2, has2]
        if rec_spec is not None and not scoring:
            from rapmap_tpu.ops.wire import pack_rec_fields

            fields = list(pack_rec_fields(rec_spec, fields))
        return jnp.stack([f.astype(jnp.int32) for f in fields], axis=-1)

    # (a) concordant pair rows, in jk order == left hit order
    ok_r = lambda flags, rr: flags & ~flat_gather(too_amb, rr)
    w_conc = conc & ok_r(flat_gather(concordant, r_sc), r_sc)
    g_conc = jnp.cumsum(conc.astype(jnp.int32)) - 1
    conc_base = jax.ops.segment_sum(conc.astype(jnp.int32), r_sc, num_segments=C)
    conc_base = jnp.cumsum(conc_base) - conc_base  # global pair base per read
    rank_c = g_conc - flat_gather(conc_base, r_sc)
    dest_c = jnp.where(w_conc, flat_gather(base, r_sc) + rank_c, cap)
    t_s = jnp.where(valid_s, ((k_s % KT) >> np.uint32(1)).astype(jnp.int32), 0)
    one = jnp.ones_like(t_s)
    buf = buf.at[jnp.minimum(dest_c, cap)].set(
        rec_rows(t_s, pos_s, s1_s, one, pp2, 1 - s1_s, one), mode="drop"
    )

    # (b) left orphan rows (mate order preserved by c1.rank)
    orph_read1 = ~flat_gather(concordant, c1.rclip) & ~flat_gather(too_amb, c1.rclip)
    w1 = (emit1 & orph_read1) if not cfg.no_orphans else (emit1 & ~emit1)
    dest1 = jnp.where(w1, flat_gather(base, c1.rclip) + c1.rank, cap)
    t1 = c1.k2s >> 1
    s1f = c1.k2s & 1
    z = t1 * 0
    buf = buf.at[jnp.minimum(dest1, cap)].set(
        rec_rows(jnp.maximum(t1, 0), c1.p2, s1f, z + 1, z, z, z), mode="drop"
    )

    # (c) right orphan rows, after the read's left rows
    orph_read2 = ~flat_gather(concordant, c2.rclip) & ~flat_gather(too_amb, c2.rclip)
    w2 = (emit2 & orph_read2) if not cfg.no_orphans else (emit2 & ~emit2)
    dest2 = jnp.where(
        w2, flat_gather(base, c2.rclip) + flat_gather(n_left, c2.rclip) + c2.rank, cap
    )
    t2 = c2.k2s >> 1
    s2f = c2.k2s & 1
    buf = buf.at[jnp.minimum(dest2, cap)].set(
        rec_rows(jnp.maximum(t2, 0), z, z, z, c2.p2, s2f, z + 1), mode="drop"
    )

    recs = buf[:cap]
    total = jnp.sum(emit_n, dtype=jnp.int32)
    ends = jnp.cumsum(emit_n)
    counts = jnp.minimum(ends, cap) - jnp.minimum(ends - emit_n, cap)
    if scoring:
        from rapmap_tpu.ops.align import score_pe_rows
        from rapmap_tpu.ops.compact import rid_from_counts

        rid = rid_from_counts(counts, cap)
        live = (np.arange(cap, dtype=np.int32) + total * 0) < jnp.minimum(total, cap)
        sc1, sc2 = score_pe_rows(
            didx, cfg, reads1, lens1, reads2, lens2, rid, recs[:, 0],
            recs[:, 1], recs[:, 2], recs[:, 3], recs[:, 4], recs[:, 5],
            recs[:, 6], live,
        )
        cols = [recs[:, j] for j in range(7)] + [sc1, sc2]
        if rec_spec is not None:
            from rapmap_tpu.ops.wire import pack_rec_fields

            cols = list(pack_rec_fields(rec_spec, cols))
        recs = jnp.stack([x.astype(jnp.int32) for x in cols], axis=-1)
    pe = PERecords(
        recs=recs, counts=counts, total=total, overflowed=total > cap
    )
    over = c1.over_budget | c2.over_budget
    from rapmap_tpu.ops.collate import MapFlags

    flags = MapFlags(
        n_mappings=n_rec,
        mapped=(n_rec >= 1) & ~too_amb,
        too_ambiguous=too_amb,
        over_budget=over,
        out_truncated=((n_rec >= 1) & ~too_amb) & (counts < emit_n),
    )
    return pe, flags, concordant & ~too_amb


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
