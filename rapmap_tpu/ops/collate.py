"""Hit collation: SA intervals -> per-transcript mappings (HitManager rebuild).

SEMANTICS.md §4 with a GLOBAL slot pool (SURVEY.md §7.1 kernel 4): hits from
all reads expand into one (CAPG,) pool sized cfg.expand_budget slots per read
on average, instead of a fixed per-read budget. Typical reads expand ~2-6
slots, so the pool is ~30x smaller than the old (B, EXP) layout; all voting
sorts and segment ops run over the 1-D pool.

Pipeline:
  1. global exclusive cumsum over hit widths -> each hit's slot range
     (read-major, so each read's slots are contiguous)
  2. slot -> hit assignment by scatter of hit ids at range starts + a
     running-max scan (no per-slot binary search, no (B, EXP, 2H) broadcast)
  3. one 4-column row-gather resolves hit fields; one sa_meta row-gather
     resolves (transcript, position)
  4. voting: one 3-key global sort + run-length support counts
  5. per-(t,strand) best position: one 4-key sort; consistency/strict filters
  6. winners scatter into the (B, MAX_OUT) MapOut layout

Budget overflow (pool exhausted — the tail reads' slots are cut) sets those
reads' over_budget flags, mirroring the old per-read budget semantics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.config import MapConfig
from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic
from rapmap_tpu.ops.gather import flat_gather, row_gather_nd
from rapmap_tpu.ops.mmp import ScanHits

BIG = np.int32(2**31 - 1)
FULLW = np.uint32(0xFFFFFFFF)


def _pack2(fields):
    """MSB-first [(nonneg int32 val, nbits), ...] -> (hi, lo) uint32 words of
    the 64-bit concatenation. Static shift tree; total bits must be <= 64.

    Packing the voting sort's 3-4 int32 keys into one 2-word key halves the
    sort operand count — the collate stage's cost is dominated by its two
    global lax.sorts, and TPU sort cost scales with operands compared/moved.
    """
    hi = None
    lo = None
    off = 0
    for val, nb in reversed(fields):
        v = val.astype(jnp.uint32)
        if off < 32:
            c = v << np.uint32(off) if off else v
            lo = c if lo is None else lo | c
            if off + nb > 32:
                c2 = v >> np.uint32(32 - off)
                hi = c2 if hi is None else hi | c2
        else:
            c2 = v << np.uint32(off - 32)
            hi = c2 if hi is None else hi | c2
        off += nb
    assert off <= 64, "packed sort key exceeds 64 bits"
    zero = fields[0][0].astype(jnp.uint32) * np.uint32(0)
    return (zero if hi is None else hi), (zero if lo is None else lo)


def _unpack2(hi, lo, off: int, nb: int) -> jnp.ndarray:
    """Bits [off, off+nb) of the 64-bit (hi, lo) word pair -> int32."""
    mask = np.uint32((1 << nb) - 1) if nb < 32 else FULLW
    if off >= 32:
        v = (hi >> np.uint32(off - 32)) & mask
    elif off + nb <= 32:
        v = ((lo >> np.uint32(off)) if off else lo) & mask
    else:
        v = ((lo >> np.uint32(off)) | (hi << np.uint32(32 - off))) & mask
    return v.astype(jnp.int32)


class MapOut(NamedTuple):
    t: jnp.ndarray        # (B, MAX_OUT) int32, -1 = none
    pos: jnp.ndarray      # (B, MAX_OUT) int32
    strand: jnp.ndarray   # (B, MAX_OUT) int32, 0 = fwd, 1 = rc
    score: jnp.ndarray    # (B, MAX_OUT) int32 (MMP support)
    n_mappings: jnp.ndarray   # (B,) int32 — pre-cap mapping count
    mapped: jnp.ndarray       # (B,) bool
    too_ambiguous: jnp.ndarray  # (B,) bool
    over_budget: jnp.ndarray    # (B,) bool — expansion pool or hit buffer blown
    out_truncated: jnp.ndarray  # (B,) bool — winners > max_out emitted slots


class CollateCore(NamedTuple):
    """Winner rows in global (read, t*2+strand) sorted order + per-read flags."""

    keep: jnp.ndarray      # (CAPG,) bool — row is an emitted mapping
    rclip: jnp.ndarray     # (CAPG,) int32 read id (clipped; only valid where keep)
    k2s: jnp.ndarray       # (CAPG,) int32 t*2+strand
    p2: jnp.ndarray        # (CAPG,) int32 transcript position
    sup2: jnp.ndarray      # (CAPG,) int32 MMP support score
    rank: jnp.ndarray      # (CAPG,) int32 winner rank within its read
    counts: jnp.ndarray    # (B,) int32 winner count per read (pre-cap)
    too_ambiguous: jnp.ndarray
    over_budget: jnp.ndarray


def _collate_core(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    hits: ScanHits,
    lens: jnp.ndarray,  # (B,) read lengths
    cfg: MapConfig,
    expand_fn=None,
) -> CollateCore:
    """expand_fn(slot_index p, query_pos q) -> (t, tpos) resolves one expanded
    occurrence; defaults to the quasi/SA resolution. The pseudo path passes its
    CSR resolver instead (SEMANTICS.md §7)."""
    R, H = hits.q.shape
    B = R // 2
    H2 = 2 * H
    NH = B * H2
    CAPG = cfg.expand_budget * B

    # ---- per-strand coverage gate (quasi_coverage) --------------------------
    hvalid_rows = np.arange(H, dtype=np.int32)[None, :] < hits.n[:, None]  # (R, H)
    if cfg.quasi_coverage > 0.0:
        cov = jnp.sum(jnp.where(hvalid_rows, hits.l, 0), axis=1)  # (R,)
        lens2 = jnp.concatenate([lens, lens])
        # Exact integer threshold matching the oracle's f64 `cov >= qc * L`
        # (for integer cov that is `cov >= ceil(qc * L)` in f64): a baked
        # per-length table avoids f32 rounding flipping boundary cases.
        _LMAX = 4096  # reads beyond this never reach the device engines
        thr_tab = np.ceil(
            np.float64(cfg.quasi_coverage) * np.arange(_LMAX + 1, dtype=np.float64)
        ).astype(np.int32)
        thr = jnp.asarray(thr_tab)[jnp.clip(lens2, 0, _LMAX)]
        strand_ok = cov.astype(jnp.int32) >= thr
    else:
        strand_ok = hits.n >= 0
    hvalid_rows = hvalid_rows & strand_ok[:, None]

    # ---- fold (fwd, rc) rows into (B, 2H) hit tables ------------------------
    def fold(x):
        return jnp.concatenate([x[:B], x[B:]], axis=1)  # (B, 2H), fwd hits first

    hq, hb, he = fold(hits.q), fold(hits.b), fold(hits.e)
    hv = fold(hvalid_rows)
    hstrand = np.concatenate(
        [np.zeros((B, H), np.int32), np.ones((B, H), np.int32)], axis=1
    )
    read_of_hit = np.repeat(np.arange(B, dtype=np.int32), H2)
    n_fwd = jnp.where(strand_ok[:B], hits.n[:B], 0)
    n_rc = jnp.where(strand_ok[B:], hits.n[B:], 0)

    # ---- global expansion pool ---------------------------------------------
    # hb/he may be GLOBAL int64 slot ids (sharded slot64 regime); interval
    # widths are always narrow (<= max_interval), so the pool bookkeeping
    # stays int32 and only the absolute slot resolution goes wide below
    slot64 = hb.dtype == jnp.int64
    # pair mode: each pool slot covers TWO adjacent SA positions resolved by
    # one sa_meta pair-row gather (device_index meta_pairs) — halves the
    # expansion gathers/bookkeeping on wide-interval (repetitive) indexes;
    # the voting arrays below are the 2x unzip, so sort sizes are unchanged
    pairs = (
        cfg.expand_pairs
        and expand_fn is None
        and not slot64
        and didx is not None
        and didx.sa_meta.shape[1] >= 4
    )
    P = 2 if pairs else 1
    CAPP = (CAPG + P - 1) // P      # pool size in slot units (pairs or singles)
    w_el = jnp.where(hv, (he - hb).astype(jnp.int32), 0).reshape(-1)  # (NH,)
    w = (w_el + (P - 1)) // P if pairs else w_el  # per-hit pool-slot demand
    cs = jnp.cumsum(w)
    sg = cs - w                     # global start of each hit's slot range
    total_global = cs[-1]
    ends_r = cs.reshape(B, H2)[:, -1]
    starts_r = jnp.concatenate([ends_r[:1] * 0, ends_r[:-1]])
    over_budget = (ends_r > CAPP) & (ends_r > starts_r)
    over_budget = over_budget | hits.truncated[:B] | hits.truncated[B:]

    # slot -> hit: scatter hit ids at their range starts, then running max
    hit_ids = np.arange(NH, dtype=np.int32)
    valid_hit = (w > 0) & (sg < CAPP)
    scat_idx = jnp.where(valid_hit, sg, CAPP)
    # init from a traced scalar so no device-resident constant is embedded
    pool0 = jnp.broadcast_to(total_global * 0 - 1, (CAPP + 1,))
    pool_hit = pool0.at[scat_idx].max(jnp.where(valid_hit, hit_ids, -1), mode="drop")[:CAPP]
    pool_hit = lax.associative_scan(jnp.maximum, pool_hit)
    g = np.arange(CAPP, dtype=np.int32)
    slot_valid = (g < jnp.minimum(total_global, CAPP)) & (pool_hit >= 0)
    ph = jnp.clip(pool_hit, 0, NH - 1)

    # one multi-column row-gather resolves the hit fields for every slot
    rs_const = read_of_hit * 2 + hstrand.reshape(-1)  # host numpy
    if slot64:
        # int64 begins can't ride the int32 row stack: one extra 1-column
        # gather resolves the wide begin; everything else stays int32
        hit_rows = jnp.stack(
            [sg, hq.reshape(-1), jnp.broadcast_to(rs_const, sg.shape)], axis=-1
        )  # (NH, 3)
        g4 = jnp.take(hit_rows, ph, axis=0, mode="clip")  # (CAPP, 3)
        hb_at = jnp.take(hb.reshape(-1), ph, mode="clip")
        p = hb_at + (g - g4[:, 0])
        hq_slot = g4[:, 1]
        read = g4[:, 2] >> 1
        strand = g4[:, 2] & 1
    else:
        cols = [hb.reshape(-1), sg, hq.reshape(-1), jnp.broadcast_to(rs_const, sg.shape)]
        if pairs:
            cols.append(w_el)  # element width: bounds the pair's 2nd position
        hit_rows = jnp.stack(cols, axis=-1)  # (NH, 4 or 5)
        g4 = jnp.take(hit_rows, ph, axis=0, mode="clip")  # (CAPP, 4 or 5)
        p = g4[:, 0] + P * (g - g4[:, 1])
        hq_slot = g4[:, 2]
        read = g4[:, 3] >> 1
        strand = g4[:, 3] & 1
    if expand_fn is None:
        meta = row_gather_nd(didx.sa_meta, jnp.clip(p, 0, didx.sa_meta.shape[0] - 1))
        if pairs:
            # unzip pair rows -> element arrays (length 2*CAPP >= CAPG); the
            # element order equals the single-slot pool's SA-position order
            def z2(a, b):
                return jnp.stack([a, b], axis=1).reshape(-1)

            off_in_hit = P * (g - g4[:, 1])
            second_ok = slot_valid & (off_in_hit + 1 < g4[:, 4])
            t = z2(meta[:, 0], meta[:, 2])
            tpos = z2(meta[:, 1] - hq_slot, meta[:, 3] - hq_slot)
            read = z2(read, read)
            strand = z2(strand, strand)
            slot_valid = z2(slot_valid, second_ok)
        else:
            t = meta[:, 0]
            tpos = meta[:, 1] - hq_slot
    else:
        t, tpos = expand_fn(p, hq_slot)
    NEL = P * CAPP                  # voting element count (== CAPG up to round-up)

    # sort-key packing: (read, t*2+strand, [negsup,] tpos) fit one 2-word
    # uint32 key pair whenever the index's static stats bound the fields
    ts_val = t * 2 + strand
    packed = False
    if st is not None and getattr(st, "n_txps", 0) > 0:
        rb = (B + 1).bit_length()
        tb = (2 * st.n_txps + 1).bit_length()
        sb = (2 * H + 1).bit_length()
        bias = st.pad_tail  # tpos >= -(L-1) > -pad_tail (mmp asserts L < pad_tail)
        pb = max(1, (st.max_tpos + bias + 1).bit_length())
        packed = (rb + tb + sb + pb) <= 62 and expand_fn is None

    # ---- vote: sort by (read, t*2+strand, tpos), count equal runs -----------
    if packed:
        hi0, lo0 = _pack2([(read, rb), (ts_val, tb), (tpos + np.int32(bias), pb)])
        hi0 = jnp.where(slot_valid, hi0, FULLW)
        lo0 = jnp.where(slot_valid, lo0, FULLW)
        if cfg.bitonic_sort and NEL >= 2 and (NEL & (NEL - 1)) == 0:
            # no payload operands ride this sort (both words are keys), so the
            # unstable bitonic network is output-identical to lax.sort
            from rapmap_tpu.ops.pallas.sort2 import bitonic_sort_pairs

            khi, klo = bitonic_sort_pairs(hi0, lo0)
        else:
            khi, klo = lax.sort([hi0, lo0], dimension=0, num_keys=2)
        valid1 = khi != FULLW  # valid keys keep hi's top bits clear
        k1 = jnp.where(valid1, _unpack2(khi, klo, tb + pb, rb), BIG)
        k2 = jnp.where(valid1, _unpack2(khi, klo, pb, tb), BIG)
        p1 = _unpack2(khi, klo, 0, pb) - np.int32(bias)
        prev_same = (khi[1:] == khi[:-1]) & (klo[1:] == klo[:-1])
    else:
        key1 = jnp.where(slot_valid, read, BIG)
        key2 = jnp.where(slot_valid, ts_val, BIG)  # needs n_txps < 2^30
        k1, k2, p1 = lax.sort([key1, key2, tpos], dimension=0, num_keys=3)
        prev_same = (k1[1:] == k1[:-1]) & (k2[1:] == k2[:-1]) & (p1[1:] == p1[:-1])
        valid1 = k1 != BIG
    run_start = valid1 & jnp.concatenate([np.ones(1, bool), ~prev_same])
    run_id = jnp.cumsum(run_start.astype(jnp.int32)) - 1
    seg = jax.ops.segment_sum(
        valid1.astype(jnp.int32), jnp.clip(run_id, 0, NEL - 1), num_segments=NEL
    )
    support = jnp.where(run_start, flat_gather(seg, jnp.clip(run_id, 0, NEL - 1)), 0)

    # ---- per-(read,t,strand) best position -----------------------------------
    if packed and (sb + pb) <= 31:
        # runs already sit in (read, ts, tpos) order after sort 1, so the
        # per-group best (max support, ties -> smallest tpos) is a segment
        # ARGMAX over consecutive (read, ts) groups — no second global sort.
        # val packs (support, pmax - tpos) into one positive int32; tpos is
        # unique within a group's runs, so the group max is unique.
        k1s, k2s, p2, sup2 = k1, k2, p1, support
        new_grp = run_start & jnp.concatenate(
            [np.ones(1, bool), (k1[1:] != k1[:-1]) | (k2[1:] != k2[:-1])]
        )
        gid = jnp.cumsum(new_grp.astype(jnp.int32)) - 1
        pmax = np.int32((1 << pb) - 1)
        val = jnp.where(
            run_start,
            (support << np.int32(pb)) | (pmax - (p1 + np.int32(bias))),
            0,
        )
        gidc = jnp.clip(gid, 0, NEL - 1)
        gmax = jax.ops.segment_max(val, gidc, num_segments=NEL)
        grp_start = run_start & (val == flat_gather(gmax, gidc))
    else:
        k1r = jnp.where(run_start, k1, BIG)
        k2r = jnp.where(run_start, k2, BIG)
        k1s, k2s, negsup, p2, sup2 = lax.sort(
            [k1r, k2r, -support, p1, support], dimension=0, num_keys=4
        )
        grp_start = (k1s != BIG) & jnp.concatenate(
            [np.ones(1, bool), (k1s[1:] != k1s[:-1]) | (k2s[1:] != k2s[:-1])]
        )
    s2 = (k2s & 1).astype(jnp.int32)
    rclip = jnp.clip(k1s, 0, B - 1)
    # consistency filter (SEMANTICS.md §4)
    if cfg.consistent_hits:
        need = jnp.where(
            s2 == 0, flat_gather(n_fwd, rclip), flat_gather(n_rc, rclip)
        ) - (1 if cfg.fuzzy else 0)
        keep = grp_start & (sup2 >= need)
    else:
        keep = grp_start
    if cfg.strict_check:
        # orientation-bias curb (SEMANTICS.md §3): keep only the strand(s)
        # whose best kept score equals the read's overall best
        sid = jnp.clip(k1s * 2 + s2, 0, 2 * B - 1)
        m_rs = jax.ops.segment_max(
            jnp.where(keep, sup2, 0), sid, num_segments=2 * B
        )
        m_rs = jnp.maximum(m_rs, 0)
        best = jnp.maximum(m_rs[0::2], m_rs[1::2])  # (B,)
        keep = keep & (flat_gather(m_rs, sid) == flat_gather(best, rclip))

    # ---- per-read winner counts / ranks -------------------------------------
    counts = jax.ops.segment_sum(
        keep.astype(jnp.int32), rclip, num_segments=B
    )  # (B,) — rclip only counts real reads (keep is False where k1s == BIG)
    base = jnp.cumsum(counts) - counts  # exclusive per-read winner base
    gks = jnp.cumsum(keep.astype(jnp.int32)) - 1
    rank = gks - flat_gather(base, rclip)
    too_amb = counts > cfg.max_num_hits
    return CollateCore(
        keep=keep, rclip=rclip, k2s=k2s, p2=p2, sup2=sup2, rank=rank,
        counts=counts, too_ambiguous=too_amb, over_budget=over_budget,
    )


def collate_batch(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    hits: ScanHits,
    lens: jnp.ndarray,
    cfg: MapConfig,
    expand_fn=None,
) -> MapOut:
    """Winners scattered into the slotted (B, MAX_OUT) MapOut layout (used by
    the pair merge and the library API)."""
    B = hits.q.shape[0] // 2
    MO = cfg.out_slots
    c = _collate_core(didx, st, hits, lens, cfg, expand_fn)
    emit = c.keep & ~flat_gather(c.too_ambiguous, c.rclip) & (c.rank < MO)
    flatpos = jnp.where(emit, c.rclip * MO + c.rank, B * MO)
    tmpl = jnp.broadcast_to(c.counts.sum() * 0, (B * MO + 1,))
    out_t = (tmpl - 1).at[flatpos].set(jnp.where(emit, c.k2s >> 1, -1), mode="drop")[: B * MO].reshape(B, MO)
    out_p = tmpl.at[flatpos].set(jnp.where(emit, c.p2, 0), mode="drop")[: B * MO].reshape(B, MO)
    out_s = tmpl.at[flatpos].set(jnp.where(emit, c.k2s & 1, 0), mode="drop")[: B * MO].reshape(B, MO)
    out_sc = tmpl.at[flatpos].set(jnp.where(emit, c.sup2, 0), mode="drop")[: B * MO].reshape(B, MO)
    n_map = c.counts
    out_trunc = (n_map > MO) & ~c.too_ambiguous
    mapped = (n_map >= 1) & ~c.too_ambiguous
    return MapOut(
        t=out_t, pos=out_p, strand=out_s, score=out_sc,
        n_mappings=n_map, mapped=mapped, too_ambiguous=c.too_ambiguous,
        over_budget=c.over_budget, out_truncated=out_trunc,
    )


class MapFlags(NamedTuple):
    """Per-read outcome flags (MapOut minus the record payload)."""

    n_mappings: jnp.ndarray
    mapped: jnp.ndarray
    too_ambiguous: jnp.ndarray
    over_budget: jnp.ndarray
    out_truncated: jnp.ndarray


def collate_records_se(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    hits: ScanHits,
    lens: jnp.ndarray,
    cfg: MapConfig,
    cap: int,
    expand_fn=None,
    rec_spec=None,
    reads=None,
):
    """Winners compacted DIRECTLY into a dense (cap, W) record buffer.

    The core's winner rows already sit in (read, t*2+strand) sorted order —
    exactly the row-major layout compact_se(collate_batch(...)) produces — so
    the SE wire path skips the (B, MAX_OUT) scatter + re-compaction entirely
    (MAX_OUT disappears from the hot program). With rec_spec (wire.RecSpec),
    rows pack into W=2 words instead of 4 — halves both the record scatter
    and the d2h bytes. With cfg.mapping_score (and `reads`), the record
    score field carries the banded alignment score (ops.align, computed on
    the compacted cap rows) instead of the MMP support. Returns
    (SERecords, MapFlags)."""
    from rapmap_tpu.ops.compact import SERecords

    B = hits.q.shape[0] // 2
    c = _collate_core(didx, st, hits, lens, cfg, expand_fn)
    emit = c.keep & ~flat_gather(c.too_ambiguous, c.rclip)
    gidx = jnp.cumsum(emit.astype(jnp.int32)) - 1
    dest = jnp.where(emit, jnp.minimum(gidx, cap), cap)
    fields = [c.k2s >> 1, c.p2, c.k2s & 1, c.sup2]
    if cfg.mapping_score and reads is not None:
        # scatter the unpacked columns + read id first, score the dense cap
        # rows (the pool's CAPG rows would be ~expand_budget/rec_slots times
        # more lockstep DP lanes), then pack columns elementwise
        from rapmap_tpu.ops.align import score_records

        cols = jnp.stack(fields[:3] + [c.rclip], axis=-1)
        raw = (
            jnp.zeros((cap + 1, 4), jnp.int32)
            .at[dest].set(cols.astype(jnp.int32), mode="drop")[:cap]
        )
        row_live = (np.arange(cap, dtype=np.int32) + c.counts.sum() * 0) < jnp.minimum(
            jnp.sum(emit, dtype=jnp.int32), cap
        )
        sc = score_records(
            didx, cfg, reads, lens, raw[:, 3], raw[:, 0], raw[:, 1],
            raw[:, 2], row_live,
        )
        fields = [raw[:, 0], raw[:, 1], raw[:, 2], sc]
        if rec_spec is not None:
            from rapmap_tpu.ops.wire import pack_rec_fields

            fields = list(pack_rec_fields(rec_spec, fields))
        recs = jnp.stack(fields, axis=-1).astype(jnp.int32)
    else:
        if rec_spec is not None:
            from rapmap_tpu.ops.wire import pack_rec_fields

            fields = list(pack_rec_fields(rec_spec, fields))
        W = len(fields)
        rows = jnp.stack(fields, axis=-1)
        buf = jnp.zeros((cap + 1, W), jnp.int32)
        recs = buf.at[dest].set(rows.astype(jnp.int32), mode="drop")[:cap]
    emitted = jax.ops.segment_sum(emit.astype(jnp.int32), c.rclip, num_segments=B)
    ends = jnp.cumsum(emitted)
    counts = jnp.minimum(ends, cap) - jnp.minimum(ends - emitted, cap)
    total = jnp.sum(emit, dtype=jnp.int32)
    se = SERecords(recs=recs, counts=counts, total=total, overflowed=total > cap)
    mapped = (c.counts >= 1) & ~c.too_ambiguous
    flags = MapFlags(
        n_mappings=c.counts, mapped=mapped, too_ambiguous=c.too_ambiguous,
        over_budget=c.over_budget, out_truncated=mapped & (emitted < c.counts),
    )
    return se, flags
