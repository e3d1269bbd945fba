"""MMP search with NIP skipping — the compute core (SACollector rebuild).

Design (SURVEY.md §7.1 kernels 2-3), two phases:

  1. *Dense lookup*: k-mer table probes for EVERY window position of every
     (read, strand) lane at once — a handful of fully-vectorized (R, S)
     gather steps, no loop. Misses, N-windows, and over-abundant k-mers are
     resolved here, for free.
  2. *Anchor walk*: the serial NIP-skipping scan, in lockstep across lanes as
     one batched while_loop — but each iteration lands directly on the next
     anchor (precomputed next-anchor table), so misses cost zero iterations;
     the trip count is max MMPs-per-lane (~2-6), not read length.

Equivalent to the reference's sequential loop (SEMANTICS.md §3): positions
it would visit without recording a hit advance deterministically by +1 (miss,
wide) or to just past the N (invalid window), so the set and order of
*recorded* anchors is identical.

All constants are numpy (host) — eager jnp constants become device residents
that lowering must fetch back, which is pathologically slow through the axon
TPU tunnel.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.config import MapConfig
from rapmap_tpu.ops import encode as denc
from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic
from rapmap_tpu.ops.gather import flat_gather, row_gather
from rapmap_tpu.ops.lookup import kmer_lookup


class ScanHits(NamedTuple):
    q: jnp.ndarray      # (R, H) int32 query positions
    l: jnp.ndarray      # (R, H) int32 MMP lengths
    b: jnp.ndarray      # (R, H) int32 interval begins
    e: jnp.ndarray      # (R, H) int32 interval ends
    n: jnp.ndarray      # (R,)  int32 hit counts
    truncated: jnp.ndarray  # (R,) bool — hit buffer overflowed (over_budget)


def _col_lower_bound(didx: DeviceQuasiIndex, b, e, d, c, steps: int):
    """Per-lane lower bound of char c in the depth-d text column over SA[b:e).
    (Reference per-depth extension; kept as the packed path's cross-check.
    Needs the flat sa/text arrays, so unavailable for bigSA indexes.)"""
    assert didx.sa is not None and didx.text is not None, (
        "charwise extension needs the flat sa/text arrays; bigSA indexes "
        "support only packed_extension=True"
    )
    n_sa = didx.sa.shape[0]

    def step(_, iv):
        lo, hi = iv
        mid = (lo + hi) >> 1
        g = didx.sa[jnp.clip(mid, 0, n_sa - 1)]
        v = didx.text[g + d].astype(jnp.int32)
        less = v < c
        cont = lo < hi
        lo2 = jnp.where(less, mid + 1, lo)
        hi2 = jnp.where(less, hi, mid)
        return (jnp.where(cont, lo2, lo), jnp.where(cont, hi2, hi))

    lo_f, _ = lax.fori_loop(0, steps, step, (b, e))
    return lo_f


def _extend(didx, reads, lens, b0, e0, pos, active, k: int, ext_steps: int):
    """extendSearchNaive rebuild: per-depth interval narrowing until mismatch."""
    R, L = reads.shape

    def cond(s):
        return jnp.any(s[3])

    def body(s):
        b, e, d, alive = s
        ic = pos + d
        c = row_gather(reads, jnp.clip(ic, 0, L - 1)[:, None])[:, 0].astype(jnp.int32)
        ok = alive & (ic < lens) & (c >= 1) & (c <= 4)
        lb = _col_lower_bound(didx, b, e, d, c, ext_steps)
        ub = _col_lower_bound(didx, b, e, d, c + 1, ext_steps)
        adv = ok & (lb < ub)
        return (
            jnp.where(adv, lb, b),
            jnp.where(adv, ub, e),
            jnp.where(adv, d + 1, d),
            adv,
        )

    d0 = b0 * 0 + k
    b, e, d, _ = lax.while_loop(cond, body, (b0, e0, d0, active))
    return b, e, d


def scan_batch_paired(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    reads: jnp.ndarray,  # (B, L) int8 — FORWARD reads only
    lens: jnp.ndarray,   # (B,) int32
    cfg: MapConfig,
) -> ScanHits:
    """SEMANTICS.md §3 scan over [fwd; rc] lanes with a SHARED dense lookup.

    Identical hits to scan_batch over explicitly-built [fwd; rc] lanes
    (tested bit-for-bit), but the dense phase probes the canonical-class CHD
    once per forward window and reads BOTH strands' intervals from the class
    row (ops.lookup.kmer_lookup_2str): the rc lane's window at position s'
    is the reverse complement of the fwd window at lens-k-s', so its lookup
    is answered by the same probe, halving lookup gathers — the dominant
    device cost (67% in the round-2 stage profile). The rc lane's anchor
    walk runs in its own coordinates; dense-array accesses map through
    col = lens - k - pos, and its next-anchor table is a prev-anchor scan in
    fwd coordinates. Requires st.chd_canonical."""
    from rapmap_tpu.ops.lookup import kmer_lookup_2str

    B, L = reads.shape
    k = st.k
    H = cfg.max_hits_per_strand
    S = L - k + 1
    assert L < st.pad_tail, "read length must stay below the text tail pad"
    eff_w = min(cfg.max_interval, st.max_interval_idx)
    ext_steps = max(1, math.ceil(math.log2(eff_w + 1)) + 1)

    lens2 = jnp.concatenate([lens, lens])
    R = 2 * B

    if cfg.packed_extension:
        from rapmap_tpu.ops.extend_packed import extend_packed, pack_reads

        # rc lanes RIGHT-ALIGNED by a static flip (comp_flip_batch) — no
        # per-row take_along_axis gather (measured ~0.5 us/read); rc data
        # position p lives at column p + (L - len), threaded into the
        # extension as col_off. Dense keys only ever read the fwd rows.
        lanes = jnp.concatenate([reads, denc.comp_flip_batch(reads)], axis=0)
        col_off2 = jnp.concatenate([lens * 0, np.int32(L) - lens])
        next_bad = denc.next_bad_batch(lanes, L)
        preads = pack_reads(lanes)
    else:
        lanes = jnp.concatenate([reads, denc.revcomp_batch(reads, lens)], axis=0)

    # ---- dense phase: ONE canonical probe per forward window ---------------
    if cfg.packed_extension:
        # keys fall out of the packed words already built for extension
        key_hi, key_lo, kvalid = denc.kmer_keys_from_packed(
            preads[:B], next_bad[:B], k, S
        )
    else:
        key_hi, key_lo, kvalid = denc.kmer_keys_batch(reads, k)  # (B, S)
    ff, bf, ef, fr, br, er = kmer_lookup_2str(didx, st, key_hi, key_lo)
    in_len = (np.arange(S, dtype=np.int32)[None, :] + k) <= lens[:, None]
    ok = kvalid & in_len
    anch_f = ff & ok & ((ef - bf) <= cfg.max_interval)
    anch_rF = fr & ok & ((er - br) <= cfg.max_interval)  # rc anchors, fwd coords

    s_ix = np.arange(S, dtype=np.int32)[None, :]
    nf = jnp.where(anch_f, s_ix, np.int32(S))  # next anchor >= s (fwd lanes)
    next_f = jnp.flip(lax.associative_scan(jnp.minimum, jnp.flip(nf, axis=1), axis=1), axis=1)
    pv = jnp.where(anch_rF, s_ix, np.int32(-1))  # prev anchor <= s (rc lanes)
    prev_rF = lax.associative_scan(jnp.maximum, pv, axis=1)

    # lane-aligned stacks: row r < B = fwd arrays, row r >= B = rc arrays
    db2 = jnp.concatenate([bf, br], axis=0)
    de2 = jnp.concatenate([ef, er], axis=0)
    anc2 = jnp.concatenate([next_f, prev_rF], axis=0)
    is_rc = np.arange(R, dtype=np.int32) >= B

    def at2(arr2d, col):
        return row_gather(arr2d, jnp.clip(col, 0, S - 1)[:, None])[:, 0]

    def next_anchor_pos(nxt):
        """Smallest lane-local anchor position >= nxt, else S (full width)."""
        col = jnp.where(is_rc, lens2 - k - nxt, nxt)
        v = at2(anc2, col)
        fwd_next = jnp.where(nxt < S, v, np.int32(S))
        rc_next = jnp.where((col >= 0) & (v >= 0), lens2 - k - v, np.int32(S))
        return jnp.where(is_rc, rc_next, fwd_next)

    pos_init = next_anchor_pos(lens2 * 0)
    db2f = db2.reshape(-1)
    de2f = de2.reshape(-1)
    anc2f = anc2.reshape(-1)
    zscal = lens2[0] * 0

    def _walk_machinery(lane):
        """(cond, body) of the lockstep anchor walk over a static lane set.

        Per-lane results are bit-identical at any width: positions visited
        and hit order depend only on the lane's own data. Hit fields ride
        one fused (R, H, 4) buffer -> ONE scatter per trip, indexed by
        ABSOLUTE lane id so phases at different widths share it."""
        lane_is_rc = lane >= np.int32(B)
        lens_l = flat_gather(lens2, lane)

        def nap(nxt):
            col = jnp.where(lane_is_rc, lens_l - k - nxt, nxt)
            v = flat_gather(anc2f, lane * np.int32(S) + jnp.clip(col, 0, S - 1))
            fwd_next = jnp.where(nxt < S, v, np.int32(S))
            rc_next = jnp.where((col >= 0) & (v >= 0), lens_l - k - v, np.int32(S))
            return jnp.where(lane_is_rc, rc_next, fwd_next)

        def cond(state):
            pos, n, trunc, buf = state
            return jnp.any((pos < S) & ~trunc)

        def body(state):
            pos, n, trunc, buf = state
            act = (pos < S) & ~trunc
            posc = jnp.clip(pos, 0, S - 1)
            col = jnp.where(lane_is_rc, lens_l - k - posc, posc)
            fi = lane * np.int32(S) + jnp.clip(col, 0, S - 1)
            b0 = flat_gather(db2f, fi)
            e0 = flat_gather(de2f, fi)
            if cfg.packed_extension:
                b1, e1, mlen = extend_packed(
                    didx, preads, next_bad, lens2, b0, e0, posc, act, k,
                    ext_steps, L, lane=lane, col_off=col_off2,
                )
            else:
                # charwise cross-check path: materialize the lane rows
                b1, e1, mlen = _extend(
                    didx, jnp.take(lanes, lane, axis=0), lens_l,
                    b0, e0, posc, act, k, ext_steps,
                )
            slot = jnp.clip(n, 0, H - 1)
            overflow = act & (n >= H)
            write = act & ~overflow
            rows4 = jnp.stack([posc, mlen, b1, e1], axis=-1)
            buf = buf.at[jnp.where(write, lane, np.int32(R)), slot].set(
                rows4, mode="drop"
            )
            nxt = posc + jnp.maximum(1, mlen - k + 1)
            pos2 = nap(nxt)
            return (
                jnp.where(act, pos2, pos),
                n + write.astype(jnp.int32),
                trunc | overflow,
                buf,
            )

        return cond, body

    def walk(lane):
        """Anchor walk over the given lane id set (width may be < R).

        Two-phase: trip 1 runs at full width (every active lane records its
        first MMP hit), then the still-active lanes — typically the ~1-2%
        whose reads have a second anchor — compact into a W4 = width/4 set
        and the remaining trips run there, cutting the tail trips' gather
        width 4x. If actives exceed W4 (unusual hit-dense data) the walk
        falls back to continuing at full width, bit-identically.
        Returns (n, truncated, hitbuf) merged back to full (R,) shape.
        """
        W0 = int(lane.shape[0])
        pos_l = flat_gather(pos_init, lane)
        n0 = jnp.broadcast_to(zscal, lane.shape)
        buf0 = jnp.broadcast_to(zscal, (R + 1, H, 4))
        trunc0 = pos_l < 0
        cond, body = _walk_machinery(lane)

        # trip 1, full width (a no-op when nothing is active: writes masked)
        st1 = body((pos_l, n0, trunc0, buf0))

        def scatter_full(lane_ids, n_l, trunc_l):
            n_full = jnp.broadcast_to(zscal, (R + 1,)).at[lane_ids].set(n_l)[:R]
            tr_full = (
                jnp.broadcast_to(zscal, (R + 1,))
                .at[lane_ids].set(trunc_l.astype(jnp.int32))[:R]
            )
            return n_full, tr_full.astype(bool)

        W4 = max(1, W0 // 4)

        def narrow_tail():
            pos1, n1, trunc1, buf1 = st1
            act1 = (pos1 < S) & ~trunc1
            ia1 = jnp.cumsum(act1.astype(jnp.int32)) - 1
            na1 = ia1[-1] + 1
            dest1 = jnp.where(act1, ia1, W0)
            sel = (
                jnp.broadcast_to(zscal, (W0 + 1,))
                .at[dest1].set(np.arange(W0, dtype=np.int32) + zscal)[:W4]
            )
            lane4 = flat_gather(lane, sel)
            # inactive tail slots of lane4 carry stale ids; empty their
            # state so they neither walk nor scatter over live results
            live4 = (np.arange(W4, dtype=np.int32) + zscal) < na1
            lane4 = jnp.where(live4, lane4, np.int32(R))
            pos4 = jnp.where(live4, flat_gather(pos1, sel), np.int32(S))
            n4 = jnp.where(live4, flat_gather(n1, sel), 0)
            trunc4 = jnp.where(live4, flat_gather(trunc1, sel), True)
            cond4, body4 = _walk_machinery(jnp.clip(lane4, 0, R))
            _, n4f, trunc4f, buf4 = lax.while_loop(
                cond4, body4, (pos4, n4, trunc4, buf1)
            )
            n_full, tr_full = scatter_full(lane, n1, trunc1)
            lane4c = jnp.where(live4, lane4, np.int32(R))
            n_full = (
                jnp.concatenate([n_full, zscal[None]])
                .at[lane4c].set(jnp.where(live4, n4f, 0), mode="drop")[:R]
            )
            tr_full = (
                jnp.concatenate([tr_full, (zscal < 0)[None]])
                .at[lane4c].set(trunc4f & live4, mode="drop")[:R]
            )
            return n_full, tr_full, buf4[:R]

        def full_tail():
            _, n_l, trunc_l, buf = lax.while_loop(cond, body, st1)
            n_full, tr_full = scatter_full(lane, n_l, trunc_l)
            return n_full, tr_full, buf[:R]

        pos1, _, trunc1, _ = st1
        na_after1 = jnp.sum(((pos1 < S) & ~trunc1).astype(jnp.int32))
        return lax.cond(na_after1 <= np.int32(W4), narrow_tail, full_tail)

    # dead-lane compaction: lanes with no anchor at all (typically the whole
    # wrong strand of every read) never enter the walk, halving both the
    # gather width and the wasted lockstep trips. Stable partition active
    # lanes first; if actual active count exceeds the static budget R_W
    # (heavily both-strand data), fall back to the full-width walk.
    active0 = pos_init < S
    na = jnp.sum(active0.astype(jnp.int32))
    ia = jnp.cumsum(active0.astype(jnp.int32)) - 1
    ib = na + jnp.cumsum((~active0).astype(jnp.int32)) - 1
    dest = jnp.where(active0, ia, ib)
    perm = (
        jnp.broadcast_to(zscal, (R,))
        .at[dest].set(np.arange(R, dtype=np.int32) + zscal)
    )
    R_W = (R * 5) // 8
    n_full, tr_full, buf = lax.cond(
        na <= np.int32(R_W),
        lambda: walk(perm[:R_W]),
        lambda: walk(np.arange(R, dtype=np.int32) + zscal),
    )
    return ScanHits(
        q=buf[..., 0], l=buf[..., 1], b=buf[..., 2], e=buf[..., 3],
        n=n_full, truncated=tr_full,
    )


def scan_dispatch(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    reads: jnp.ndarray,  # (B, L) int8 — FORWARD reads
    lens: jnp.ndarray,   # (B,) int32
    cfg: MapConfig,
) -> ScanHits:
    """Strand-paired scan of forward reads -> (2B, H) lane hits.

    Picks the canonical-CHD paired scan (one dense probe per k-mer class)
    when the index carries one, else builds [fwd; rc] lanes explicitly and
    runs the per-lane scan. Rows [0, B) are forward lanes, [B, 2B) rc."""
    if getattr(st, "chd_canonical", False):
        return scan_batch_paired(didx, st, reads, lens, cfg)
    lanes = jnp.concatenate([reads, denc.revcomp_batch(reads, lens)], axis=0)
    lens2 = jnp.concatenate([lens, lens])
    return scan_batch(didx, st, lanes, lens2, cfg)


def scan_batch(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    reads: jnp.ndarray,  # (R, L) int8 — rows are (read, strand) lanes
    lens: jnp.ndarray,   # (R,) int32
    cfg: MapConfig,
) -> ScanHits:
    """SEMANTICS.md §3 scan over every lane in lockstep."""
    R, L = reads.shape
    k = st.k
    H = cfg.max_hits_per_strand
    S = L - k + 1
    assert L < st.pad_tail, "read length must stay below the text tail pad"
    # binary-search trips need only cover the widest interval that can
    # actually occur: min(configured cap, widest k-mer interval in the index)
    eff_w = min(cfg.max_interval, st.max_interval_idx)
    ext_steps = max(1, math.ceil(math.log2(eff_w + 1)) + 1)

    if cfg.packed_extension:
        from rapmap_tpu.ops.extend_packed import extend_packed, pack_reads

        next_bad = denc.next_bad_batch(reads, L)
        preads = pack_reads(reads)

    # ---- phase 1: dense lookup over all window positions --------------------
    if cfg.packed_extension:
        key_hi, key_lo, kvalid = denc.kmer_keys_from_packed(preads, next_bad, k, S)
    else:
        key_hi, key_lo, kvalid = denc.kmer_keys_batch(reads, k)  # (R, S)
    found, db, de = kmer_lookup(didx, st, key_hi, key_lo)
    in_len = (np.arange(S, dtype=np.int32)[None, :] + k) <= lens[:, None]
    found = found & kvalid & in_len
    anchor = found & ((de - db) <= cfg.max_interval)
    # next_anchor[s] = smallest s' >= s with anchor[s'], else S
    s_or_big = jnp.where(anchor, np.arange(S, dtype=np.int32)[None, :], np.int32(S))
    next_anchor = jnp.flip(
        lax.associative_scan(jnp.minimum, jnp.flip(s_or_big, axis=1), axis=1), axis=1
    )

    def at(arr2d, pos, fill):
        v = row_gather(arr2d, jnp.clip(pos, 0, arr2d.shape[1] - 1)[:, None])[:, 0]
        return jnp.where(pos < arr2d.shape[1], v, fill)

    zR_H = np.zeros((R, H), np.int32)
    hits0 = ScanHits(
        q=zR_H, l=zR_H, b=zR_H, e=zR_H,
        n=lens * 0, truncated=lens < 0,
    )
    pos0 = at(next_anchor, lens * 0, np.int32(S))
    rows = np.arange(R, dtype=np.int32)

    # ---- phase 2: anchor walk ----------------------------------------------
    def cond(state):
        pos, hits = state
        return jnp.any((pos < S) & ~hits.truncated)

    def body(state):
        pos, hits = state
        act = (pos < S) & ~hits.truncated
        posc = jnp.clip(pos, 0, S - 1)
        b0 = at(db, posc, np.int32(0))
        e0 = at(de, posc, np.int32(0))
        if cfg.packed_extension:
            b1, e1, mlen = extend_packed(
                didx, preads, next_bad, lens, b0, e0, posc, act, k, ext_steps, L
            )
        else:
            b1, e1, mlen = _extend(didx, reads, lens, b0, e0, posc, act, k, ext_steps)

        slot = jnp.clip(hits.n, 0, H - 1)
        overflow = act & (hits.n >= H)
        write = act & ~overflow

        def put(buf, val):
            old = buf[rows, slot]
            return buf.at[rows, slot].set(jnp.where(write, val, old))

        hits = ScanHits(
            q=put(hits.q, posc),
            l=put(hits.l, mlen),
            b=put(hits.b, b1),
            e=put(hits.e, e1),
            n=hits.n + write.astype(jnp.int32),
            truncated=hits.truncated | overflow,
        )
        nxt = posc + jnp.maximum(1, mlen - k + 1)
        pos_next = jnp.where(nxt >= S, np.int32(S), at(next_anchor, nxt, np.int32(S)))
        return jnp.where(act, pos_next, pos), hits

    _, hits = lax.while_loop(cond, body, (pos0, hits0))
    return hits
