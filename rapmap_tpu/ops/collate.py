"""Hit collation: SA intervals -> per-transcript mappings (HitManager rebuild).

SEMANTICS.md §4 as batched sort/segment ops (SURVEY.md §7.1 kernel 4):
  1. budgeted expansion of every hit's SA interval into per-read slots
  2. (t, strand, tpos) voting via one lexicographic sort + run-length counts
  3. per-(t,strand) best-position selection via a second sort
  4. winner compaction via a third sort, capped at cfg.max_out

Everything is static-shaped; budget overflows set per-read over_budget flags
instead of changing shapes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.config import MapConfig
from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic
from rapmap_tpu.ops.gather import flat_gather, row_gather
from rapmap_tpu.ops.mmp import ScanHits

BIG = np.int32(2**31 - 1)


class MapOut(NamedTuple):
    t: jnp.ndarray        # (B, MAX_OUT) int32, -1 = none
    pos: jnp.ndarray      # (B, MAX_OUT) int32
    strand: jnp.ndarray   # (B, MAX_OUT) int32, 0 = fwd, 1 = rc
    score: jnp.ndarray    # (B, MAX_OUT) int32 (MMP support)
    n_mappings: jnp.ndarray   # (B,) int32 — pre-cap mapping count
    mapped: jnp.ndarray       # (B,) bool
    too_ambiguous: jnp.ndarray  # (B,) bool
    over_budget: jnp.ndarray    # (B,) bool — expansion budget or hit buffer blown
    out_truncated: jnp.ndarray  # (B,) bool — winners > max_out emitted slots


def collate_batch(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    hits: ScanHits,
    lens: jnp.ndarray,  # (B,) read lengths
    cfg: MapConfig,
    expand_fn=None,
) -> MapOut:
    """expand_fn(slot_index p, query_pos q) -> (t, tpos) resolves one expanded
    occurrence; defaults to the quasi/SA resolution. The pseudo path passes its
    CSR resolver instead (SEMANTICS.md §7)."""
    R, H = hits.q.shape
    B = R // 2
    EXP = cfg.expand_budget
    MO = cfg.max_out
    H2 = 2 * H

    # ---- per-strand coverage gate (quasi_coverage) --------------------------
    hvalid_rows = np.arange(H, dtype=np.int32)[None, :] < hits.n[:, None]  # (R, H)
    cov = jnp.sum(jnp.where(hvalid_rows, hits.l, 0), axis=1)  # (R,)
    lens2 = jnp.concatenate([lens, lens])
    if cfg.quasi_coverage > 0.0:
        strand_ok = cov.astype(jnp.float32) >= cfg.quasi_coverage * lens2.astype(jnp.float32)
    else:
        strand_ok = hits.n >= 0
    hvalid_rows = hvalid_rows & strand_ok[:, None]

    # ---- fold (fwd, rc) rows into (B, 2H) hit tables ------------------------
    def fold(x):
        return jnp.concatenate([x[:B], x[B:]], axis=1)  # (B, 2H), fwd hits first

    hq, hl, hb, he = fold(hits.q), fold(hits.l), fold(hits.b), fold(hits.e)
    hv = fold(hvalid_rows)
    hstrand = np.concatenate(
        [np.zeros((B, H), np.int32), np.ones((B, H), np.int32)], axis=1
    )
    n_fwd = jnp.where(strand_ok[:B], hits.n[:B], 0)
    n_rc = jnp.where(strand_ok[B:], hits.n[B:], 0)

    # ---- budgeted expansion -------------------------------------------------
    w = jnp.where(hv, he - hb, 0)  # (B, 2H)
    s_h = jnp.cumsum(w, axis=1) - w  # exclusive prefix
    total = jnp.sum(w, axis=1)  # (B,)
    over_budget = (total > EXP) | hits.truncated[:B] | hits.truncated[B:]

    j = np.arange(EXP, dtype=np.int32)  # slots
    # h(j) = last hit whose exclusive-prefix start <= j (zero-width hits skipped)
    cmp = s_h[:, None, :] <= j[None, :, None]  # (B, EXP, 2H)
    hidx = jnp.sum(cmp, axis=2, dtype=jnp.int32) - 1  # (B, EXP)
    hidx_c = jnp.clip(hidx, 0, H2 - 1)
    slot_valid = j[None, :] < jnp.minimum(total, EXP)[:, None]

    # one 4-column row-gather resolves the hit fields for every slot
    hit_rows = jnp.stack(
        [hb, s_h, hq, jnp.broadcast_to(hstrand, hb.shape)], axis=-1
    ).reshape(B * H2, 4)
    flat = (np.arange(B, dtype=np.int32)[:, None] * H2 + hidx_c).reshape(-1)
    g4 = jnp.take(hit_rows, flat, axis=0, mode="clip").reshape(B, EXP, 4)
    p = g4[..., 0] + (j[None, :] - g4[..., 1])
    hq_slot = g4[..., 2]
    strand = g4[..., 3]
    if expand_fn is None:
        # one row-gather: [transcript id, precomputed transcript-local pos]
        from rapmap_tpu.ops.gather import row_gather_nd

        meta = row_gather_nd(didx.sa_meta, jnp.clip(p, 0, didx.sa_meta.shape[0] - 1))
        t = meta[..., 0]
        tpos = meta[..., 1] - hq_slot
    else:
        t, tpos = expand_fn(p, hq_slot)
    # packed sort key: t*2 + strand (requires n_txps < 2^30), BIG = invalid
    key = jnp.where(slot_valid, t * 2 + strand, BIG)

    # ---- vote: sort by (key, tpos), count equal runs ------------------------
    k1, p1 = lax.sort([key, tpos], dimension=1, num_keys=2)
    prev_same = (k1[:, 1:] == k1[:, :-1]) & (p1[:, 1:] == p1[:, :-1])
    valid1 = k1 != BIG
    run_start = valid1 & jnp.concatenate(
        [np.ones((B, 1), bool), ~prev_same], axis=1
    )
    run_id = jnp.cumsum(run_start.astype(jnp.int32), axis=1) - 1  # (B, EXP)
    gid = (np.arange(B, dtype=np.int32)[:, None] * EXP + jnp.clip(run_id, 0, EXP - 1)).reshape(-1)
    seg = jax.ops.segment_sum(
        valid1.astype(jnp.int32).reshape(-1), gid, num_segments=B * EXP
    ).reshape(B, EXP)
    support = jnp.where(run_start, row_gather(seg, jnp.clip(run_id, 0, EXP - 1)), 0)

    # ---- per-(t,strand) best position: sort runs by (key, -support, tpos) ---
    k2, negsup2, p2, sup2 = lax.sort(
        [jnp.where(run_start, k1, BIG), -support, p1, support],
        dimension=1,
        num_keys=3,
    )
    s2 = (k2 & 1).astype(jnp.int32)
    grp_start = (k2 != BIG) & jnp.concatenate(
        [np.ones((B, 1), bool), k2[:, 1:] != k2[:, :-1]], axis=1
    )
    # consistency filter (SEMANTICS.md §4)
    if cfg.consistent_hits:
        need = jnp.where(
            s2 == 0, n_fwd[:, None], n_rc[:, None]
        ) - (1 if cfg.fuzzy else 0)
        keep = grp_start & (sup2 >= need)
    else:
        keep = grp_start
    if cfg.strict_check:
        # orientation-bias curb (SEMANTICS.md §3): keep only the strand(s)
        # whose best kept score equals the read's overall best
        m_fwd = jnp.max(jnp.where(keep & (s2 == 0), sup2, 0), axis=1, keepdims=True)
        m_rc = jnp.max(jnp.where(keep & (s2 == 1), sup2, 0), axis=1, keepdims=True)
        best_s = jnp.maximum(m_fwd, m_rc)
        keep = keep & (jnp.where(s2 == 0, m_fwd, m_rc) == best_s)

    # ---- compact winners: sort by packed key, take first MAX_OUT ------------
    # winners have unique keys, so a single sort key suffices
    k3, p3, sup3 = lax.sort(
        [jnp.where(keep, k2, BIG), p2, sup2], dimension=1, num_keys=1
    )
    n_map = jnp.sum(keep, axis=1, dtype=jnp.int32)
    too_amb = n_map > cfg.max_num_hits
    out_trunc = (n_map > MO) & ~too_amb
    emit = (~too_amb)[:, None] & (k3[:, :MO] != BIG)
    out_t = jnp.where(emit, k3[:, :MO] >> 1, -1)
    out_p = jnp.where(emit, p3[:, :MO], 0)
    out_s = jnp.where(emit, k3[:, :MO] & 1, 0)
    out_sc = jnp.where(emit, sup3[:, :MO], 0)
    mapped = (n_map >= 1) & ~too_amb
    return MapOut(
        t=out_t, pos=out_p, strand=out_s, score=out_sc,
        n_mappings=n_map, mapped=mapped, too_ambiguous=too_amb,
        over_budget=over_budget, out_truncated=out_trunc,
    )

