"""Device-side record compaction: pack sparse per-read mapping slots into a
dense record buffer before device->host transfer.

The (B, MAX_OUT) MapOut/PairOut layouts are mostly empty (-1) slots; shipping
them to the host costs MAX_OUT/avg_records more bytes than needed (painful on
low-bandwidth links, wasteful everywhere). One cumsum + scatter packs the
valid records row-major, so the host SAM writer walks a dense array.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.ops.collate import MapOut
from rapmap_tpu.ops.pairs import PairOut


def rid_from_counts(counts: jnp.ndarray, cap: int) -> jnp.ndarray:
    """(B,) per-read record counts -> (cap,) read id of each dense record row
    (rows past the written total get the last writing read; callers mask by
    row < total). Scatter read ids at each read's start offset + running max
    — the same slot-assignment trick as the collate expansion pool."""
    B = counts.shape[0]
    starts = jnp.cumsum(counts) - counts
    scat = jnp.where(counts > 0, jnp.minimum(starts, cap), cap)
    buf = jnp.broadcast_to(counts.sum() * 0 - 1, (cap + 1,))
    rid = buf.at[scat].max(
        np.arange(B, dtype=np.int32) + counts.sum() * 0, mode="drop"
    )[:cap]
    rid = lax.associative_scan(jnp.maximum, rid)
    return jnp.clip(rid, 0, B - 1)


class SERecords(NamedTuple):
    recs: jnp.ndarray       # (cap, 4) int32: t, pos, strand, score (row-major by read)
    counts: jnp.ndarray     # (B,) int32 records per read
    total: jnp.ndarray      # scalar int32
    overflowed: jnp.ndarray  # scalar bool — cap exceeded, tail dropped


class PERecords(NamedTuple):
    recs: jnp.ndarray       # (cap, 7) int32: t, p1, s1, has1, p2, s2, has2
    counts: jnp.ndarray
    total: jnp.ndarray
    overflowed: jnp.ndarray


def _compact(fields: list[jnp.ndarray], valid: jnp.ndarray, cap: int):
    """fields: (B, MO) each; valid: (B, MO) bool -> dense (cap, len(fields))."""
    B, MO = valid.shape
    fv = valid.reshape(-1)
    dest = jnp.cumsum(fv.astype(jnp.int32)) - 1
    dest = jnp.where(fv, jnp.minimum(dest, cap), cap)  # invalid/overflow -> row cap
    stacked = jnp.stack([f.reshape(-1) for f in fields], axis=-1)  # (B*MO, F)
    buf = jnp.zeros((cap + 1, stacked.shape[-1]), jnp.int32)
    recs = buf.at[dest].set(stacked.astype(jnp.int32), mode="drop")[:cap]
    total = jnp.sum(fv, dtype=jnp.int32)
    # clamp per-read counts to what was actually written, so host writers
    # walking recs by counts never index past the cap on overflow
    raw = jnp.sum(valid, axis=1, dtype=jnp.int32)
    ends = jnp.cumsum(raw)
    counts = jnp.minimum(ends, cap) - jnp.minimum(ends - raw, cap)
    return recs, counts, total, total > cap


def compact_se(out: MapOut, cap: int) -> SERecords:
    valid = out.t != -1
    recs, counts, total, ovf = _compact(
        [out.t, out.pos, out.strand, out.score], valid, cap
    )
    return SERecords(recs, counts, total, ovf)


def compact_pe(po: PairOut, cap: int, rec_spec=None, score_args=None) -> PERecords:
    """score_args = (didx, cfg, reads1, lens1, reads2, lens2) appends per-mate
    alignment scores (cfg.mapping_score, SEMANTICS.md §9) as fields 7-8,
    computed on the compacted rows."""
    valid = po.t != -1
    fields = [po.t, po.p1, po.s1, po.has1.astype(jnp.int32), po.p2, po.s2,
              po.has2.astype(jnp.int32)]
    if score_args is not None and score_args[1].mapping_score:
        didx, cfg, r1, l1, r2, l2 = score_args
        raw, counts, total, ovf = _compact(fields, valid, cap)
        from rapmap_tpu.ops.align import score_pe_rows

        rid = rid_from_counts(counts, cap)
        live = (np.arange(cap, dtype=np.int32) + total * 0) < jnp.minimum(total, cap)
        sc1, sc2 = score_pe_rows(
            didx, cfg, r1, l1, r2, l2, rid, raw[:, 0], raw[:, 1], raw[:, 2],
            raw[:, 3], raw[:, 4], raw[:, 5], raw[:, 6], live,
        )
        cols = [raw[:, j] for j in range(7)] + [sc1, sc2]
        if rec_spec is not None:
            from rapmap_tpu.ops.wire import pack_rec_fields

            cols[0] = jnp.maximum(cols[0], 0)
            cols = list(pack_rec_fields(rec_spec, cols))
        recs = jnp.stack([c.astype(jnp.int32) for c in cols], axis=-1)
        return PERecords(recs, counts, total, ovf)
    if rec_spec is not None:
        from rapmap_tpu.ops.wire import pack_rec_fields

        # t = -1 on empty slots would wreck the unsigned packing; the rows
        # are dropped by `valid` anyway, so clamp them to 0 first
        fields[0] = jnp.maximum(fields[0], 0)
        fields = list(pack_rec_fields(rec_spec, fields))
    recs, counts, total, ovf = _compact(fields, valid, cap)
    return PERecords(recs, counts, total, ovf)
