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

from rapmap_tpu.ops.collate import MapOut
from rapmap_tpu.ops.pairs import PairOut


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


def compact_pe(po: PairOut, cap: int, rec_spec=None) -> PERecords:
    valid = po.t != -1
    fields = [po.t, po.p1, po.s1, po.has1.astype(jnp.int32), po.p2, po.s2,
              po.has2.astype(jnp.int32)]
    if rec_spec is not None:
        from rapmap_tpu.ops.wire import pack_rec_fields

        # t = -1 on empty slots would wreck the unsigned packing; the rows
        # are dropped by `valid` anyway, so clamp them to 0 first
        fields[0] = jnp.maximum(fields[0], 0)
        fields = list(pack_rec_fields(rec_spec, fields))
    recs, counts, total, ovf = _compact(fields, valid, cap)
    return PERecords(recs, counts, total, ovf)
