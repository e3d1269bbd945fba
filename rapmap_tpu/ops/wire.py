"""Single-buffer wire format for host<->device transfers.

The axon TPU tunnel charges a multi-second round trip PER BUFFER on fetch
(measured: 9-buffer fetch 36.9 s vs 1-buffer 93 ms for the same bytes), and
real deployments also prefer one contiguous DMA. All production paths
therefore ship one uint8 buffer in and one int32 buffer out.

wire_in  (uint8): codes1 [B*L] | (codes2 [B*L] if PE) | lens1 int32 LE [4B]
                  | (lens2 [4B]) | n_valid int32 [4]
wire_out (int32): [0] total records | [1] overflowed | [2:8] counters
                  (reads_total, reads_mapped, too_ambiguous, over_budget,
                  records, out_truncated) | [8:8+B] per-read record counts
                  | [8+B:8+2B] per-read outcome flag bits (FLAG_*)
                  | [8+2B:] records row-major, F fields each.

The per-read flags let the host apply a targeted oracle remap to exactly the
reads whose device results were degraded by a static budget (over_budget /
out_truncated) — see models.fallback.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np
from jax import lax

HDR = 8

FLAG_OVER_BUDGET = 1
FLAG_OUT_TRUNCATED = 2
FLAG_TOO_AMBIGUOUS = 4
FLAG_MAPPED = 8
FLAG_DEGRADED = FLAG_OVER_BUDGET | FLAG_OUT_TRUNCATED  # host fallback trigger


def encode_read_flags(over_budget, out_truncated, too_ambiguous, mapped) -> jnp.ndarray:
    """(B,) bool each -> (B,) int32 flag bits (see FLAG_* constants)."""
    return (
        over_budget.astype(jnp.int32)
        | (out_truncated.astype(jnp.int32) << 1)
        | (too_ambiguous.astype(jnp.int32) << 2)
        | (mapped.astype(jnp.int32) << 3)
    )


def pack_in_se(codes: np.ndarray, lens: np.ndarray, n_valid: int) -> np.ndarray:
    B, L = codes.shape
    return np.concatenate([
        codes.astype(np.int8).view(np.uint8).reshape(-1),
        np.ascontiguousarray(lens, dtype=np.int32).view(np.uint8),
        np.array([n_valid], dtype=np.int32).view(np.uint8),
    ])


def unpack_in_se(wire: jnp.ndarray, B: int, L: int):
    codes = lax.bitcast_convert_type(wire[: B * L], jnp.int8).reshape(B, L)
    lens = lax.bitcast_convert_type(wire[B * L : B * L + 4 * B].reshape(B, 4), jnp.int32)
    n_valid = lax.bitcast_convert_type(wire[B * L + 4 * B : B * L + 4 * B + 4].reshape(1, 4), jnp.int32)[0]
    return codes, lens, n_valid


def pack_in_pe(c1, l1, c2, l2, n_valid: int) -> np.ndarray:
    B, L = c1.shape
    return np.concatenate([
        c1.astype(np.int8).view(np.uint8).reshape(-1),
        c2.astype(np.int8).view(np.uint8).reshape(-1),
        np.ascontiguousarray(l1, dtype=np.int32).view(np.uint8),
        np.ascontiguousarray(l2, dtype=np.int32).view(np.uint8),
        np.array([n_valid], dtype=np.int32).view(np.uint8),
    ])


def unpack_in_pe(wire: jnp.ndarray, B: int, L: int):
    o = 0
    c1 = lax.bitcast_convert_type(wire[o : o + B * L], jnp.int8).reshape(B, L); o += B * L
    c2 = lax.bitcast_convert_type(wire[o : o + B * L], jnp.int8).reshape(B, L); o += B * L
    l1 = lax.bitcast_convert_type(wire[o : o + 4 * B].reshape(B, 4), jnp.int32); o += 4 * B
    l2 = lax.bitcast_convert_type(wire[o : o + 4 * B].reshape(B, 4), jnp.int32); o += 4 * B
    nv = lax.bitcast_convert_type(wire[o : o + 4].reshape(1, 4), jnp.int32)[0]
    return c1, l1, c2, l2, nv


def pack_out(recsd, ctr, flags: jnp.ndarray) -> jnp.ndarray:
    """SERecords/PERecords + Counters + per-read flags -> one int32 vector."""
    hdr = jnp.stack([
        recsd.total,
        recsd.overflowed.astype(jnp.int32),
        ctr.reads_total, ctr.reads_mapped, ctr.too_ambiguous,
        ctr.over_budget, ctr.records, ctr.out_truncated,
    ])
    return jnp.concatenate([hdr, recsd.counts, flags, recsd.recs.reshape(-1)])


class WireResult(NamedTuple):
    recs: np.ndarray     # (n_records, F)
    counts: np.ndarray   # (B,)
    flags: np.ndarray    # (B,) int32 FLAG_* bits
    total: int
    overflowed: bool
    counters: dict


def unpack_out(wire: np.ndarray, B: int, fields: int, chunk: int = 0, capc: int = 0) -> WireResult:
    """chunk/capc > 0: the record area holds one (capc, fields) block per
    chunk (chunked wire step); re-densify by concatenating each chunk's
    written prefix (per-read counts are already clamped per chunk)."""
    hdr = wire[:HDR]
    counts = wire[HDR : HDR + B]
    flags = wire[HDR + B : HDR + 2 * B]
    total = int(hdr[0])
    if chunk:
        nch = B // chunk
        blocks = wire[HDR + 2 * B :].reshape(nch, capc, fields)
        tc = counts.reshape(nch, chunk).sum(axis=1)
        recs = np.concatenate([blocks[c, : tc[c]] for c in range(nch)], axis=0)
    else:
        recs = wire[HDR + 2 * B :].reshape(-1, fields)
        recs = recs[: min(total, recs.shape[0])]
    return WireResult(
        recs=recs,
        counts=counts,
        flags=flags,
        total=total,
        overflowed=bool(hdr[1]),
        counters=dict(
            reads_total=int(hdr[2]), reads_mapped=int(hdr[3]),
            too_ambiguous=int(hdr[4]), over_budget=int(hdr[5]), records=int(hdr[6]),
            out_truncated=int(hdr[7]),
        ),
    )
