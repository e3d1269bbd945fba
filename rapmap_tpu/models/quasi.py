"""QuasiMapper — the flagship end-to-end device mapping engine.

Assembles the jitted pipeline (RapMapSAMapper rebuild, SURVEY.md §3.2):
  reads -> rc lanes -> MMP scan (ops.mmp) -> collation (ops.collate)
and exposes single-end and paired-end batch mapping plus psum-able counters.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.format import QuasiIndex
from rapmap_tpu.ops.collate import MapOut, collate_batch
from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic, upload_index
from rapmap_tpu.ops.mmp import scan_dispatch
from rapmap_tpu.ops.pairs import PairOut, merge_pairs_batch


class Counters(NamedTuple):
    """HitCounters equivalent (SURVEY.md §5.5); int32 scalars, psum-able."""

    reads_total: jnp.ndarray
    reads_mapped: jnp.ndarray
    too_ambiguous: jnp.ndarray
    over_budget: jnp.ndarray
    records: jnp.ndarray
    out_truncated: jnp.ndarray  # reads whose records exceeded cfg.out_slots


@partial(jax.jit, static_argnames=("st", "cfg"))
def map_batch_se(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    reads: jnp.ndarray,   # (B, L) int8
    lens: jnp.ndarray,    # (B,) int32
    n_valid: jnp.ndarray,  # scalar int32: non-pad rows
    cfg: MapConfig,
) -> tuple[MapOut, Counters]:
    hits = scan_dispatch(didx, st, reads, lens, cfg)
    out = collate_batch(didx, st, hits, lens, cfg)
    B = reads.shape[0]
    real = np.arange(B, dtype=np.int32) < n_valid
    ctr = Counters(
        reads_total=n_valid.astype(jnp.int32),
        reads_mapped=jnp.sum(out.mapped & real, dtype=jnp.int32),
        too_ambiguous=jnp.sum(out.too_ambiguous & real, dtype=jnp.int32),
        over_budget=jnp.sum(out.over_budget & real, dtype=jnp.int32),
        records=jnp.sum(jnp.where(real[:, None], out.t != -1, False), dtype=jnp.int32),
        out_truncated=jnp.sum(out.out_truncated & real, dtype=jnp.int32),
    )
    return out, ctr


@partial(jax.jit, static_argnames=("st", "cfg"))
def map_batch_pe(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    reads1: jnp.ndarray,
    lens1: jnp.ndarray,
    reads2: jnp.ndarray,
    lens2: jnp.ndarray,
    n_valid: jnp.ndarray,
    cfg: MapConfig,
) -> tuple[MapOut, MapOut, PairOut, Counters]:
    out1, _ = map_batch_se(didx, st, reads1, lens1, n_valid, cfg)
    out2, _ = map_batch_se(didx, st, reads2, lens2, n_valid, cfg)
    pairs = merge_pairs_batch(out1, out2, cfg)
    B = reads1.shape[0]
    real = np.arange(B, dtype=np.int32) < n_valid
    ctr = Counters(
        reads_total=n_valid.astype(jnp.int32),
        reads_mapped=jnp.sum(pairs.any_record & real, dtype=jnp.int32),
        too_ambiguous=jnp.sum(pairs.too_ambiguous & real, dtype=jnp.int32),
        over_budget=jnp.sum((out1.over_budget | out2.over_budget) & real, dtype=jnp.int32),
        records=jnp.sum(jnp.where(real[:, None], pairs.t != -1, False), dtype=jnp.int32),
        out_truncated=jnp.sum(
            (out1.out_truncated | out2.out_truncated | pairs.out_truncated) & real,
            dtype=jnp.int32,
        ),
    )
    return out1, out2, pairs, ctr


@partial(jax.jit, static_argnames=("st", "cfg", "cap", "B", "L"))
def map_batch_se_wire(didx, st, wire_in, cfg: MapConfig, cap: int, B: int, L: int):
    """Single-buffer in/out SE mapping step (ops.wire format)."""
    from rapmap_tpu.ops.compact import compact_se
    from rapmap_tpu.ops.wire import encode_read_flags, pack_out, unpack_in_se

    reads, lens, n_valid = unpack_in_se(wire_in, B, L)
    out, ctr = map_batch_se(didx, st, reads, lens, n_valid, cfg)
    flags = encode_read_flags(out.over_budget, out.out_truncated, out.too_ambiguous, out.mapped)
    se = compact_se(out, cap)
    if cfg.mapping_score:
        from rapmap_tpu.ops.align import score_records
        from rapmap_tpu.ops.compact import rid_from_counts

        rid = rid_from_counts(se.counts, cap)
        live = (np.arange(cap, dtype=np.int32) + se.total * 0) < jnp.minimum(
            se.total, cap
        )
        sc = score_records(
            didx, cfg, reads, lens, rid, se.recs[:, 0], se.recs[:, 1],
            se.recs[:, 2], live,
        )
        se = se._replace(recs=se.recs.at[:, 3].set(sc))
    return pack_out(se, ctr, flags)


def _se_counters(flags, n_valid, C):
    real = np.arange(C, dtype=np.int32) < n_valid
    return Counters(
        reads_total=n_valid.astype(jnp.int32),
        reads_mapped=jnp.sum(flags.mapped & real, dtype=jnp.int32),
        too_ambiguous=jnp.sum(flags.too_ambiguous & real, dtype=jnp.int32),
        over_budget=jnp.sum(flags.over_budget & real, dtype=jnp.int32),
        records=jnp.sum(
            jnp.where(real & ~flags.too_ambiguous, flags.n_mappings, 0),
            dtype=jnp.int32,
        ),
        out_truncated=jnp.sum(flags.out_truncated & real, dtype=jnp.int32),
    )


@partial(jax.jit, static_argnames=("st", "cfg", "capc", "B", "L", "C"))
def map_batch_se_wire_chunked(
    didx, st, wire_in, cfg: MapConfig, capc: int, B: int, L: int, C: int
):
    """SE wire step as a lax.scan over fixed (C)-read chunks.

    The compiled program's size depends on C, not B, so compile time stays
    flat while B grows to amortize per-dispatch tunnel overhead. Each chunk
    compacts its records into its own (capc)-row range of the output buffer
    (ops.wire.unpack_out re-densifies on the host). Uses the direct-compact
    collate (no (B, MAX_OUT) intermediate)."""
    from rapmap_tpu.ops.collate import collate_records_se
    from rapmap_tpu.ops.wire import HDR, unpack_in_se

    from rapmap_tpu.ops.wire import pack_counts_flags, rec_spec_se

    assert B % C == 0, "batch must be a multiple of the chunk size"
    spec = rec_spec_se(st, cfg)
    packed_cf = C % 8 == 0 and cfg.rec_slots * C < (1 << 16)
    reads, lens, n_valid = unpack_in_se(wire_in, B, L)
    nch = B // C
    r3 = reads.reshape(nch, C, L)
    l2 = lens.reshape(nch, C)

    def body(rows_done, xs):
        r, l = xs
        nv = jnp.clip(n_valid - rows_done, 0, C)
        hits = scan_dispatch(didx, st, r, l, cfg)
        se, flags = collate_records_se(
            didx, st, hits, l, cfg, capc, rec_spec=spec, reads=r
        )
        ctr = _se_counters(flags, nv, C)
        from rapmap_tpu.ops.wire import encode_read_flags

        fbits = encode_read_flags(
            flags.over_budget, flags.out_truncated, flags.too_ambiguous, flags.mapped
        )
        hdr = jnp.stack([
            se.total, se.overflowed.astype(jnp.int32),
            ctr.reads_total, ctr.reads_mapped, ctr.too_ambiguous,
            ctr.over_budget, ctr.records, ctr.out_truncated,
        ])
        if packed_cf:
            cw, fw = pack_counts_flags(se.counts, fbits)
            wout = jnp.concatenate([hdr, cw, fw, se.recs.reshape(-1)])
        else:
            wout = jnp.concatenate([hdr, se.counts, fbits, se.recs.reshape(-1)])
        return rows_done + C, wout

    _, outs = lax.scan(body, n_valid * 0, (r3, l2))
    hdrs = outs[:, :HDR]
    hdr = hdrs.sum(axis=0).at[1].set(hdrs[:, 1].max())
    return jnp.concatenate([hdr, outs[:, HDR:].reshape(-1)])


@partial(jax.jit, static_argnames=("st", "cfg", "cap", "B", "L"))
def map_batch_pe_wire(didx, st, wire_in, cfg: MapConfig, cap: int, B: int, L: int):
    from rapmap_tpu.ops.compact import compact_pe
    from rapmap_tpu.ops.wire import encode_read_flags, pack_out, unpack_in_pe

    r1, l1, r2, l2, n_valid = unpack_in_pe(wire_in, B, L)
    out1, out2, pairs, ctr = map_batch_pe(didx, st, r1, l1, r2, l2, n_valid, cfg)
    flags = encode_read_flags(
        out1.over_budget | out2.over_budget,
        out1.out_truncated | out2.out_truncated | pairs.out_truncated,
        pairs.too_ambiguous, pairs.any_record,
    )
    sargs = (didx, cfg, r1, l1, r2, l2) if cfg.mapping_score else None
    return pack_out(compact_pe(pairs, cap, score_args=sargs), ctr, flags)


@partial(jax.jit, static_argnames=("st", "cfg", "capc", "B", "L", "C"))
def map_batch_pe_wire_chunked(
    didx, st, wire_in, cfg: MapConfig, capc: int, B: int, L: int, C: int
):
    """PE wire step chunked like map_batch_se_wire_chunked (the pair merge
    still goes through the slotted (C, MAX_OUT) MapOut layout per mate)."""
    from rapmap_tpu.ops.compact import compact_pe
    from rapmap_tpu.ops.pairs import collate_records_pe, pe_direct_eligible
    from rapmap_tpu.ops.wire import (
        HDR, encode_read_flags, pack_counts_flags, rec_spec_pe, unpack_in_pe,
    )

    assert B % C == 0, "batch must be a multiple of the chunk size"
    spec = rec_spec_pe(st, cfg)
    packed_cf = C % 8 == 0 and cfg.rec_slots * C < (1 << 16)
    direct = pe_direct_eligible(st, cfg, C)
    r1, l1, r2, l2, n_valid = unpack_in_pe(wire_in, B, L)
    nch = B // C
    xs = (
        r1.reshape(nch, C, L), l1.reshape(nch, C),
        r2.reshape(nch, C, L), l2.reshape(nch, C),
    )

    def body(rows_done, xs):
        a, la, b, lb = xs
        nv = jnp.clip(n_valid - rows_done, 0, C)
        if direct:
            hits1 = scan_dispatch(didx, st, a, la, cfg)
            hits2 = scan_dispatch(didx, st, b, lb, cfg)
            pe, fl, _ = collate_records_pe(
                didx, st, hits1, la, hits2, lb, cfg, capc, rec_spec=spec,
                reads1=a, reads2=b,
            )
            real = np.arange(C, dtype=np.int32) < nv
            ctr = Counters(
                reads_total=nv.astype(jnp.int32),
                reads_mapped=jnp.sum(fl.mapped & real, dtype=jnp.int32),
                too_ambiguous=jnp.sum(fl.too_ambiguous & real, dtype=jnp.int32),
                over_budget=jnp.sum(fl.over_budget & real, dtype=jnp.int32),
                records=jnp.sum(
                    jnp.where(real & ~fl.too_ambiguous, fl.n_mappings, 0),
                    dtype=jnp.int32,
                ),
                out_truncated=jnp.sum(fl.out_truncated & real, dtype=jnp.int32),
            )
            fbits = encode_read_flags(
                fl.over_budget, fl.out_truncated, fl.too_ambiguous, fl.mapped
            )
        else:
            out1, out2, pairs, ctr = map_batch_pe(didx, st, a, la, b, lb, nv, cfg)
            sargs = (didx, cfg, a, la, b, lb) if cfg.mapping_score else None
            pe = compact_pe(pairs, capc, rec_spec=spec, score_args=sargs)
            fbits = encode_read_flags(
                out1.over_budget | out2.over_budget,
                out1.out_truncated | out2.out_truncated | pairs.out_truncated,
                pairs.too_ambiguous, pairs.any_record,
            )
        hdr = jnp.stack([
            pe.total, pe.overflowed.astype(jnp.int32),
            ctr.reads_total, ctr.reads_mapped, ctr.too_ambiguous,
            ctr.over_budget, ctr.records, ctr.out_truncated,
        ])
        if packed_cf:
            cw, fw = pack_counts_flags(pe.counts, fbits)
            wout = jnp.concatenate([hdr, cw, fw, pe.recs.reshape(-1)])
        else:
            wout = jnp.concatenate([hdr, pe.counts, fbits, pe.recs.reshape(-1)])
        return rows_done + C, wout

    _, outs = lax.scan(body, n_valid * 0, xs)
    hdrs = outs[:, :HDR]
    hdr = hdrs.sum(axis=0).at[1].set(hdrs[:, 1].max())
    return jnp.concatenate([hdr, outs[:, HDR:].reshape(-1)])


class QuasiMapper:
    """Host-side driver owning the device index and jit caches."""

    def __init__(self, idx: QuasiIndex, cfg: MapConfig | None = None):
        if cfg is None:
            cfg = MapConfig(k=idx.k)
        if cfg.k != idx.k:
            raise ValueError(f"config k={cfg.k} != index k={idx.k}")
        if cfg.expand_budget == 0:
            from dataclasses import replace

            from rapmap_tpu.config import auto_expand_budget, sampled_width

            widths = np.asarray(idx.kmer_e) - np.asarray(idx.kmer_b)
            cfg = replace(
                cfg,
                expand_budget=auto_expand_budget(widths),
                # wide-interval (repetitive) indexes expand pairwise: one
                # 16 B sa_meta gather resolves two adjacent SA positions
                expand_pairs=cfg.expand_pairs or sampled_width(widths) >= 2.0,
            )
        self.cfg = cfg
        # lean upload drops the arrays the CHD + packed-extension hot path
        # never gathers (~halves HBM; required for human-scale indexes)
        lean = cfg.packed_extension and getattr(idx, "chd_dir", None) is not None
        self.didx, self.st = upload_index(idx, lean=lean, meta_pairs=cfg.expand_pairs)
        self.host_index = idx  # oracle fallback for budget-degraded reads
        self.txp_names = idx.txp_names
        self.txp_lens = np.asarray(idx.txp_lens)

    def map_se(self, codes: np.ndarray, lens: np.ndarray, n_valid: int | None = None):
        out, ctr = map_batch_se(
            self.didx, self.st,
            jnp.asarray(codes, jnp.int8), jnp.asarray(lens, jnp.int32),
            jnp.int32(n_valid if n_valid is not None else len(lens)), self.cfg,
        )
        return jax.tree.map(np.asarray, out), jax.tree.map(np.asarray, ctr)

    def map_pe(self, codes1, lens1, codes2, lens2, n_valid: int | None = None):
        o1, o2, pairs, ctr = map_batch_pe(
            self.didx, self.st,
            jnp.asarray(codes1, jnp.int8), jnp.asarray(lens1, jnp.int32),
            jnp.asarray(codes2, jnp.int8), jnp.asarray(lens2, jnp.int32),
            jnp.int32(n_valid if n_valid is not None else len(lens1)), self.cfg,
        )
        return tuple(jax.tree.map(np.asarray, x) for x in (o1, o2, pairs, ctr))

    # ---- async record-compacted paths (production pipeline) -----------------
    # map_*_async returns device futures; pair with fetch() one batch later to
    # overlap the next batch's compute with this batch's device->host pull.

    def _cap(self, B: int) -> int:
        return self.cfg.rec_slots * B

    def _chunk_of(self, B: int) -> int:
        C = self.cfg.chunk
        return C if (C and C < B and B % C == 0) else 0

    def map_se_async(self, codes, lens, n_valid: int | None = None):
        from rapmap_tpu.ops.wire import pack_in_se, rec_spec_se

        B, L = codes.shape
        nv = n_valid if n_valid is not None else B
        win = pack_in_se(np.asarray(codes), np.asarray(lens), nv)
        C = self._chunk_of(B)
        if C:
            capc = self._cap(C)
            fut = map_batch_se_wire_chunked(
                self.didx, self.st, jnp.asarray(win), self.cfg, capc, B, L, C
            )
            return ("se", B, fut, C, capc, rec_spec_se(self.st, self.cfg))
        fut = map_batch_se_wire(
            self.didx, self.st, jnp.asarray(win), self.cfg, self._cap(B), B, L
        )
        return ("se", B, fut, 0, 0, None)

    def map_pe_async(self, c1, l1, c2, l2, n_valid: int | None = None):
        from rapmap_tpu.ops.wire import pack_in_pe, rec_spec_pe

        B, L = c1.shape
        nv = n_valid if n_valid is not None else B
        win = pack_in_pe(np.asarray(c1), np.asarray(l1), np.asarray(c2), np.asarray(l2), nv)
        C = self._chunk_of(B)
        if C:
            capc = self._cap(C)
            fut = map_batch_pe_wire_chunked(
                self.didx, self.st, jnp.asarray(win), self.cfg, capc, B, L, C
            )
            return ("pe", B, fut, C, capc, rec_spec_pe(self.st, self.cfg))
        fut = map_batch_pe_wire(
            self.didx, self.st, jnp.asarray(win), self.cfg, self._cap(B), B, L
        )
        return ("pe", B, fut, 0, 0, None)

    def fetch(self, result):
        """-> (WireResult, counters dict). recs fields: SE (t,pos,strand,score);
        PE (t,p1,s1,has1,p2,s2,has2)."""
        from rapmap_tpu.ops.wire import unpack_out

        kind, B, fut, C, capc, spec = result
        wire = np.asarray(fut)
        packed_cf = bool(C) and C % 8 == 0 and self.cfg.rec_slots * C < (1 << 16)
        pe_w = 9 if self.cfg.mapping_score else 7  # per-mate AS fields 7-8
        return unpack_out(
            wire, B, 4 if kind == "se" else pe_w, chunk=C, capc=capc,
            rec_spec=spec, packed_cf=packed_cf,
        )
