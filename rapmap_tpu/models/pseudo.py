"""PseudoMapper — kallisto-style k-mer-only mapping engine (SEMANTICS.md §7).

RapMapMapper rebuild (SURVEY.md §3.5): no suffix array; each k-mer hit yields
its CSR occurrence list directly, with jump-ahead of k on hit. Reuses the
quasi engine's lookup machinery (canonical-class CHD probe when the index
carries one — ONE 2-gather probe answers both strands of a window — with the
prefix-LUT binary search as fallback), the dense-scan + next-anchor walk
pattern, and the global-pool collation via collate's expand_fn hook.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.format import PseudoIndex
from rapmap_tpu.index.kmer_table import build_prefix_lut
from rapmap_tpu.models.quasi import Counters
from rapmap_tpu.ops import encode as denc
from rapmap_tpu.ops.collate import MapOut, collate_batch
from rapmap_tpu.ops.gather import row_gather, row_gather_nd
from rapmap_tpu.ops.lookup import kmer_lookup
from rapmap_tpu.ops.mmp import ScanHits
from rapmap_tpu.ops.pairs import merge_pairs_batch


class DevicePseudoIndex(NamedTuple):
    kmer_rows: jnp.ndarray  # (K, 4) int32: [hi, lo, occ_b, occ_e]
    lut_rows: jnp.ndarray   # (4^p, 2)
    # [txp, pos] occurrence rows: (NOcc, 2) normally; in the big-occ layout
    # (st.occ_pairs) TWO occurrences per row, (ceil(NOcc/2), 4), so the row
    # index (occ_id >> 1) stays a valid int32 gather index up to 2^32 occs
    occ_rows: jnp.ndarray
    # per-strand CHD (2-gather probe); None = binary-search path
    chd_dir: jnp.ndarray | None = None   # int32 (2^m_bits,)
    chd_rows: jnp.ndarray | None = None  # int32 (2^t_bits, 4)


@dataclass(frozen=True)
class PseudoStatic:
    k: int
    prefix_bases: int
    lookup_steps: int
    use_chd: bool = False
    chd_seed: int = 0
    chd_m_bits: int = 0
    chd_t_bits: int = 0
    chd_p_bits: int = 0  # partitioned slot formula (ops.lookup.chd_slot)
    chd_canonical: bool = False  # pseudo tables are per-strand
    occ_pairs: bool = False  # big-occ (>= 2^31) layout: occ ids are uint32
    # bit patterns riding int32 arrays (wrap-safe arithmetic), occ_rows pairs


def _u32_i32(a: np.ndarray) -> np.ndarray:
    """Values in [0, 2^32) -> their uint32 bit pattern as int32 (the device
    does wrap-safe uint32 arithmetic on these; upstream bigSA analog for the
    pseudo CSR, covering texts past the 2^31 int32 ceiling)."""
    return (np.asarray(a, np.int64) & 0xFFFFFFFF).astype(np.uint32).view(np.int32)


def upload_pseudo_index(
    idx: PseudoIndex, force_pairs: bool = False
) -> tuple[DevicePseudoIndex, PseudoStatic]:
    n_occ = int(np.asarray(idx.kmer_off)[-1])
    if n_occ >= 2**32:
        raise ValueError(
            "pseudo index with >= 2^32 occurrences exceeds the single-device "
            "big-occ layout; shard the index (rapmap_tpu.parallel.sharded)"
        )
    occ_pairs = force_pairs or n_occ >= 2**31
    khi = np.asarray(idx.kmer_hi, dtype=np.uint32)
    klo = np.asarray(idx.kmer_lo, dtype=np.uint32)
    off = np.asarray(idx.kmer_off, dtype=np.int64)
    K = len(khi)
    p = max(4, min(idx.k, 12, math.ceil(math.log(max(K, 2), 4)) + 1))
    lut = build_prefix_lut(khi, klo, idx.k, p)
    lut_rows = np.stack([lut[:-1], lut[1:]], axis=1).astype(np.int32)
    max_bucket = int(np.max(np.diff(lut))) if len(lut) > 1 else 1
    steps = max(1, math.ceil(math.log2(max_bucket + 1)) + 1)
    kmer_rows = np.stack(
        [khi.view(np.int32), klo.view(np.int32),
         _u32_i32(off[:-1]), _u32_i32(off[1:])], axis=1,
    ) if K else np.zeros((1, 4), np.int32)
    if len(idx.occ_txp) == 0:
        occ_rows = np.zeros((1, 4 if occ_pairs else 2), np.int32)
    elif occ_pairs:
        ot = np.asarray(idx.occ_txp, np.int32)
        op = np.asarray(idx.occ_pos, np.int32)
        n2 = (len(ot) + 1) // 2
        occ_rows = np.zeros((n2, 4), np.int32)
        occ_rows[:, 0] = ot[0::2]
        occ_rows[:, 1] = op[0::2]
        occ_rows[: len(ot) // 2, 2] = ot[1::2]
        occ_rows[: len(ot) // 2, 3] = op[1::2]
    else:
        occ_rows = np.stack(
            [np.asarray(idx.occ_txp, np.int32), np.asarray(idx.occ_pos, np.int32)],
            axis=1,
        )
    chd = idx.meta.get("chd") if getattr(idx, "chd_dir", None) is not None else None
    canonical = bool(chd.get("canonical")) if chd else False
    chd_dir = chd_rows = None
    if chd is not None and canonical:
        # class rows [chi, clo, b_fwd, e_fwd, b_rc, e_rc] over CSR occ ranges
        # (mirrors the quasi canonical upload; an orientation absent from the
        # text gets b=e=0 -> empty -> not found)
        from rapmap_tpu.index.chd import key64_of, rc_key64_np

        perm = np.asarray(idx.chd_perm, dtype=np.int64)
        cls = np.asarray(idx.chd_cls, dtype=np.int64)  # (n_cls, 2)
        fwd_r, rc_r = cls[:, 0], cls[:, 1]
        key64 = key64_of(khi, klo)
        Kc = max(K - 1, 0)
        ck = np.where(
            fwd_r >= 0,
            key64[np.clip(fwd_r, 0, Kc)],
            rc_key64_np(key64[np.clip(rc_r, 0, Kc)], idx.k),
        )

        def iv(r):
            rcl = np.clip(r, 0, Kc)
            valid = r >= 0
            return (
                _u32_i32(np.where(valid, off[:-1][rcl], 0)),
                _u32_i32(np.where(valid, off[1:][rcl], 0)),
            )

        bf, ef = iv(fwd_r)
        br, er = iv(rc_r)
        cls_rows = np.stack(
            [
                (ck >> np.uint64(32)).astype(np.uint32).view(np.int32),
                (ck & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32),
                bf, ef, br, er,
            ],
            axis=1,
        )
        sentinel = np.array([-1, -1, 0, 0, 0, 0], dtype=np.int32)
        rows = np.where(
            (perm >= 0)[:, None],
            cls_rows[np.clip(perm, 0, len(cls_rows) - 1)],
            sentinel[None, :],
        ).astype(np.int32)
        chd_dir = jnp.asarray(np.asarray(idx.chd_dir, dtype=np.int32))
        chd_rows = jnp.asarray(rows)
    elif chd is not None:
        # legacy per-strand rows (pre-canonical pseudo indexes)
        perm = np.asarray(idx.chd_perm, dtype=np.int64)
        sentinel = np.array([-1, -1, 0, 0], dtype=np.int32)
        rows = np.where(
            (perm >= 0)[:, None],
            kmer_rows[np.clip(perm, 0, len(kmer_rows) - 1)],
            sentinel[None, :],
        ).astype(np.int32)
        chd_dir = jnp.asarray(np.asarray(idx.chd_dir, dtype=np.int32))
        chd_rows = jnp.asarray(rows)
    dev = DevicePseudoIndex(
        kmer_rows=jnp.asarray(kmer_rows),
        lut_rows=jnp.asarray(lut_rows),
        occ_rows=jnp.asarray(occ_rows),
        chd_dir=chd_dir,
        chd_rows=chd_rows,
    )
    return dev, PseudoStatic(
        k=idx.k, prefix_bases=p, lookup_steps=steps,
        use_chd=chd is not None,
        chd_seed=int(chd["seed"]) if chd else 0,
        chd_m_bits=int(chd["m_bits"]) if chd else 0,
        chd_t_bits=int(chd["t_bits"]) if chd else 0,
        chd_p_bits=int(chd.get("p_bits", 0)) if chd else 0,
        chd_canonical=canonical,
        occ_pairs=occ_pairs,
    )


def csr_expand_fn(didx: DevicePseudoIndex, st: PseudoStatic):
    """collate expand hook: occurrence id p, query pos q -> (txp, tpos).

    Big-occ layout (st.occ_pairs): p is a uint32 bit pattern riding int32
    (ids 2^31..2^32 appear negative); the logical shift recovers a valid
    int32 row index and the parity bit selects the row half. Covers the
    upstream bigSA regime for the pseudo path without int64 device arrays."""
    n_rows = didx.occ_rows.shape[0]
    if st.occ_pairs:
        def fn(p, q):
            pu = lax.bitcast_convert_type(p, jnp.uint32)
            r = (pu >> np.uint32(1)).astype(jnp.int32)
            meta = row_gather_nd(didx.occ_rows, jnp.clip(r, 0, n_rows - 1))
            odd = (pu & np.uint32(1)).astype(jnp.int32)
            t = jnp.where(odd == 1, meta[..., 2], meta[..., 0])
            pos = jnp.where(odd == 1, meta[..., 3], meta[..., 1])
            return t, pos - q

        return fn

    def fn(p, q):
        meta = row_gather_nd(didx.occ_rows, jnp.clip(p, 0, n_rows - 1))
        return meta[..., 0], meta[..., 1] - q

    return fn


def pseudo_scan_batch(
    didx: DevicePseudoIndex, st: PseudoStatic, reads: jnp.ndarray, lens: jnp.ndarray, cfg: MapConfig
) -> ScanHits:
    """k-mer walk with jump-ahead k on hit (SEMANTICS.md §7): dense lookup over
    all windows, then a next-anchor walk (misses cost zero iterations — the
    reference's +1-on-miss visits record nothing, so the anchor sets match)."""
    R, L = reads.shape
    k = st.k
    H = cfg.max_hits_per_strand
    S = L - k + 1

    key_hi, key_lo, kvalid = denc.kmer_keys_batch(reads, k)
    found, db, de = kmer_lookup(didx, st, key_hi, key_lo)
    in_len = (np.arange(S, dtype=np.int32)[None, :] + k) <= lens[:, None]
    anchor = found & kvalid & in_len & ((de - db) <= cfg.max_interval)
    s_or_big = jnp.where(anchor, np.arange(S, dtype=np.int32)[None, :], np.int32(S))
    next_anchor = jnp.flip(
        lax.associative_scan(jnp.minimum, jnp.flip(s_or_big, axis=1), axis=1), axis=1
    )

    def at(arr2d, pos, fill):
        v = row_gather(arr2d, jnp.clip(pos, 0, arr2d.shape[1] - 1)[:, None])[:, 0]
        return jnp.where(pos < arr2d.shape[1], v, fill)

    zRH = np.zeros((R, H), np.int32)
    hits0 = ScanHits(q=zRH, l=zRH, b=zRH, e=zRH, n=lens * 0, truncated=lens < 0)
    pos0 = at(next_anchor, lens * 0, np.int32(S))
    rows = np.arange(R, dtype=np.int32)

    def cond(state):
        pos, hits = state
        return jnp.any((pos < S) & ~hits.truncated)

    def body(state):
        pos, hits = state
        act = (pos < S) & ~hits.truncated
        posc = jnp.clip(pos, 0, S - 1)
        b = at(db, posc, np.int32(0))
        e = at(de, posc, np.int32(0))
        slot = jnp.clip(hits.n, 0, H - 1)
        overflow = act & (hits.n >= H)
        write = act & ~overflow

        def put(buf, val):
            old = buf[rows, slot]
            return buf.at[rows, slot].set(jnp.where(write, val, old))

        hits = ScanHits(
            q=put(hits.q, posc), l=put(hits.l, posc * 0 + k),
            b=put(hits.b, b), e=put(hits.e, e),
            n=hits.n + write.astype(jnp.int32),
            truncated=hits.truncated | overflow,
        )
        nxt = posc + k  # jump-ahead on hit
        pos_next = jnp.where(nxt >= S, np.int32(S), at(next_anchor, nxt, np.int32(S)))
        return jnp.where(act, pos_next, pos), hits

    _, hits = lax.while_loop(cond, body, (pos0, hits0))
    return hits


def pseudo_scan_batch_paired(
    didx: DevicePseudoIndex, st: PseudoStatic, reads: jnp.ndarray,
    lens: jnp.ndarray, cfg: MapConfig,
) -> ScanHits:
    """Both strands' jump-ahead-k walks from ONE canonical probe per fwd
    window (mirrors ops.mmp.scan_batch_paired without the extension phase):
    the rc lane's window at position p is the reverse complement of the fwd
    window at column lens-k-p, so its lookup is answered by the same class
    row. Rows [0, B) are fwd lanes, [B, 2B) rc. Requires st.chd_canonical."""
    from rapmap_tpu.ops.lookup import kmer_lookup_2str

    B, L = reads.shape
    k = st.k
    H = cfg.max_hits_per_strand
    S = L - k + 1
    R = 2 * B
    lens2 = jnp.concatenate([lens, lens])

    key_hi, key_lo, kvalid = denc.kmer_keys_batch(reads, k)
    ff, bf, ef, fr, br, er = kmer_lookup_2str(didx, st, key_hi, key_lo)
    in_len = (np.arange(S, dtype=np.int32)[None, :] + k) <= lens[:, None]
    ok = kvalid & in_len
    anch_f = ff & ok & ((ef - bf) <= cfg.max_interval)
    anch_rF = fr & ok & ((er - br) <= cfg.max_interval)  # rc anchors, fwd cols

    s_ix = np.arange(S, dtype=np.int32)[None, :]
    nf = jnp.where(anch_f, s_ix, np.int32(S))
    next_f = jnp.flip(
        lax.associative_scan(jnp.minimum, jnp.flip(nf, axis=1), axis=1), axis=1
    )
    pv = jnp.where(anch_rF, s_ix, np.int32(-1))
    prev_rF = lax.associative_scan(jnp.maximum, pv, axis=1)

    db2 = jnp.concatenate([bf, br], axis=0)   # (R, S) in fwd columns
    de2 = jnp.concatenate([ef, er], axis=0)
    anc2 = jnp.concatenate([next_f, prev_rF], axis=0)
    is_rc = np.arange(R, dtype=np.int32) >= B

    def at2(arr2d, col):
        return row_gather(arr2d, jnp.clip(col, 0, S - 1)[:, None])[:, 0]

    def next_anchor_pos(nxt):
        col = jnp.where(is_rc, lens2 - k - nxt, nxt)
        v = at2(anc2, col)
        fwd_next = jnp.where(nxt < S, v, np.int32(S))
        rc_next = jnp.where((col >= 0) & (v >= 0), lens2 - k - v, np.int32(S))
        return jnp.where(is_rc, rc_next, fwd_next)

    zRH = np.zeros((R, H), np.int32)
    hits0 = ScanHits(q=zRH, l=zRH, b=zRH, e=zRH, n=lens2 * 0, truncated=lens2 < 0)
    pos0 = next_anchor_pos(lens2 * 0)
    rows = np.arange(R, dtype=np.int32)

    def cond(state):
        pos, hits = state
        return jnp.any((pos < S) & ~hits.truncated)

    def body(state):
        pos, hits = state
        act = (pos < S) & ~hits.truncated
        posc = jnp.clip(pos, 0, S - 1)
        col = jnp.where(is_rc, lens2 - k - posc, posc)
        b = at2(db2, col)
        e = at2(de2, col)
        slot = jnp.clip(hits.n, 0, H - 1)
        overflow = act & (hits.n >= H)
        write = act & ~overflow

        def put(buf, val):
            old = buf[rows, slot]
            return buf.at[rows, slot].set(jnp.where(write, val, old))

        hits = ScanHits(
            q=put(hits.q, posc), l=put(hits.l, posc * 0 + k),
            b=put(hits.b, b), e=put(hits.e, e),
            n=hits.n + write.astype(jnp.int32),
            truncated=hits.truncated | overflow,
        )
        pos2 = next_anchor_pos(posc + k)  # jump-ahead on hit
        return jnp.where(act, pos2, pos), hits

    _, hits = lax.while_loop(cond, body, (pos0, hits0))
    return hits


def pseudo_scan_dispatch(didx, st, reads, lens, cfg) -> ScanHits:
    """Canonical paired scan when the index carries a canonical CHD, else the
    explicit [fwd; rc]-lane scan. Rows [0, B) fwd, [B, 2B) rc either way."""
    if getattr(st, "chd_canonical", False):
        return pseudo_scan_batch_paired(didx, st, reads, lens, cfg)
    lanes = jnp.concatenate([reads, denc.revcomp_batch(reads, lens)], axis=0)
    lens2 = jnp.concatenate([lens, lens])
    return pseudo_scan_batch(didx, st, lanes, lens2, cfg)


@partial(jax.jit, static_argnames=("st", "cfg"))
def pseudo_map_batch_se(
    didx: DevicePseudoIndex, st: PseudoStatic, reads, lens, n_valid, cfg: MapConfig
) -> tuple[MapOut, Counters]:
    hits = pseudo_scan_dispatch(didx, st, reads, lens, cfg)
    out = collate_batch(None, None, hits, lens, cfg, expand_fn=csr_expand_fn(didx, st))
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
def pseudo_map_batch_pe(
    didx: DevicePseudoIndex, st: PseudoStatic, r1, l1, r2, l2, n_valid, cfg: MapConfig
):
    o1, _ = pseudo_map_batch_se(didx, st, r1, l1, n_valid, cfg)
    o2, _ = pseudo_map_batch_se(didx, st, r2, l2, n_valid, cfg)
    pairs = merge_pairs_batch(o1, o2, cfg)
    B = r1.shape[0]
    real = np.arange(B, dtype=np.int32) < n_valid
    ctr = Counters(
        reads_total=n_valid.astype(jnp.int32),
        reads_mapped=jnp.sum(pairs.any_record & real, dtype=jnp.int32),
        too_ambiguous=jnp.sum(pairs.too_ambiguous & real, dtype=jnp.int32),
        over_budget=jnp.sum((o1.over_budget | o2.over_budget) & real, dtype=jnp.int32),
        records=jnp.sum(jnp.where(real[:, None], pairs.t != -1, False), dtype=jnp.int32),
        out_truncated=jnp.sum(
            (o1.out_truncated | o2.out_truncated | pairs.out_truncated) & real,
            dtype=jnp.int32,
        ),
    )
    return o1, o2, pairs, ctr


@partial(jax.jit, static_argnames=("st", "cfg", "cap", "B", "L"))
def pseudo_map_batch_se_wire(didx, st, wire_in, cfg: MapConfig, cap: int, B: int, L: int):
    from rapmap_tpu.ops.compact import compact_se
    from rapmap_tpu.ops.wire import encode_read_flags, pack_out, unpack_in_se

    reads, lens, n_valid = unpack_in_se(wire_in, B, L)
    out, ctr = pseudo_map_batch_se(didx, st, reads, lens, n_valid, cfg)
    flags = encode_read_flags(out.over_budget, out.out_truncated, out.too_ambiguous, out.mapped)
    return pack_out(compact_se(out, cap), ctr, flags)


@partial(jax.jit, static_argnames=("st", "cfg", "capc", "B", "L", "C"))
def pseudo_map_batch_se_wire_chunked(
    didx, st, wire_in, cfg: MapConfig, capc: int, B: int, L: int, C: int
):
    """Pseudo SE wire step as a lax.scan over (C)-read chunks, mirroring
    models.quasi.map_batch_se_wire_chunked: compile cost tracks C, huge
    batches amortize the per-dispatch tunnel cost. Uses the direct-compact
    collate with the CSR expand_fn (records stay 4-word: PseudoStatic has no
    field-bound stats for 2-word packing)."""
    from rapmap_tpu.models.quasi import _se_counters
    from rapmap_tpu.ops.collate import collate_records_se
    from rapmap_tpu.ops.wire import (
        HDR, encode_read_flags, pack_counts_flags, unpack_in_se,
    )

    assert B % C == 0, "batch must be a multiple of the chunk size"
    packed_cf = C % 8 == 0 and cfg.rec_slots * C < (1 << 16)
    reads, lens, n_valid = unpack_in_se(wire_in, B, L)
    nch = B // C
    r3 = reads.reshape(nch, C, L)
    l2 = lens.reshape(nch, C)

    def body(rows_done, xs):
        r, l = xs
        nv = jnp.clip(n_valid - rows_done, 0, C)
        hits = pseudo_scan_dispatch(didx, st, r, l, cfg)
        se, flags = collate_records_se(
            None, None, hits, l, cfg, capc, expand_fn=csr_expand_fn(didx, st)
        )
        ctr = _se_counters(flags, nv, C)
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
def pseudo_map_batch_pe_wire(didx, st, wire_in, cfg: MapConfig, cap: int, B: int, L: int):
    from rapmap_tpu.ops.compact import compact_pe
    from rapmap_tpu.ops.wire import encode_read_flags, pack_out, unpack_in_pe

    r1, l1, r2, l2, n_valid = unpack_in_pe(wire_in, B, L)
    o1, o2, pairs, ctr = pseudo_map_batch_pe(didx, st, r1, l1, r2, l2, n_valid, cfg)
    flags = encode_read_flags(
        o1.over_budget | o2.over_budget,
        o1.out_truncated | o2.out_truncated | pairs.out_truncated,
        pairs.too_ambiguous, pairs.any_record,
    )
    return pack_out(compact_pe(pairs, cap), ctr, flags)


class PseudoMapper:
    """Host-side driver for the pseudo path (same interface as QuasiMapper)."""

    def __init__(self, idx: PseudoIndex, cfg: MapConfig | None = None,
                 force_big_occ: bool = False):
        if cfg is None:
            cfg = MapConfig(k=idx.k)
        if cfg.k != idx.k:
            raise ValueError(f"config k={cfg.k} != index k={idx.k}")
        if cfg.expand_budget == 0:
            from dataclasses import replace

            from rapmap_tpu.config import auto_expand_budget

            cfg = replace(
                cfg,
                expand_budget=auto_expand_budget(np.diff(np.asarray(idx.kmer_off))),
            )
        self.cfg = cfg
        self.didx, self.st = upload_pseudo_index(idx, force_pairs=force_big_occ)
        self.host_index = idx  # oracle fallback for budget-degraded reads
        self.txp_names = idx.txp_names
        self.txp_lens = np.asarray(idx.txp_lens)

    def map_se(self, codes, lens, n_valid: int | None = None):
        out, ctr = pseudo_map_batch_se(
            self.didx, self.st, jnp.asarray(codes, jnp.int8), jnp.asarray(lens, jnp.int32),
            jnp.int32(n_valid if n_valid is not None else len(lens)), self.cfg,
        )
        return jax.tree.map(np.asarray, out), jax.tree.map(np.asarray, ctr)

    def map_pe(self, c1, l1, c2, l2, n_valid: int | None = None):
        res = pseudo_map_batch_pe(
            self.didx, self.st,
            jnp.asarray(c1, jnp.int8), jnp.asarray(l1, jnp.int32),
            jnp.asarray(c2, jnp.int8), jnp.asarray(l2, jnp.int32),
            jnp.int32(n_valid if n_valid is not None else len(l1)), self.cfg,
        )
        return tuple(jax.tree.map(np.asarray, x) for x in res)

    def _cap(self, B: int) -> int:
        return self.cfg.rec_slots * B

    def _chunk_of(self, B: int) -> int:
        C = self.cfg.chunk
        return C if (C and C < B and B % C == 0) else 0

    def map_se_async(self, codes, lens, n_valid: int | None = None):
        from rapmap_tpu.ops.wire import pack_in_se

        B, L = codes.shape
        nv = n_valid if n_valid is not None else B
        win = pack_in_se(np.asarray(codes), np.asarray(lens), nv)
        C = self._chunk_of(B)
        if C:
            capc = self._cap(C)
            fut = pseudo_map_batch_se_wire_chunked(
                self.didx, self.st, jnp.asarray(win), self.cfg, capc, B, L, C
            )
            return ("se", B, fut, C, capc)
        fut = pseudo_map_batch_se_wire(
            self.didx, self.st, jnp.asarray(win), self.cfg, self._cap(B), B, L
        )
        return ("se", B, fut, 0, 0)

    def map_pe_async(self, c1, l1, c2, l2, n_valid: int | None = None):
        from rapmap_tpu.ops.wire import pack_in_pe

        B, L = c1.shape
        nv = n_valid if n_valid is not None else B
        win = pack_in_pe(np.asarray(c1), np.asarray(l1), np.asarray(c2), np.asarray(l2), nv)
        fut = pseudo_map_batch_pe_wire(
            self.didx, self.st, jnp.asarray(win), self.cfg, self._cap(B), B, L
        )
        return ("pe", B, fut, 0, 0)

    def fetch(self, result):
        from rapmap_tpu.ops.wire import unpack_out

        kind, B, fut, C, capc = result
        packed_cf = bool(C) and C % 8 == 0 and self.cfg.rec_slots * C < (1 << 16)
        return unpack_out(
            np.asarray(fut), B, 4 if kind == "se" else 7, chunk=C, capc=capc,
            packed_cf=packed_cf,
        )
