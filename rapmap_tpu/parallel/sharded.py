"""SA-sharded index across a 2-D ("data", "idx") mesh (BASELINE config 5).

Implements docs/DESIGN_SA_SHARDING.md: the suffix array is cut at
prefix-bucket boundaries, so every k-mer's SA interval (and anything extension
narrows it to) lives wholly inside one shard. Reads shard over "data" and
replicate over "idx"; each idx-shard answers lookups/extensions for its k-mer
range; per-anchor results and expansion candidates union across "idx" with
psum (each anchor/slot is non-zero on exactly one shard).

The serial NIP walk couples anchors to earlier anchors' MMP lengths, which
would need a cross-shard exchange per step; instead every anchor extends
anchor-parallel per shard, mlen's psum-union, and a gather-free per-lane walk
reconstructs the NIP-visited subset — exact SEMANTICS.md §3 results.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, replace
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.format import QuasiIndex
from rapmap_tpu.models.quasi import Counters
from rapmap_tpu.ops import encode as denc
from rapmap_tpu.ops.collate import collate_batch
from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic
from rapmap_tpu.ops.extend_packed import extend_packed, pack_reads
from rapmap_tpu.ops.gather import row_gather, row_gather_nd
from rapmap_tpu.ops.lookup import kmer_lookup
from rapmap_tpu.ops.mmp import ScanHits


class ShardedIndexArrays(NamedTuple):
    """Stacked per-shard arrays; leading axis = idx shard (padded equal sizes)."""

    text2q: jnp.ndarray    # (P, nw, 4) — replicated content
    sa_cmp: jnp.ndarray    # (P, S_pad, 3+F) — device_index.sa_cmp_rows layout
    sa_meta: jnp.ndarray   # (P, S_pad, 2)
    kmer_rows: jnp.ndarray # (P, K_pad, 4) — b/e rebased to shard-local slots
    lut_rows: jnp.ndarray  # (P, 4^p, 2) — rows outside shard range are empty
    slot_base: jnp.ndarray # (P, 2) int32 [global slot offset, true slot count]
    # (true count matters: shards are padded to S_pad, and ownership tests must
    # use the real count or a short shard also claims the next shard's slots)
    # Per-shard CHD perfect hash (docs/DESIGN_SA_SHARDING.md round-3 upgrade):
    # common (m_bits, t_bits, seed) geometry across shards so the stacks stay
    # rectangular and the probe statics shard-invariant; None = binary search.
    # Two variants (st.chd_canonical selects):
    #   per-strand: chd_rows (P, 2^t, 4) [hi, lo, b_loc, e_loc] — rows live
    #     with their owning SA shard, intervals shard-LOCAL;
    #   canonical-class: chd_rows (P, 2^t, 6) [chi, clo, bf, ef, br, er] —
    #     classes sharded by CLASS space (not SA cuts: a class's fwd/rc k-mers
    #     live on different SA shards), intervals GLOBAL, one probe answers
    #     both strands of a window. int64 rows in the slot64 regime.
    chd_dir: jnp.ndarray | None = None   # (P, 2^m_bits) int32
    chd_rows: jnp.ndarray | None = None  # (P, 2^t_bits, 4|6)
    # (P, n_txps, 3) replicated ops.align.make_txp_align rows: text2q is
    # replicated too, so the mapping-score band DP runs shard-locally (no
    # psum; every idx shard computes identical scores)
    txp_align: jnp.ndarray | None = None


def _build_shard_chds(khi_u32, klo_u32, row_cuts, seed0: int):
    """Common-geometry CHD per shard (docs/DESIGN_SA_SHARDING.md round-3).

    One CHD per shard over that shard's k-mer subset, with (m_bits, t_bits)
    sized for the largest shard and ONE seed retried until the displacement
    search succeeds on every shard (failures are independent and rare).
    Returns (dirs (P, 2^m), perms (P, 2^t), seed, m_bits, t_bits) or None
    when the native library is unavailable / placement keeps failing.
    """
    try:
        from rapmap_tpu.native import bindings as nat

        if not nat.available():
            return None
    except Exception:  # pragma: no cover - import/runtime issues
        return None
    from rapmap_tpu.index.chd import MAXD, chd_params

    P_ = len(row_cuts) - 1
    n_max = max(row_cuts[i + 1] - row_cuts[i] for i in range(P_))
    if n_max == 0:
        return None
    m_bits, t_bits, p_bits = chd_params(n_max)
    for attempt in range(16):
        seed = (seed0 + attempt * 1000003) & 0xFFFFFFFF
        dirs, perms, ok = [], [], True
        for p in range(P_):
            r0, r1 = row_cuts[p], row_cuts[p + 1]
            if r1 == r0:  # empty shard: every probe lands on a sentinel row
                dirs.append(np.zeros(1 << m_bits, np.int32))
                perms.append(np.full(1 << t_bits, -1, np.int32))
                continue
            res = nat.chd_build(
                khi_u32[r0:r1], klo_u32[r0:r1], m_bits, t_bits, seed, MAXD, p_bits
            )
            if res is None:
                ok = False
                break
            dirs.append(res[0])
            perms.append(res[1])
        if ok:
            return np.stack(dirs), np.stack(perms), seed, m_bits, t_bits, p_bits
    return None


def _build_class_shard_chds(idx: QuasiIndex, n_shards: int, seed0: int, slot_dt):
    """Canonical-class CHD per shard, sharded by CLASS space (docs/
    DESIGN_SA_SHARDING.md): shard i owns the classes in its contiguous slice
    of the class-key-sorted idx.chd_cls. Rows carry GLOBAL [bf, ef, br, er]
    intervals (slot_dt), so the probe's psum-union feeds the walk directly —
    no rebasing, and extension ownership stays a pure interval test.

    Returns (dirs (P, 2^m) int32, rows (P, 2^t, 6) slot_dt, seed, m_bits,
    t_bits) or None (no class section / native lib / placement failure)."""
    if getattr(idx, "chd_cls", None) is None:
        return None
    try:
        from rapmap_tpu.native import bindings as nat

        if not nat.available():
            return None
    except Exception:  # pragma: no cover - import/runtime issues
        return None
    from rapmap_tpu.index.chd import MAXD, chd_params, key64_of, rc_key64_np

    cls = np.asarray(idx.chd_cls, dtype=np.int64)  # (n_cls, 2) [fwd_row, rc_row]
    n_cls = len(cls)
    if n_cls == 0:
        return None
    kb = np.asarray(idx.kmer_b, dtype=np.int64)
    ke = np.asarray(idx.kmer_e, dtype=np.int64)
    key64 = key64_of(idx.kmer_hi, idx.kmer_lo)
    fwd_r, rc_r = cls[:, 0], cls[:, 1]
    ck = np.where(
        fwd_r >= 0,
        key64[np.clip(fwd_r, 0, None)],
        rc_key64_np(key64[np.clip(rc_r, 0, None)], idx.k),
    )
    chi = (ck >> np.uint64(32)).astype(np.uint32)
    clo = (ck & np.uint64(0xFFFFFFFF)).astype(np.uint32)

    def iv(rowsel):
        ok = rowsel >= 0
        r = np.clip(rowsel, 0, None)
        return np.where(ok, kb[r], 0), np.where(ok, ke[r], 0)

    bf, ef = iv(fwd_r)
    br, er = iv(rc_r)
    P_ = n_shards
    cuts = [round(i * n_cls / P_) for i in range(P_ + 1)]
    n_max = max(cuts[i + 1] - cuts[i] for i in range(P_))
    if n_max == 0:
        return None
    m_bits, t_bits, p_bits = chd_params(n_max)
    for attempt in range(16):
        seed = (seed0 + attempt * 1000003) & 0xFFFFFFFF
        dirs, rows, ok = [], [], True
        for p in range(P_):
            c0, c1 = cuts[p], cuts[p + 1]
            if c1 == c0:
                dirs.append(np.zeros(1 << m_bits, np.int32))
                rows.append(
                    np.tile(np.array([-1, -1, 0, 0, 0, 0], slot_dt), (1 << t_bits, 1))
                )
                continue
            res = nat.chd_build(chi[c0:c1], clo[c0:c1], m_bits, t_bits, seed, MAXD, p_bits)
            if res is None:
                ok = False
                break
            dirv, perm = res
            pg = np.clip(perm.astype(np.int64) + c0, 0, n_cls - 1)
            # uint32 keys zero-extend into the row dtype (int32 bitcast view
            # for the narrow layout, plain widening for int64)
            if slot_dt == np.int64:
                r6 = np.stack(
                    [chi[pg].astype(np.int64), clo[pg].astype(np.int64),
                     bf[pg], ef[pg], br[pg], er[pg]], axis=1,
                )
            else:
                r6 = np.stack(
                    [chi[pg].view(np.int32), clo[pg].view(np.int32),
                     bf[pg].astype(np.int32), ef[pg].astype(np.int32),
                     br[pg].astype(np.int32), er[pg].astype(np.int32)], axis=1,
                )
            sentinel = np.array([-1, -1, 0, 0, 0, 0], slot_dt)
            rows.append(np.where((perm >= 0)[:, None], r6, sentinel[None, :]))
            dirs.append(dirv)
        if ok:
            return np.stack(dirs), np.stack(rows), seed, m_bits, t_bits, p_bits
    return None


def shard_quasi_index(
    idx: QuasiIndex, n_shards: int, use_chd: bool = True, slot64: bool | None = None,
    canonical: bool | None = None,
):
    """Cut the index at prefix-bucket boundaries into n_shards slot ranges.

    slot64: carry GLOBAL slot coordinates (slot_base, dense/walk unions) as
    int64 — required past 2^31 total SA slots (human-genome scale, the bigSA
    interval regime); per-shard tables stay int32-local either way. None =
    automatic by index size; True lets tests exercise the wide path small.

    Returns (ShardedIndexArrays as numpy, EngineStatic). When the native CHD
    builder is available (and use_chd), each shard gets its own perfect-hash
    probe table: 2 gathers/window/strand in the dense phase instead of the
    1 + lookup_steps binary search. Alien keys need no masking — CHD sends
    them to an arbitrary slot whose key compare rejects, so a key is found on
    exactly its owning shard and the psum-union stays exact. The default
    canonical both-strands-per-probe variant shards the CLASS table by class
    space (a class's fwd/rc k-mers live on different SA shards, but class
    rows carry GLOBAL intervals so they need no SA co-location) — one probe
    per forward window answers both strands, half the per-shard dense
    gathers; canonical=False selects the per-strand per-shard layout
    (docs/DESIGN_SA_SHARDING.md).
    """
    lut = np.asarray(idx.prefix_lut, dtype=np.int64)
    kb = np.asarray(idx.kmer_b, dtype=np.int64)
    ke = np.asarray(idx.kmer_e, dtype=np.int64)
    K = len(kb)
    n = len(idx.sa)
    # choose prefix cut values so each shard holds ~K/n_shards k-mer rows
    targets = [round(i * K / n_shards) for i in range(n_shards + 1)]
    pv = [int(np.searchsorted(lut, t, side="left")) for t in targets]
    pv[0], pv[-1] = 0, len(lut) - 1
    row_cuts = [int(lut[v]) for v in pv]
    # shard slot ranges: from the first owned k-mer's b to the next cut's b
    slot_cuts = []
    for r in row_cuts:
        slot_cuts.append(int(kb[r]) if r < K else n)
    slot_cuts[0] = 0
    slot_cuts[-1] = n

    S_pad = max(slot_cuts[i + 1] - slot_cuts[i] for i in range(n_shards)) or 1
    K_pad = max(row_cuts[i + 1] - row_cuts[i] for i in range(n_shards)) or 1
    from rapmap_tpu.ops.device_index import sa_cmp_rows

    sa_txp = np.asarray(idx.sa_txp, dtype=np.int32)
    sa_tpos = np.asarray(idx.sa_tpos, dtype=np.int32)
    off = np.asarray(idx.txp_offsets, dtype=np.int64)
    tl = np.asarray(idx.txp_lens, dtype=np.int32)
    khi_u32 = np.asarray(idx.kmer_hi, dtype=np.uint32)
    klo_u32 = np.asarray(idx.kmer_lo, dtype=np.uint32)
    khi = khi_u32.view(np.int32)
    klo = klo_u32.view(np.int32)

    t2b = np.asarray(idx.text2b, dtype=np.uint32)
    cmp_all = sa_cmp_rows(idx.sa, off[sa_txp] + tl[sa_txp], idx.k, t2b)
    FC = cmp_all.shape[1]
    nw = len(t2b)
    t2p = np.concatenate([t2b, np.zeros(4, np.uint32)])
    text2q1 = np.stack([t2p[i : i + nw] for i in range(4)], axis=1)

    if slot64 is None:
        slot64 = n >= 2**31
    if slot64:
        import jax as _jax

        if not _jax.config.jax_enable_x64:
            raise ValueError(
                "slot64 sharded indexes carry int64 global slot ids on device; "
                "enable 64-bit JAX first (jax.config.update('jax_enable_x64', "
                "True)) or int64 arrays silently downcast to int32"
            )
    P_ = n_shards
    text2q = np.broadcast_to(text2q1, (P_, nw, 4)).copy()
    sa_cmp = np.zeros((P_, S_pad, FC), np.int32)
    sa_meta = np.zeros((P_, S_pad, 2), np.int32)
    kmer_rows = np.zeros((P_, K_pad, 4), np.int32)
    lut_rows = np.zeros((P_, len(lut) - 1, 2), np.int32)
    bases = np.zeros((P_, 2), np.int64 if slot64 else np.int32)
    for p in range(P_):
        s0, s1 = slot_cuts[p], slot_cuts[p + 1]
        r0, r1 = row_cuts[p], row_cuts[p + 1]
        ns, nr = s1 - s0, r1 - r0
        assert ns < 2**31 and nr < 2**31, (
            "per-shard slot/row counts must stay int32-local; use more shards"
        )
        bases[p, 0] = s0
        bases[p, 1] = ns
        sa_cmp[p, :ns] = cmp_all[s0:s1]
        sa_meta[p, :ns, 0] = sa_txp[s0:s1]
        sa_meta[p, :ns, 1] = sa_tpos[s0:s1]
        kmer_rows[p, :nr, 0] = khi[r0:r1]
        kmer_rows[p, :nr, 1] = klo[r0:r1]
        kmer_rows[p, :nr, 2] = (kb[r0:r1] - s0).astype(np.int32)
        kmer_rows[p, :nr, 3] = (ke[r0:r1] - s0).astype(np.int32)
        # LUT rebased to shard-local rows; buckets outside [pv[p], pv[p+1]) empty
        lr = np.clip(lut, r0, r1) - r0
        lut_rows[p, :, 0] = lr[:-1]
        lut_rows[p, :, 1] = lr[1:]

    from rapmap_tpu.ops.align import make_txp_align

    ta1 = make_txp_align(off, tl)
    txp_align_p = np.broadcast_to(ta1, (P_,) + ta1.shape).copy()
    st = EngineStatic.for_index(idx)
    chd_dir = chd_rows = None
    if canonical is None:
        canonical = use_chd
    cres = (
        _build_class_shard_chds(
            idx, n_shards, idx.seed + 13, np.int64 if slot64 else np.int32
        )
        if (use_chd and canonical)
        else None
    )
    if cres is not None:
        dirs_c, rows_c, seed_c, mb_c, tb_c, pb_c = cres
        chd_dir, chd_rows = dirs_c, rows_c
        st = replace(
            st, use_chd=True, chd_canonical=True,
            chd_seed=int(seed_c), chd_m_bits=mb_c, chd_t_bits=tb_c,
            chd_p_bits=pb_c,
        )
        arrays = ShardedIndexArrays(
            text2q=text2q, sa_cmp=sa_cmp, sa_meta=sa_meta,
            kmer_rows=kmer_rows, lut_rows=lut_rows,
            slot_base=bases, chd_dir=chd_dir, chd_rows=chd_rows,
            txp_align=txp_align_p,
        )
        return arrays, st
    chd = _build_shard_chds(khi_u32, klo_u32, row_cuts, idx.seed + 7) if use_chd else None
    if chd is not None:
        dirs, perms, seed, m_bits, t_bits, p_bits = chd
        sentinel = np.array([-1, -1, 0, 0], dtype=np.int32)
        chd_rows = np.empty((P_, 1 << t_bits, 4), np.int32)
        for p in range(P_):
            r0, r1 = row_cuts[p], row_cuts[p + 1]
            local = kmer_rows[p]  # rows already rebased to shard-local slots
            perm = perms[p]
            pc = np.clip(perm, 0, max(r1 - r0 - 1, 0))
            chd_rows[p] = np.where((perm >= 0)[:, None], local[pc], sentinel[None, :])
        chd_dir = dirs
        st = replace(
            st, use_chd=True, chd_canonical=False,
            chd_seed=int(seed), chd_m_bits=m_bits, chd_t_bits=t_bits,
            chd_p_bits=p_bits,
        )
    else:
        st = replace(st, use_chd=False, chd_canonical=False)
    arrays = ShardedIndexArrays(
        text2q=text2q, sa_cmp=sa_cmp, sa_meta=sa_meta,
        kmer_rows=kmer_rows, lut_rows=lut_rows,
        slot_base=bases, chd_dir=chd_dir, chd_rows=chd_rows,
        txp_align=txp_align_p,
    )
    return arrays, st


def _local_didx(sh) -> DeviceQuasiIndex:
    """View one shard's slice (inside shard_map, leading axis already split)."""
    return DeviceQuasiIndex(
        text2q=sh.text2q[0], sa_cmp=sh.sa_cmp[0], sa_meta=sh.sa_meta[0],
        kmer_rows=sh.kmer_rows[0], lut_rows=sh.lut_rows[0],
        chd_dir=None if sh.chd_dir is None else sh.chd_dir[0],
        chd_rows=None if sh.chd_rows is None else sh.chd_rows[0],
        txp_align=None if sh.txp_align is None else sh.txp_align[0],
    )


def _sharded_scan(didx, st, reads, lens, cfg):
    """Lockstep NIP walk across the 'idx' axis (SEMANTICS.md §3, exact).

    Dense phase: each shard answers lookups for its own k-mer range; the
    (R, S) interval maps psum-union across 'idx' into GLOBAL slot coords
    (every k-mer's interval lives wholly inside one shard — the SA is cut at
    prefix-bucket boundaries, docs/DESIGN_SA_SHARDING.md).

    Walk phase: the serial anchor walk runs replicated — pos/hits advance
    identically on every shard — and each step's extension executes only on
    the anchor's owning shard (whose slots narrowing can never leave), with
    a 3-vector (R,)-psum unioning the step's (b, e, mlen). Extension work is
    therefore the NIP-visited anchors only (~2-6/lane), not all S window
    positions: ~S× less compute than the previous anchor-parallel design for
    a few tiny latency-bound ICI collectives per walk step."""
    R, L = reads.shape
    k = st.k
    S = L - k + 1
    H = cfg.max_hits_per_strand
    # binary-search trips need only cover the widest interval that can
    # actually occur: min(configured cap, widest k-mer interval in the index)
    eff_w = min(cfg.max_interval, st.max_interval_idx)
    ext_steps = max(1, math.ceil(math.log2(eff_w + 1)) + 1)
    base = didx_base_holder[0]
    n_local = didx_nlocal_holder[0]
    # global slot coordinates ride the slot_base dtype: int64 past 2^31 total
    # SA slots (genome-scale), int32 otherwise; shard-local values stay int32
    sdt = base.dtype

    key_hi, key_lo, kvalid = denc.kmer_keys_batch(reads, k)
    found, db, de = kmer_lookup(didx, st, key_hi, key_lo)
    in_len = (np.arange(S, dtype=np.int32)[None, :] + k) <= lens[:, None]
    found = found & kvalid & in_len
    # union dense maps across 'idx' into global slot coordinates
    b2 = lax.psum(jnp.where(found, db.astype(sdt) + base, 0), "idx")
    e2 = lax.psum(jnp.where(found, de.astype(sdt) + base, 0), "idx")
    anch2 = (lax.psum(found.astype(jnp.int32), "idx") > 0) & (
        (e2 - b2) <= cfg.max_interval
    )

    s_or_big = jnp.where(anch2, np.arange(S, dtype=np.int32)[None, :], np.int32(S))
    next_anchor = jnp.flip(
        lax.associative_scan(jnp.minimum, jnp.flip(s_or_big, axis=1), axis=1), axis=1
    )

    next_bad = denc.next_bad_batch(reads, L)
    preads = pack_reads(reads)

    def at(arr2d, pos, fill):
        v = row_gather(arr2d, jnp.clip(pos, 0, arr2d.shape[1] - 1)[:, None])[:, 0]
        return jnp.where(pos < arr2d.shape[1], v, fill)

    zR_H = np.zeros((R, H), np.int32)
    zR_Hs = np.zeros((R, H), sdt)
    hits0 = ScanHits(q=zR_H, l=zR_H, b=zR_Hs, e=zR_Hs, n=lens * 0, truncated=lens < 0)
    pos0 = at(next_anchor, lens * 0, np.int32(S))
    rows = np.arange(R, dtype=np.int32)

    def cond(state):
        pos, hits = state
        return jnp.any((pos < S) & ~hits.truncated)

    def body(state):
        pos, hits = state
        act = (pos < S) & ~hits.truncated
        posc = jnp.clip(pos, 0, S - 1)
        b0 = at(b2, posc, sdt.type(0))  # global slots
        e0 = at(e2, posc, sdt.type(0))
        # this shard extends only the anchors whose interval it owns;
        # ownership tested in global coords, then rebased to int32-local
        lb = b0 - base
        mine = act & (lb >= 0) & (lb < n_local)
        b1l, e1l, mlenl = extend_packed(
            didx, preads, next_bad, lens,
            jnp.clip(lb, 0, n_local).astype(jnp.int32),
            jnp.clip(e0 - base, 0, n_local).astype(jnp.int32),
            posc, mine, k, ext_steps, L,
        )
        b1 = lax.psum(jnp.where(mine, b1l.astype(sdt) + base, 0), "idx")
        e1 = lax.psum(jnp.where(mine, e1l.astype(sdt) + base, 0), "idx")
        mlen = lax.psum(jnp.where(mine, mlenl, 0), "idx")

        slot = jnp.clip(hits.n, 0, H - 1)
        overflow = act & (hits.n >= H)
        write = act & ~overflow

        def put(buf, val):
            old = buf[rows, slot]
            return buf.at[rows, slot].set(jnp.where(write, val, old))

        hits = ScanHits(
            q=put(hits.q, posc), l=put(hits.l, mlen), b=put(hits.b, b1), e=put(hits.e, e1),
            n=hits.n + write.astype(jnp.int32), truncated=hits.truncated | overflow,
        )
        nxt = posc + jnp.maximum(1, mlen - k + 1)
        pos_next = jnp.where(nxt >= S, np.int32(S), at(next_anchor, nxt, np.int32(S)))
        return jnp.where(act, pos_next, pos), hits

    _, hits = lax.while_loop(cond, body, (pos0, hits0))
    return hits


def _probe_class_rows(didx, st, can_hi, can_lo):
    """Shard-local canonical-class probe -> (hit, row (..., 6)).

    Hash math identical to ops.lookup._chd_probe_canonical; rows may be int64
    (slot64 regime), where the uint32 keys compare zero-extended."""
    from rapmap_tpu.ops.lookup import _as_u32, _mix32, chd_slot

    sa_ = np.uint32((st.chd_seed * 0x9E3779B9 + 1) & 0xFFFFFFFF)
    sb_ = np.uint32((st.chd_seed * 0x85EBCA6B + 2) & 0xFFFFFFFF)
    g = (
        _mix32(can_hi ^ _mix32(can_lo ^ sa_)) & np.uint32((1 << st.chd_m_bits) - 1)
    ).astype(jnp.int32)
    hb = _mix32(can_hi ^ _mix32(can_lo ^ sb_))
    d = _as_u32(jnp.take(didx.chd_dir, g, mode="clip"))
    slot = chd_slot(st, g, hb, d)
    row = row_gather_nd(didx.chd_rows, slot)
    if row.dtype == jnp.int64:
        hit = (row[..., 0] == can_hi.astype(jnp.int64)) & (
            row[..., 1] == can_lo.astype(jnp.int64)
        )
    else:
        hit = (_as_u32(row[..., 0]) == can_hi) & (_as_u32(row[..., 1]) == can_lo)
    return hit, row


def _sharded_scan_paired(didx, st, reads, lens, cfg):
    """Canonical-class sharded scan (SEMANTICS.md §3, exact): ONE class probe
    per forward window answers BOTH strands, then the lockstep walk of
    _sharded_scan over [fwd; rc] lanes.

    Dense phase: each shard probes its CLASS slice; a class is non-rejected
    on exactly one shard and its row already carries GLOBAL [bf,ef,br,er]
    intervals, so one psum unions the strand-resolved 4-tuple — half the
    per-shard dense gathers of the per-strand layout (the single-device
    profile's dominant cost). rc-lane walk coordinates map through
    col = len - k - pos exactly as ops.mmp.scan_batch_paired."""
    from rapmap_tpu.ops.encode import rc_keys_batch

    B, L = reads.shape
    k = st.k
    S = L - k + 1
    H = cfg.max_hits_per_strand
    eff_w = min(cfg.max_interval, st.max_interval_idx)
    ext_steps = max(1, math.ceil(math.log2(eff_w + 1)) + 1)
    base = didx_base_holder[0]
    n_local = didx_nlocal_holder[0]
    sdt = base.dtype

    lens2 = jnp.concatenate([lens, lens])
    R = 2 * B
    lanes = jnp.concatenate([reads, denc.revcomp_batch(reads, lens)], axis=0)
    next_bad = denc.next_bad_batch(lanes, L)
    preads = pack_reads(lanes)

    # ---- dense: one canonical probe per forward window, psum-unioned -------
    key_hi, key_lo, kvalid = denc.kmer_keys_batch(reads, k)  # (B, S)
    rhi, rlo = rc_keys_batch(key_hi, key_lo, k)
    is_can = (key_hi < rhi) | ((key_hi == rhi) & (key_lo <= rlo))
    can_hi = jnp.where(is_can, key_hi, rhi)
    can_lo = jnp.where(is_can, key_lo, rlo)
    hit, row = _probe_class_rows(didx, st, can_hi, can_lo)
    z = row[..., 2] * 0
    b_can = jnp.where(hit, row[..., 2], z)
    e_can = jnp.where(hit, row[..., 3], z)
    b_alt = jnp.where(hit, row[..., 4], z)
    e_alt = jnp.where(hit, row[..., 5], z)
    bf = lax.psum(jnp.where(is_can, b_can, b_alt), "idx")
    ef = lax.psum(jnp.where(is_can, e_can, e_alt), "idx")
    br = lax.psum(jnp.where(is_can, b_alt, b_can), "idx")
    er = lax.psum(jnp.where(is_can, e_alt, e_can), "idx")
    hitn = lax.psum(hit.astype(jnp.int32), "idx") > 0

    in_len = (np.arange(S, dtype=np.int32)[None, :] + k) <= lens[:, None]
    ok = kvalid & in_len & hitn
    anch_f = ok & (ef > bf) & ((ef - bf) <= cfg.max_interval)
    anch_rF = ok & (er > br) & ((er - br) <= cfg.max_interval)  # fwd coords

    s_ix = np.arange(S, dtype=np.int32)[None, :]
    nf = jnp.where(anch_f, s_ix, np.int32(S))
    next_f = jnp.flip(
        lax.associative_scan(jnp.minimum, jnp.flip(nf, axis=1), axis=1), axis=1
    )
    pv = jnp.where(anch_rF, s_ix, np.int32(-1))
    prev_rF = lax.associative_scan(jnp.maximum, pv, axis=1)

    db2 = jnp.concatenate([bf, br], axis=0)   # (R, S), rc rows in fwd coords
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

    zR_H = np.zeros((R, H), np.int32)
    zR_Hs = np.zeros((R, H), sdt)
    hits0 = ScanHits(q=zR_H, l=zR_H, b=zR_Hs, e=zR_Hs, n=lens2 * 0, truncated=lens2 < 0)
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
        b0 = at2(db2, col)  # global slots (sdt)
        e0 = at2(de2, col)
        lb = b0 - base
        mine = act & (lb >= 0) & (lb < n_local)
        b1l, e1l, mlenl = extend_packed(
            didx, preads, next_bad, lens2,
            jnp.clip(lb, 0, n_local).astype(jnp.int32),
            jnp.clip(e0 - base, 0, n_local).astype(jnp.int32),
            posc, mine, k, ext_steps, L,
        )
        b1 = lax.psum(jnp.where(mine, b1l.astype(sdt) + base, 0), "idx")
        e1 = lax.psum(jnp.where(mine, e1l.astype(sdt) + base, 0), "idx")
        mlen = lax.psum(jnp.where(mine, mlenl, 0), "idx")

        slot = jnp.clip(hits.n, 0, H - 1)
        overflow = act & (hits.n >= H)
        write = act & ~overflow

        def put(buf, val):
            old = buf[rows, slot]
            return buf.at[rows, slot].set(jnp.where(write, val, old))

        hits = ScanHits(
            q=put(hits.q, posc), l=put(hits.l, mlen),
            b=put(hits.b, b1), e=put(hits.e, e1),
            n=hits.n + write.astype(jnp.int32), truncated=hits.truncated | overflow,
        )
        nxt = posc + jnp.maximum(1, mlen - k + 1)
        pos_next = next_anchor_pos(nxt)
        return jnp.where(act, pos_next, pos), hits

    _, hits = lax.while_loop(cond, body, (pos0, hits0))
    return hits


# thread-local-ish holders for the shard base / true slot count inside
# shard_map bodies (traced scalars; set before _sharded_scan runs)
didx_base_holder = [None]
didx_nlocal_holder = [None]


def _score_mapout(didx, cfg, reads, lens, out):
    """MapOut.score <- banded alignment scores (--mappingScore, SEMANTICS §9)
    for the slotted sharded layout. text2q/txp_align are replicated across
    idx shards, so every shard computes identical scores locally — no
    collective. Scores all B x MO slots (masked), so sharded scoring runs
    should configure a modest cfg.max_out."""
    from rapmap_tpu.ops.align import score_records

    B, MO = out.t.shape
    rid = np.repeat(np.arange(B, dtype=np.int32), MO)
    valid = (out.t != -1).reshape(-1)
    sc = score_records(
        didx, cfg, reads, lens, rid,
        jnp.maximum(out.t.reshape(-1), 0),
        jnp.where(valid, out.pos.reshape(-1), 0),
        out.strand.reshape(-1), valid,
    )
    return out._replace(score=jnp.where(valid, sc, 0).reshape(B, MO))


def _se_shard2d(sh: ShardedIndexArrays, st, reads, lens, nv, cfg):
    didx = _local_didx(sh)
    base = sh.slot_base[0, 0]
    n_local = sh.slot_base[0, 1]  # true slot count, not the padded S_pad
    didx_base_holder[0] = base
    didx_nlocal_holder[0] = n_local
    if getattr(st, "chd_canonical", False):
        hits = _sharded_scan_paired(didx, st, reads, lens, cfg)
    else:
        lanes = jnp.concatenate([reads, denc.revcomp_batch(reads, lens)], axis=0)
        lens2 = jnp.concatenate([lens, lens])
        hits = _sharded_scan(didx, st, lanes, lens2, cfg)

    n_pad = didx.sa_meta.shape[0]

    def expand_fn(p, q):
        # p arrives in GLOBAL slot coords (int64 in the slot64 regime);
        # ownership is tested wide, the owned gather index is int32-local
        local = p - base
        mine = (local >= 0) & (local < n_local)
        meta = row_gather_nd(
            didx.sa_meta, jnp.clip(local, 0, n_pad - 1).astype(jnp.int32)
        )
        t1 = jnp.where(mine, meta[..., 0] + 1, 0)
        tp = jnp.where(mine, meta[..., 1], 0)
        t1 = lax.psum(t1, "idx")
        tp = lax.psum(tp, "idx")
        return t1 - 1, tp - q

    out = collate_batch(None, None, hits, lens, cfg, expand_fn=expand_fn)
    if cfg.mapping_score:
        out = _score_mapout(didx, cfg, reads, lens, out)
    B = reads.shape[0]
    real = np.arange(B, dtype=np.int32) < nv
    ctr = Counters(
        reads_total=lax.psum(nv.astype(jnp.int32), "data"),
        reads_mapped=lax.psum(jnp.sum(out.mapped & real, dtype=jnp.int32), "data"),
        too_ambiguous=lax.psum(jnp.sum(out.too_ambiguous & real, dtype=jnp.int32), "data"),
        over_budget=lax.psum(jnp.sum(out.over_budget & real, dtype=jnp.int32), "data"),
        records=lax.psum(
            jnp.sum(jnp.where(real[:, None], out.t != -1, False), dtype=jnp.int32), "data"
        ),
        out_truncated=lax.psum(jnp.sum(out.out_truncated & real, dtype=jnp.int32), "data"),
    )
    return out, ctr


def make_mesh_2d(n_data: int, n_idx: int, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    assert len(devices) >= n_data * n_idx
    arr = np.asarray(devices[: n_data * n_idx]).reshape(n_data, n_idx)
    return Mesh(arr, ("data", "idx"))


@partial(jax.jit, static_argnames=("st", "cfg", "mesh"))
def map_batch_se_sharded(
    sharr: ShardedIndexArrays,
    st: EngineStatic,
    reads: jnp.ndarray,       # (B_total, L)
    lens: jnp.ndarray,
    n_valid_local: jnp.ndarray,  # (n_data,) valid rows per data shard
    cfg: MapConfig,
    mesh: Mesh,
):
    fn = jax.shard_map(
        lambda sh, r, l, nv: _se_shard2d(sh, st, r, l, nv[0], cfg),
        mesh=mesh,
        in_specs=(P("idx"), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )
    return fn(sharr, reads, lens, n_valid_local)


def _pe_shard2d(sh, st, r1, l1, r2, l2, nv, cfg):
    from rapmap_tpu.ops.pairs import merge_pairs_batch

    o1, _ = _se_shard2d(sh, st, r1, l1, nv, cfg)
    o2, _ = _se_shard2d(sh, st, r2, l2, nv, cfg)
    pairs = merge_pairs_batch(o1, o2, cfg)
    B = r1.shape[0]
    real = np.arange(B, dtype=np.int32) < nv
    ctr = Counters(
        reads_total=lax.psum(nv.astype(jnp.int32), "data"),
        reads_mapped=lax.psum(jnp.sum(pairs.any_record & real, dtype=jnp.int32), "data"),
        too_ambiguous=lax.psum(jnp.sum(pairs.too_ambiguous & real, dtype=jnp.int32), "data"),
        over_budget=lax.psum(
            jnp.sum((o1.over_budget | o2.over_budget) & real, dtype=jnp.int32), "data"
        ),
        records=lax.psum(
            jnp.sum(jnp.where(real[:, None], pairs.t != -1, False), dtype=jnp.int32), "data"
        ),
        out_truncated=lax.psum(
            jnp.sum(
                (o1.out_truncated | o2.out_truncated | pairs.out_truncated) & real,
                dtype=jnp.int32,
            ),
            "data",
        ),
    )
    return o1, o2, pairs, ctr


@partial(jax.jit, static_argnames=("st", "cfg", "mesh"))
def map_batch_pe_sharded(
    sharr: ShardedIndexArrays, st: EngineStatic,
    reads1, lens1, reads2, lens2, n_valid_local, cfg: MapConfig, mesh: Mesh,
):
    fn = jax.shard_map(
        lambda sh, r1, l1, r2, l2, nv: _pe_shard2d(sh, st, r1, l1, r2, l2, nv[0], cfg),
        mesh=mesh,
        in_specs=(P("idx"), P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P()),
        check_vma=False,
    )
    return fn(sharr, reads1, lens1, reads2, lens2, n_valid_local)
