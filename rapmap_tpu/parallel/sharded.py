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
    chd_dir: jnp.ndarray | None = None   # (P, 2^m_bits) int32
    chd_rows: jnp.ndarray | None = None  # (P, 2^t_bits, 4) [hi, lo, b_loc, e_loc]


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
    m_bits, t_bits = chd_params(n_max)
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
                khi_u32[r0:r1], klo_u32[r0:r1], m_bits, t_bits, seed, MAXD
            )
            if res is None:
                ok = False
                break
            dirs.append(res[0])
            perms.append(res[1])
        if ok:
            return np.stack(dirs), np.stack(perms), seed, m_bits, t_bits
    return None


def shard_quasi_index(
    idx: QuasiIndex, n_shards: int, use_chd: bool = True, slot64: bool | None = None
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
    exactly its owning shard and the psum-union stays exact. The canonical
    both-strands-per-probe variant deliberately does NOT port: a class's fwd
    and rc k-mers sort into different prefix buckets (different shards), so
    class rows would straddle shards; per-strand per-shard CHD is the
    portable form (docs/DESIGN_SA_SHARDING.md).
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

    st = EngineStatic.for_index(idx)
    chd_dir = chd_rows = None
    chd = _build_shard_chds(khi_u32, klo_u32, row_cuts, idx.seed + 7) if use_chd else None
    if chd is not None:
        dirs, perms, seed, m_bits, t_bits = chd
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
        )
    else:
        st = replace(st, use_chd=False, chd_canonical=False)
    arrays = ShardedIndexArrays(
        text2q=text2q, sa_cmp=sa_cmp, sa_meta=sa_meta,
        kmer_rows=kmer_rows, lut_rows=lut_rows,
        slot_base=bases, chd_dir=chd_dir, chd_rows=chd_rows,
    )
    return arrays, st


def _local_didx(sh) -> DeviceQuasiIndex:
    """View one shard's slice (inside shard_map, leading axis already split)."""
    return DeviceQuasiIndex(
        text2q=sh.text2q[0], sa_cmp=sh.sa_cmp[0], sa_meta=sh.sa_meta[0],
        kmer_rows=sh.kmer_rows[0], lut_rows=sh.lut_rows[0],
        chd_dir=None if sh.chd_dir is None else sh.chd_dir[0],
        chd_rows=None if sh.chd_rows is None else sh.chd_rows[0],
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


# thread-local-ish holders for the shard base / true slot count inside
# shard_map bodies (traced scalars; set before _sharded_scan runs)
didx_base_holder = [None]
didx_nlocal_holder = [None]


def _se_shard2d(sh: ShardedIndexArrays, st, reads, lens, nv, cfg):
    didx = _local_didx(sh)
    base = sh.slot_base[0, 0]
    n_local = sh.slot_base[0, 1]  # true slot count, not the padded S_pad
    didx_base_holder[0] = base
    didx_nlocal_holder[0] = n_local
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
