"""Fine-grained device profile of the CURRENT hot path.

Cuts (each timed as a chunked lax.scan over NCH fresh 8192-read chunks in
ONE dispatch; pre-uploaded feeds; fresh buffers per rep):

  pack    : pack_reads + next_bad (shared prep for keys + extension)
  keys    : pack + rolling-word keys + rc/canonical selection (pure ALU)
  lookup  : keys + canonical-class CHD probe (2 gathers/window)
  scan    : full scan_dispatch (adds the anchor walk w/ fused sa_cmp rows)
  expand  : scan + slot-pool expansion (cumsum, scatter, 2 gathers/slot)
  vote    : expand + sort 1 + run support counts
  core    : full _collate_core (adds segment-argmax best + filters)

Derived: probe = lookup-keys, walk = scan-lookup, sort1 = vote-expand,
best+filters = core-vote.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import CHUNK, READ_LEN, build_world  # noqa: E402

NCH = 8
REPS = 3


def main():
    isoform = "--isoform" in sys.argv
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.models.quasi import QuasiMapper
    from rapmap_tpu.ops import encode as denc
    from rapmap_tpu.ops.collate import _collate_core
    from rapmap_tpu.ops.extend_packed import pack_reads
    from rapmap_tpu.ops.gather import flat_gather, row_gather_nd
    from rapmap_tpu.ops.lookup import kmer_lookup_2str
    from rapmap_tpu.ops.mmp import scan_dispatch

    if isoform:
        from bench import build_isoform_world

        idx, codes = build_isoform_world()
        cfg = MapConfig(
            k=idx.k, chunk=CHUNK,
            max_hits_per_strand=4, expand_budget=0, max_out=32, rec_slots=4,
        )
    else:
        idx, codes = build_world()
        from bench import bench_cfg

        cfg = bench_cfg(idx, chunk=CHUNK)
    mapper = QuasiMapper(idx, cfg)
    cfg = mapper.cfg  # expand_budget=0 resolves to auto-sizing at mapper init
    print(f"# cfg: H={cfg.max_hits_per_strand} expand_budget={cfg.expand_budget} "
          f"rec_slots={cfg.rec_slots}", file=sys.stderr)
    didx, st = mapper.didx, mapper.st
    C, L = CHUNK, READ_LEN
    B = NCH * C
    lens_np = np.full(C, L, dtype=np.int32)
    k = st.k
    S = L - k + 1

    def prep(reads):
        # mirror the engine's packed_extension prep exactly (ops/mmp.py
        # scan_batch_paired): rc lanes via the static comp_flip, NOT the
        # per-row revcomp gather — an earlier profiler cut used revcomp_batch
        # and overstated "pack+nb" ~4x vs what the engine actually runs
        lanes = jnp.concatenate([reads, denc.comp_flip_batch(reads)], axis=0)
        nb = denc.next_bad_batch(lanes, L)
        pr = pack_reads(lanes)
        return lanes, nb, pr

    def stage_pack(didx, reads, lens):
        _, nb, pr = prep(reads)
        return jnp.sum(pr[:, 0].astype(jnp.int32)) + jnp.sum(nb[:, -1])

    def keys_of(reads):
        from rapmap_tpu.ops.encode import rc_keys_batch

        _, nb, pr = prep(reads)
        key_hi, key_lo, kvalid = denc.kmer_keys_from_packed(
            pr[: reads.shape[0]], nb[: reads.shape[0]], k, S
        )
        rhi, rlo = rc_keys_batch(key_hi, key_lo, k)
        is_can = (key_hi < rhi) | ((key_hi == rhi) & (key_lo <= rlo))
        can_hi = jnp.where(is_can, key_hi, rhi)
        can_lo = jnp.where(is_can, key_lo, rlo)
        return key_hi, key_lo, can_hi, can_lo, kvalid

    def stage_keys(didx, reads, lens):
        key_hi, key_lo, can_hi, can_lo, kvalid = keys_of(reads)
        return (
            jnp.sum(can_hi.astype(jnp.int32))
            + jnp.sum(can_lo.astype(jnp.int32))
            + jnp.sum(kvalid, dtype=jnp.int32)
        )

    def stage_lookup(didx, reads, lens):
        key_hi, key_lo, _, _, kvalid = keys_of(reads)
        ff, bf, ef, fr, br, er = kmer_lookup_2str(didx, st, key_hi, key_lo)
        return (
            jnp.sum(ff & kvalid, dtype=jnp.int32)
            + jnp.sum(bf + br, dtype=jnp.int32)
            + jnp.sum(ef + er, dtype=jnp.int32)
        )

    def stage_scan(didx, reads, lens):
        h = scan_dispatch(didx, st, reads, lens, cfg)
        return jnp.sum(h.n, dtype=jnp.int32) + jnp.sum(h.b, dtype=jnp.int32)

    def collate_sub(didx, reads, lens, upto: str):
        """_collate_core's pipeline re-cut at expand / vote boundaries."""
        hits = scan_dispatch(didx, st, reads, lens, cfg)
        R, H = hits.q.shape
        Bc = R // 2
        H2 = 2 * H
        NH = Bc * H2
        CAPG = cfg.expand_budget * Bc

        hvalid_rows = np.arange(H, dtype=np.int32)[None, :] < hits.n[:, None]

        def fold(x):
            return jnp.concatenate([x[:Bc], x[Bc:]], axis=1)

        hq, hb = fold(hits.q), fold(hits.b)
        he = fold(hits.e)
        hv = fold(hvalid_rows)
        hstrand = np.concatenate(
            [np.zeros((Bc, H), np.int32), np.ones((Bc, H), np.int32)], axis=1
        )
        read_of_hit = np.repeat(np.arange(Bc, dtype=np.int32), H2)

        w = jnp.where(hv, he - hb, 0).reshape(-1)
        cs = jnp.cumsum(w)
        sg = cs - w
        total_global = cs[-1]
        hit_ids = np.arange(NH, dtype=np.int32)
        valid_hit = (w > 0) & (sg < CAPG)
        scat_idx = jnp.where(valid_hit, sg, CAPG)
        pool0 = jnp.broadcast_to(total_global * 0 - 1, (CAPG + 1,))
        pool_hit = pool0.at[scat_idx].max(
            jnp.where(valid_hit, hit_ids, -1), mode="drop"
        )[:CAPG]
        pool_hit = lax.associative_scan(jnp.maximum, pool_hit)
        g = np.arange(CAPG, dtype=np.int32)
        slot_valid = (g < jnp.minimum(total_global, CAPG)) & (pool_hit >= 0)
        ph = jnp.clip(pool_hit, 0, NH - 1)
        rs_const = read_of_hit * 2 + hstrand.reshape(-1)
        hit_rows = jnp.stack(
            [hb.reshape(-1), sg, hq.reshape(-1), jnp.broadcast_to(rs_const, sg.shape)],
            axis=-1,
        )
        g4 = jnp.take(hit_rows, ph, axis=0, mode="clip")
        p = g4[:, 0] + (g - g4[:, 1])
        hq_slot = g4[:, 2]
        read = g4[:, 3] >> 1
        strand = g4[:, 3] & 1
        meta = row_gather_nd(didx.sa_meta, jnp.clip(p, 0, didx.sa_meta.shape[0] - 1))
        t = meta[:, 0]
        tpos = meta[:, 1] - hq_slot
        if upto == "expand":
            return (
                jnp.sum(t, dtype=jnp.int32)
                + jnp.sum(tpos, dtype=jnp.int32)
                + jnp.sum(slot_valid, dtype=jnp.int32)
            )

        from rapmap_tpu.ops.collate import BIG, FULLW, _pack2, _unpack2

        rb = (Bc + 1).bit_length()
        tb = (2 * st.n_txps + 1).bit_length()
        bias = st.pad_tail
        pb = max(1, (st.max_tpos + bias + 1).bit_length())
        ts_val = t * 2 + strand
        hi0, lo0 = _pack2([(read, rb), (ts_val, tb), (tpos + np.int32(bias), pb)])
        hi0 = jnp.where(slot_valid, hi0, FULLW)
        lo0 = jnp.where(slot_valid, lo0, FULLW)
        khi, klo = lax.sort([hi0, lo0], dimension=0, num_keys=2)
        valid1 = khi != FULLW
        k1 = jnp.where(valid1, _unpack2(khi, klo, tb + pb, rb), BIG)
        prev_same = (khi[1:] == khi[:-1]) & (klo[1:] == klo[:-1])
        run_start = valid1 & jnp.concatenate([np.ones(1, bool), ~prev_same])
        run_id = jnp.cumsum(run_start.astype(jnp.int32)) - 1
        seg = jax.ops.segment_sum(
            valid1.astype(jnp.int32), jnp.clip(run_id, 0, CAPG - 1), num_segments=CAPG
        )
        support = jnp.where(
            run_start, flat_gather(seg, jnp.clip(run_id, 0, CAPG - 1)), 0
        )
        if upto == "vote":
            return (
                jnp.sum(k1, dtype=jnp.int32) + jnp.sum(support, dtype=jnp.int32)
            )
        raise ValueError(upto)

    def stage_recse(didx, reads, lens):
        from rapmap_tpu.ops.collate import collate_records_se
        from rapmap_tpu.ops.wire import rec_spec_se

        hits = scan_dispatch(didx, st, reads, lens, cfg)
        se, fl = collate_records_se(
            didx, st, hits, lens, cfg, cfg.rec_slots * reads.shape[0],
            rec_spec=rec_spec_se(st, cfg),
        )
        return (
            jnp.sum(se.recs[:, 0], dtype=jnp.int32)
            + jnp.sum(se.counts, dtype=jnp.int32)
            + jnp.sum(fl.mapped, dtype=jnp.int32)
        )

    def stage_core(didx, reads, lens):
        hits = scan_dispatch(didx, st, reads, lens, cfg)
        c = _collate_core(didx, st, hits, lens, cfg)
        return (
            jnp.sum(c.keep, dtype=jnp.int32)
            + jnp.sum(c.counts, dtype=jnp.int32)
            + jnp.sum(c.p2, dtype=jnp.int32)
        )

    def chunked(fn):
        def run(didx_arg, all_reads):
            def body(acc, chunk_reads):
                return acc + fn(didx_arg, chunk_reads, jnp.asarray(lens_np)), 0

            acc, _ = lax.scan(body, jnp.int32(0), all_reads)
            return acc

        jfn = jax.jit(run)
        return lambda x: jfn(didx, x)

    def timeit(name, jfn, feed):
        xs = []
        for rep in range(REPS + 1):
            x = feed(rep)
            x.block_until_ready()
            xs.append(x)
        t0 = time.time()
        r0 = np.asarray(jfn(xs[0]))
        print(f"# {name}: compile+first {time.time()-t0:.1f}s chk={int(r0)}",
              file=sys.stderr, flush=True)
        best = []
        for x in xs[1:]:
            t0 = time.time()
            np.asarray(jfn(x))
            best.append(time.time() - t0)
        dt = min(best)
        print(f"{name:10s} {dt*1e3:8.1f} ms/{B} reads  {dt/B*1e6:6.2f} us/read",
              flush=True)
        return dt

    def feed(rep):
        lo = (rep * B) % (len(codes) - B)
        return jnp.asarray(codes[lo : lo + B].reshape(NCH, C, L))

    t_pack = timeit("pack", chunked(stage_pack), feed)
    t_keys = timeit("keys", chunked(stage_keys), feed)
    t_lookup = timeit("lookup", chunked(stage_lookup), feed)
    t_scan = timeit("scan", chunked(stage_scan), feed)
    t_exp = timeit("expand", chunked(lambda dx, r, l: collate_sub(dx, r, l, "expand")), feed)
    t_vote = timeit("vote", chunked(lambda dx, r, l: collate_sub(dx, r, l, "vote")), feed)
    t_core = timeit("core", chunked(stage_core), feed)
    t_rec = timeit("recse", chunked(stage_recse), feed)

    # full chunked wire program (adds input unpack + counters + wire pack)
    from rapmap_tpu.models.quasi import map_batch_se_wire_chunked
    from rapmap_tpu.ops.wire import pack_in_se

    capc = mapper._cap(C)
    _jw = jax.jit(lambda dx, w: jnp.sum(
        map_batch_se_wire_chunked(dx, st, w, cfg, capc, B, L, C)[:8],
        dtype=jnp.int32,
    ))

    def feed_w(rep):
        lo = (rep * B) % (len(codes) - B)
        return jnp.asarray(pack_in_se(
            codes[lo : lo + B], np.full(B, L, dtype=np.int32), B))

    t_wire = timeit("wirese", lambda w: _jw(didx, w), feed_w)

    print("# fine breakdown:", flush=True)
    for nm, dt in (
        ("pack+nb", t_pack),
        ("key ALU", t_keys - t_pack),
        ("probe gathers", t_lookup - t_keys),
        ("anchor walk", t_scan - t_lookup),
        ("expand", t_exp - t_scan),
        ("sort1+support", t_vote - t_exp),
        ("best+filters", t_core - t_vote),
        ("records+counts", t_rec - t_core),
        ("unpack+wire", t_wire - t_rec),
        ("TOTAL core", t_core),
        ("TOTAL wire", t_wire),
    ):
        print(f"#   {nm:16s} {dt/B*1e6:6.2f} us/read", flush=True)


if __name__ == "__main__":
    main()
