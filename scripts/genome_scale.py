"""Genome-scale (>= 2^31 chars) build + map on ONE chip via the host-staged
sharded engine (VERDICT r2 item 2; upstream:src/RapMapSAIndexer.cpp
divsufsort64 bigSA regime, SURVEY.md §3.1/§5.7).

Builds a ~2.2 Gbase synthetic transcriptome (forcing the int64 SA + int64
k-mer-interval layout), maps read batches with parallel/staged.StagedMapper
(sequential shard residency: the 50+ GB index never has to fit the 16 GB
HBM), and verifies a read sample bit-exactly against the host oracle.

Memory plan (125 GB host): text 2.2 + SA 17.6 + kmer (hi/lo/b/e) 52 +
sa_txp/sa_tpos 17.6 + text2b 0.6 ~= 90 GB live; per-shard staging adds a
~5 GB transient. Run alone.

Usage: python scripts/genome_scale.py [--gbase 2.2] [--shards 12]
       [--reads 32768] [--batch 8192] [--oracle-sample 96]
"""

import argparse
import logging
import os
import resource
import sys
import time

# surface the staged mapper's per-shard INFO lines (slice/upload/device/union
# seconds) — without this a 48-shard sweep is a silent half hour
logging.basicConfig(level=logging.INFO, stream=sys.stderr,
                    format="%(asctime)s %(name)s: %(message)s")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from rapmap_tpu.utils.jaxenv import setup as _setup  # noqa: E402

_setup()

READ_LEN = 76


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def rss_gb():
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


def gen_fasta(path: str, target_chars: int, seed: int = 5):
    rng = np.random.default_rng(seed)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    total = 0
    i = 0
    with open(path, "w") as f:
        while total < target_chars:
            L = int(np.clip(rng.lognormal(9.5, 0.8), 2_000, 200_000))
            seq = bases[rng.integers(0, 4, L)].tobytes().decode()
            f.write(f">g{i}\n{seq}\n")
            total += L
            i += 1
    return i, total


def load_or_repair_index(idx_dir: str, fasta_path: str):
    """Load the saved index; if derivable arrays were dropped (e.g. deleted to
    free disk after the round-3 save — text/text2b/sa_txp/sa_tpos/offsets are
    all reconstructible from FASTA + the saved SA), rebuild them in RAM and
    verify bit-exactness against the header's content hashes before mapping."""
    from rapmap_tpu.index.format import (
        _QUASI_ARRAYS, QuasiIndex, _sha, load_header, load_index,
    )

    header = load_header(idx_dir)
    missing = [
        n for n in _QUASI_ARRAYS
        if not os.path.exists(os.path.join(idx_dir, f"{n}.npy"))
    ]
    names_missing = not os.path.exists(os.path.join(idx_dir, "txp_names.txt"))
    if not missing and not names_missing:
        return load_index(idx_dir, mmap=True)
    if "sa" in missing or any(n.startswith("kmer") for n in missing):
        raise FileNotFoundError(
            f"index at {idx_dir} is missing non-derivable arrays: {missing}"
        )
    log(f"index incomplete (missing {missing}); reconstructing from FASTA + SA")
    from rapmap_tpu.index.builder import _sa_txp_of, concat_transcriptome
    from rapmap_tpu.index.kmer_table import pack_text_2bit

    t0 = time.time()
    text, n_text, names, offsets, lens = concat_transcriptome(
        fasta_path, seed=header["seed"], dedup=True
    )
    assert n_text == header["n_text"], (n_text, header["n_text"])
    arrays = {"text": text, "txp_offsets": offsets, "txp_lens": lens}
    log(f"concat reconstructed: {n_text:,} bases ({time.time()-t0:.0f}s)")
    if "text2b" in missing:
        arrays["text2b"], _ = pack_text_2bit(text)
    sa = np.load(os.path.join(idx_dir, "sa.npy"), mmap_mode="r")
    if "sa_txp" in missing or "sa_tpos" in missing:
        t0 = time.time()
        sa_txp = _sa_txp_of(sa, offsets, lens)
        if np.asarray(sa).dtype == np.int32:
            sa_tpos = np.asarray(sa) - offsets.astype(np.int32)[sa_txp]
        else:
            sa_tpos = (np.asarray(sa) - offsets[sa_txp]).astype(np.int32)
        arrays["sa_txp"], arrays["sa_tpos"] = sa_txp, sa_tpos
        log(f"sa_txp/sa_tpos rederived ({time.time()-t0:.0f}s)")
    t0 = time.time()
    for n in missing:
        got = _sha(np.ascontiguousarray(arrays[n]))
        want = header["hashes"][n]
        if got != want:
            raise ValueError(f"reconstructed {n} hash {got} != saved {want}")
    log(f"reconstruction verified bit-exact vs header hashes ({time.time()-t0:.0f}s)")
    present = {
        n: np.load(os.path.join(idx_dir, f"{n}.npy"), mmap_mode="r")
        for n in _QUASI_ARRAYS if n not in missing
    }
    return QuasiIndex(
        k=header["k"], txp_names=names, seed=header["seed"],
        meta=header.get("meta", {}), n_text=header["n_text"],
        prefix_bases=header["prefix_bases"], **present, **arrays,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--gbase", type=float, default=2.2)
    ap.add_argument("--shards", type=int, default=12)
    ap.add_argument("--reads", type=int, default=32768)
    ap.add_argument("--batch", type=int, default=8192)
    ap.add_argument("--oracle-sample", type=int, default=96)
    ap.add_argument("--workdir", default="/tmp/tqm_genome")
    ap.add_argument("--allow-small", action="store_true",
                    help="smoke mode: skip the >= 2^31 size assertions")
    ap.add_argument("--save-index", action="store_true",
                    help="save the built index under workdir/idx (~90 GB on "
                         "disk) so a mapping-phase retry — e.g. after a TPU "
                         "tunnel outage — skips the ~45 min rebuild")
    ap.add_argument("--overlap-upload", action="store_true",
                    help="pipeline shard p+1's slice+upload under shard p's "
                         "device+union phase (second resident shard on "
                         "device; pays at high queue depth where the device "
                         "phase is tens of seconds per shard)")
    ap.add_argument("--save-core", action="store_true",
                    help="additionally write the compact quasi_core artifact "
                         "(~11 GB: text + uint32 SA + txp geometry) under "
                         "workdir/core — fits tight disk budgets; reload "
                         "re-derives + hash-verifies the k-mer table "
                         "(scripts/core_artifact_genome.py measures it)")
    ap.add_argument("--json-out", default=None,
                    help="write the full machine-readable run artifact "
                         "(per-shard timings, amortized throughput, upload "
                         "bandwidth ceiling, oracle verdict) to this path")
    args = ap.parse_args()

    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.index.builder import build_quasi_index
    from rapmap_tpu.index.format import load_index, save_index
    from rapmap_tpu.oracle import quasimap as qm
    from rapmap_tpu.parallel.staged import StagedMapper

    os.makedirs(args.workdir, exist_ok=True)
    fa = os.path.join(args.workdir, "genome.fa")
    idx_dir = os.path.join(args.workdir, "idx")
    target = int(args.gbase * 1e9)
    assert args.allow_small or target >= 2**31, (
        "this demo exists to exercise the >= 2^31 regime"
    )

    t0 = time.time()
    if not os.path.exists(fa) or os.path.getsize(fa) < target:
        n_seq, total = gen_fasta(fa, target)
        log(f"fasta: {n_seq} seqs, {total/1e9:.2f} Gbase ({time.time()-t0:.0f}s)")

    t0 = time.time()
    if os.path.exists(os.path.join(idx_dir, "header.json")):
        idx = load_or_repair_index(idx_dir, fa)
        t_build = time.time() - t0
        log(f"index loaded from {idx_dir} ({t_build:.0f}s, mmap)")
    else:
        idx = build_quasi_index(
            fa, outdir=idx_dir if args.save_index else None, k=31,
            with_chd=False,
        )
        t_build = time.time() - t0
        if args.save_index:
            # drop the ~90 GB in-RAM build and remap it file-backed: the
            # 48-shard sweep adds ~0.6-0.8 GB/shard of host-staging anon RSS
            # (round 4: OOM kill at shard ~40 when mapping straight off the
            # in-RAM copy), and mmap pages are reclaimable under pressure
            import gc

            del idx
            gc.collect()
            idx = load_index(idx_dir, mmap=True)
            log("build dropped from RAM; remapped file-backed for the sweep")
    n_text = idx.n_text
    sa_dtype = np.asarray(idx.sa).dtype
    log(f"index built: n_text={n_text:,} ({n_text/2**31:.2f} x 2^31), "
        f"SA dtype {sa_dtype}, {len(idx.kmer_b):,} k-mers, "
        f"{t_build:.0f}s, peak RSS {rss_gb():.1f} GB")
    assert args.allow_small or (n_text >= 2**31 and sa_dtype == np.int64)

    if args.save_core:
        from rapmap_tpu.index.format import save_core_index

        t0 = time.time()
        info = save_core_index(idx, os.path.join(args.workdir, "core"))
        log(f"core artifact: {info['bytes']/2**30:.2f} GB in "
            f"{time.time()-t0:.0f}s under {args.workdir}/core")

    # reads sampled from the text (1% error), full length
    rng = np.random.default_rng(6)
    text = np.asarray(idx.text[:n_text])
    n_reads = args.reads
    codes = np.empty((n_reads, READ_LEN), np.int8)
    starts = rng.integers(0, n_text - READ_LEN, size=n_reads)
    for i, p in enumerate(starts):
        w = text[p : p + READ_LEN].copy()
        bad = w < 1
        if bad.any():
            w[bad] = rng.integers(1, 5, int(bad.sum()))
        nerr = rng.binomial(READ_LEN, 0.01)
        if nerr:
            pos = rng.integers(0, READ_LEN, nerr)
            w[pos] = rng.integers(1, 5, nerr)
        codes[i] = w
    half = n_reads // 2
    rcb = codes[:half]
    codes[:half] = np.where((rcb >= 1) & (rcb <= 4), 5 - rcb, rcb)[:, ::-1].astype(np.int8)
    del text

    cfg = MapConfig(k=31, max_hits_per_strand=8)
    sm = StagedMapper(idx, cfg, n_shards=args.shards,
                      read_len=READ_LEN, batch=args.batch)
    # resumable sweep: a relay wedge (or OOM/cut session) strands an hour of
    # shard work otherwise; geometry + the read set are deterministic, so a
    # relaunch resumes at the last snapshot (removed on sweep completion)
    sm.checkpoint_path = os.path.join(args.workdir, "sweep_ckpt.npz")
    sm.checkpoint_every = 4
    sm.upload_overlap = args.overlap_upload
    geo = sm.geo
    log(f"geometry: {args.shards} shards, S_pad={geo.S_pad:,} slots "
        f"(per-shard sa_cmp ~{geo.S_pad*6*4/1e9:.1f} GB)")

    batches = [codes[i : i + args.batch] for i in range(0, n_reads, args.batch)]
    t0 = time.time()
    results, stats = sm.map_batches(batches)
    t_map = time.time() - t0
    mapped = sum(sum(1 for r in batch_out if r) for batch_out in results)
    # amortized accounting (VERDICT r4 item 4): the shard-upload cost is
    # FIXED per sweep — reads/s at queue depth N amortizes it; the upload
    # bandwidth is the explicit ceiling of the one-chip staged path
    timings = list(getattr(sm, "shard_timings", []))
    t_upload = sum(t["upload_s"] for t in timings)
    t_slice = sum(t["slice_s"] for t in timings)
    t_dev = sum(t["device_union_s"] for t in timings)
    up_mb = sum(t["upload_mb"] for t in timings)
    log(f"mapped {mapped}/{n_reads} reads "
        f"({100.0*mapped/n_reads:.1f}%) in {t_map:.1f}s "
        f"= {n_reads/t_map:,.0f} reads/s amortized at depth {n_reads:,} "
        f"(upload {t_upload:.0f}s = {up_mb/max(t_upload,1e-9):,.0f} MB/s "
        f"ceiling, device+union {t_dev:.0f}s, slice {t_slice:.0f}s "
        f"overlapped); stats={stats}; peak RSS {rss_gb():.1f} GB")

    # oracle parity on a sample. Free the staged mapper (and its tunnel-client
    # staging residue) first: the sweep ends near the host's memory ceiling
    # and the round-4 first attempt was OOM-killed right here (the oracle's
    # key64 cache is also gated off at this scale now — oracle/quasimap).
    import gc

    del sm
    gc.collect()
    t0 = time.time()
    ns = min(args.oracle_sample, n_reads)
    sel = rng.choice(n_reads, ns, replace=False)
    bad = 0
    for i in sel:
        bi, ri = divmod(int(i), args.batch)
        want = [(m.txp, m.pos, 0 if m.fwd else 1, m.score)
                for m in qm.map_read(idx, codes[i], cfg)]
        if results[bi][ri] != want:
            bad += 1
            log(f"MISMATCH read {i}: staged {results[bi][ri][:3]} oracle {want[:3]}")
    log(f"oracle parity: {ns - bad}/{ns} reads exact ({time.time()-t0:.0f}s)")
    import json

    out = {
        "metric": "genome_scale_staged",
        "n_text": int(n_text),
        "build_s": round(t_build, 1),
        "queue_depth": int(n_reads),
        "map_reads_per_s_amortized": round(n_reads / t_map, 1),
        "map_rate_pct": round(100.0 * mapped / n_reads, 2),
        "map_wall_s": round(t_map, 1),
        "upload_s_total": round(t_upload, 1),
        "upload_gb_total": round(up_mb / 1024, 2),
        "upload_MBps_ceiling": round(up_mb / max(t_upload, 1e-9), 1),
        "device_union_s_total": round(t_dev, 1),
        "slice_s_total_overlapped": round(t_slice, 1),
        "n_shards": int(args.shards),
        "batch": int(args.batch),
        "anchor_overflow": int(stats.get("anchor_overflow", 0)),
        "oracle_parity": f"{ns - bad}/{ns}",
        "peak_rss_gb": round(rss_gb(), 1),
    }
    print(json.dumps(out))
    if args.json_out:
        out["shard_timings"] = timings
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
        log(f"artifact written to {args.json_out}")
    if bad:
        raise SystemExit("oracle parity failed")


if __name__ == "__main__":
    main()
