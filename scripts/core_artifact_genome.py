"""Genome-scale core-artifact measurement (VERDICT r4 item 5 closure).

Takes the existing saved 2.2 Gbase index (scripts/genome_scale.py
--save-index), writes the quasi_core artifact (~11 GB: text + uint32 SA +
txp geometry), then reloads it — re-deriving the 2.196e9-entry k-mer
interval table, prefix LUT and sa_txp/sa_tpos, hash-verified bit-exact —
and reports sizes + timings as a committed run artifact.

RAM plan (125 GB host): the reload materializes text2b 0.6 + sa 17.6 +
kmer hi/lo/b/e 52 + sa_txp/tpos 17.6 ~= 88 GB. Run ALONE (not beside the
staged sweep).

Usage: python scripts/core_artifact_genome.py [--idx /tmp/tqm_genome/idx]
       [--out /tmp/tqm_genome/core] [--json-out runs/core_artifact_r05.json]
"""

import argparse
import json
import os
import resource
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def log(msg):
    print(f"# [{time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--idx", default="/tmp/tqm_genome/idx")
    ap.add_argument("--out", default="/tmp/tqm_genome/core")
    ap.add_argument("--json-out", default=None)
    ap.add_argument("--keep", action="store_true",
                    help="keep the core dir after the measurement")
    args = ap.parse_args()

    from rapmap_tpu.index.format import load_index, save_core_index

    free0 = shutil.disk_usage("/tmp").free
    log(f"free disk before: {free0/2**30:.1f} GB")

    t0 = time.time()
    idx = load_index(args.idx, mmap=True)
    log(f"full index mmap-loaded ({time.time()-t0:.0f}s): "
        f"n_text={idx.n_text:,}, {len(idx.kmer_b):,} k-mers")
    full_bytes = sum(
        os.path.getsize(os.path.join(args.idx, f))
        for f in os.listdir(args.idx) if f.endswith(".npy"))

    t0 = time.time()
    info = save_core_index(idx, args.out)
    t_save = time.time() - t0
    log(f"core artifact written: {info['bytes']/2**30:.2f} GB in {t_save:.0f}s "
        f"(full index on disk: {full_bytes/2**30:.1f} GB)")
    for nm, b in sorted(info["per_array"].items(), key=lambda kv: -kv[1]):
        log(f"  {nm}: {b/2**30:.2f} GB")

    del idx
    import gc

    gc.collect()

    t0 = time.time()
    ridx = load_index(args.out)  # reconstructs + verifies every derived array
    t_reload = time.time() - t0
    peak = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    log(f"core reload (derive + bit-exact hash verify): {t_reload:.0f}s, "
        f"peak RSS {peak:.1f} GB; {len(ridx.kmer_b):,} k-mers rederived")

    out = {
        "artifact": "quasi_core at 2.2 Gbase (VERDICT r4 item 5)",
        "idx_dir": args.idx,
        "full_index_disk_bytes": int(full_bytes),
        "core_disk_bytes": int(info["bytes"]),
        "core_per_array_bytes": {k: int(v) for k, v in info["per_array"].items()},
        "ratio": round(full_bytes / max(info["bytes"], 1), 2),
        "t_save_s": round(t_save, 1),
        "t_reload_verify_s": round(t_reload, 1),
        "peak_rss_gb": round(peak, 1),
        "n_text": int(ridx.n_text),
        "n_kmers": int(len(ridx.kmer_b)),
        "verified": "all stored + derived arrays hash-checked bit-exact",
    }
    print(json.dumps(out))
    if args.json_out:
        os.makedirs(os.path.dirname(args.json_out) or ".", exist_ok=True)
        with open(args.json_out, "w") as f:
            json.dump(out, f, indent=1)
        log(f"artifact written to {args.json_out}")
    if not args.keep:
        shutil.rmtree(args.out)
        log("core dir removed (pass --keep to retain)")


if __name__ == "__main__":
    main()
