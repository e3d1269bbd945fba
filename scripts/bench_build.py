"""Time the 100 Mbase quasi-index build end-to-end (FASTA -> saved index),
with per-stage INFO logs. VERDICT r2 item 7 target: < 60 s on 4 vCPUs.

Reuses bench_scale's cached txome (builds it first if absent). Run on an
otherwise-idle host — the native stages are memory-subsystem sensitive.

Usage: python scripts/bench_build.py [--reps 1] [--no-save]
"""

import argparse
import logging
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench_scale import build_scale_world  # noqa: E402
from bench import CACHE  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=1)
    ap.add_argument("--no-save", action="store_true",
                    help="skip save_index (stage-time the in-memory build)")
    args = ap.parse_args()
    logging.basicConfig(level=logging.INFO, format="# %(message)s")

    fa = os.path.join(CACHE, "txome_scale.fa")
    if not os.path.exists(fa):
        build_scale_world()  # generates + caches the txome (and an index)
    from rapmap_tpu.index.builder import build_quasi_index

    outdir = None if args.no_save else "/tmp/tqm_build_bench_idx"
    times = []
    for r in range(args.reps):
        if outdir and os.path.isdir(outdir):
            shutil.rmtree(outdir)
        t0 = time.time()
        idx = build_quasi_index(fa, outdir=outdir, k=31)
        dt = time.time() - t0
        times.append(dt)
        print(f"# rep{r}: {dt:.1f}s end-to-end ({idx.n_text/1e6:.1f} Mbase, "
              f"{len(idx.kmer_b):,} k-mers)", file=sys.stderr)
    times.sort()
    print({"metric": "quasiindex_build_s_100Mb", "value": round(times[len(times)//2], 1),
           "unit": "s", "min": round(times[0], 1), "max": round(times[-1], 1)})


if __name__ == "__main__":
    main()
