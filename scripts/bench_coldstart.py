"""Cold-start cost of a fresh mapping process (VERDICT r3 item 5).

The single worst user-facing number in round 3 was 373.8 s compile+first-batch
on the bench day: every fresh `tqm quasimap` process pays the full XLA compile
even though the program is byte-identical run to run. JAX's persistent
compilation cache (`jax_compilation_cache_dir`, wired in utils/jaxenv.setup)
should make the SECOND process's cold start a disk read.

This script measures exactly that, in fresh subprocesses sharing one cache
dir (default: a throwaway under /tmp so the measurement is not polluted by
earlier sessions' entries; pass --cache-dir /root/.cache/jax to measure the
production path):

  run 1: purged cache -> true cold compile+first-batch seconds
  run 2: same program, new process -> persistent-cache hit (or miss) seconds

Pass threshold (VERDICT): run 2 < 60 s. Prints one JSON line with both
timings and the cache-dir entry count between runs, so a remote-compile stack
that defeats the cache (entries stay 0, or run2 ~= run1) is a recorded
measured-negative, not a guess.

Usage: python scripts/bench_coldstart.py [--batch 32768] [--cache-dir DIR]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, os, sys, time
sys.path.insert(0, {repo!r})
t_proc0 = time.time()
from rapmap_tpu.utils.jaxenv import setup
setup(cache_dir={cache!r})
import numpy as np
sys.path.insert(0, os.path.join({repo!r}, "scripts")) if False else None
import bench  # repo-root bench world builders

idx, codes = bench.build_world()
from rapmap_tpu.config import MapConfig
from rapmap_tpu.models.quasi import QuasiMapper

BATCH = {batch}
cfg = MapConfig(k=idx.k, chunk=bench.CHUNK if BATCH > bench.CHUNK else 0)
mapper = QuasiMapper(idx, cfg)
lens = np.full(BATCH, bench.READ_LEN, dtype=np.int32)
t0 = time.time()
wr = mapper.fetch(mapper.map_se_async(codes[:BATCH], lens))
t_first = time.time() - t0
print(json.dumps({{
    "first_batch_s": round(t_first, 1),
    "proc_total_s": round(time.time() - t_proc0, 1),
    "mapped": int(wr.counters["reads_mapped"]),
}}))
"""


def run_child(cache_dir: str, batch: int, timeout: int) -> dict:
    code = CHILD.format(repo=REPO, cache=cache_dir, batch=batch)
    t0 = time.time()
    p = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=timeout, cwd=REPO,
    )
    wall = time.time() - t0
    if p.returncode != 0:
        print(p.stderr[-2000:], file=sys.stderr)
        raise SystemExit(f"child failed rc={p.returncode}")
    out = json.loads(p.stdout.strip().splitlines()[-1])
    out["wall_s"] = round(wall, 1)
    return out


def cache_entries(cache_dir: str) -> int:
    if not os.path.isdir(cache_dir):
        return 0
    return sum(len(fs) for _, _, fs in os.walk(cache_dir))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=32768)
    ap.add_argument("--cache-dir", default="/tmp/tqm_coldstart_cache")
    ap.add_argument("--keep-cache", action="store_true",
                    help="skip the run-1 purge (measure a pre-warmed dir)")
    ap.add_argument("--timeout", type=int, default=1800)
    args = ap.parse_args()

    if not args.keep_cache and os.path.isdir(args.cache_dir):
        shutil.rmtree(args.cache_dir)

    print(f"# run 1 (cold cache at {args.cache_dir})", file=sys.stderr, flush=True)
    r1 = run_child(args.cache_dir, args.batch, args.timeout)
    n_entries = cache_entries(args.cache_dir)
    print(f"# run 1: first batch {r1['first_batch_s']}s, "
          f"cache entries now {n_entries}", file=sys.stderr, flush=True)

    print("# run 2 (fresh process, warm persistent cache)", file=sys.stderr,
          flush=True)
    r2 = run_child(args.cache_dir, args.batch, args.timeout)
    print(f"# run 2: first batch {r2['first_batch_s']}s", file=sys.stderr,
          flush=True)

    print(json.dumps({
        "metric": "coldstart_first_batch_s",
        "run1_cold_s": r1["first_batch_s"],
        "run1_proc_total_s": r1["proc_total_s"],
        "run2_warm_s": r2["first_batch_s"],
        "run2_proc_total_s": r2["proc_total_s"],
        "cache_entries_after_run1": n_entries,
        "cache_dir": args.cache_dir,
        "batch": args.batch,
        "pass_under_60s": r2["first_batch_s"] < 60.0,
    }))


if __name__ == "__main__":
    main()
