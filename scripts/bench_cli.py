"""CLI end-to-end bench: gzip-free FASTQ in -> SAM out through `tqm quasimap`.

bench.py measures the engine pipeline without SAM emission; the reference's
quasimap always writes SAM, so this is the apples-to-apples number: native
FASTQ parse (+ producer prefetch), device mapping, native SAM formatting,
file write — wall-clocked through the real CLI process.
"""

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import CACHE, PROVISIONAL_BASELINE_READS_PER_S, build_world  # noqa: E402

B2C = np.frombuffer(b"\0ACGTN", dtype=np.uint8)


def main() -> None:
    idx, codes = build_world()  # ensures the cached index exists
    fq = os.path.join(CACHE, "reads_v3.fq")
    if not os.path.exists(fq):
        t0 = time.time()
        n, L = codes.shape
        qual = b"I" * L
        with open(fq, "wb") as f:
            chars = B2C[np.clip(codes, 0, 5)]
            for i in range(n):
                f.write(b"@r%d\n%s\n+\n%s\n" % (i, chars[i].tobytes(), qual))
        print(f"# fastq written ({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
    n_reads = len(codes)

    out_sam = os.path.join(CACHE, "bench_cli_out.sam")
    stats = os.path.join(CACHE, "bench_cli_stats.json")
    cmd = [
        sys.executable, "-m", "rapmap_tpu.cli", "quasimap",
        "-i", os.path.join(CACHE, "idx_v1"), "-r", fq, "-o", out_sam,
        "--batchSize", "65536", "--chunkSize", "8192", "--pipelineDepth", "6",
        "--expandBudget", "3", "-t", "2", "--statsJson", stats,
    ]
    t0 = time.time()
    res = subprocess.run(cmd, capture_output=True, text=True,
                         cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    dt = time.time() - t0
    sys.stderr.write(res.stderr[-1500:])
    if res.returncode != 0:
        raise SystemExit(f"CLI failed rc={res.returncode}")
    sam_bytes = os.path.getsize(out_sam)
    with open(stats) as f:
        totals = json.load(f)
    # the steady-state rate (post first-batch jit compile) is the production
    # number; wall_s shows the whole process incl. compile for honesty
    steady = totals.get("steady_reads_per_s", n_reads / dt)
    print(json.dumps({
        "metric": "quasimap_cli_fastq_to_sam_reads_per_s",
        "value": round(steady, 1),
        "unit": "reads/s",
        "vs_baseline": round(steady / PROVISIONAL_BASELINE_READS_PER_S, 3),
        "wall_s": round(dt, 1),
        "whole_process_reads_per_s": round(n_reads / dt, 1),
        "map_rate_pct": round(
            100.0 * totals.get("reads_mapped", 0) / max(totals.get("reads_total", 1), 1), 2
        ),
        "sam_mb": round(sam_bytes / 1e6, 1),
    }))
    os.unlink(out_sam)


if __name__ == "__main__":
    main()
