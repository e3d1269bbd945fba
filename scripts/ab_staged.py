"""Same-process A/B of the staged (width-compacted) extension bound search
vs the plain early-exit loop, on the isoform bench world. Interleaved reps
cancel tunnel drift; reports per-variant medians."""

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rapmap_tpu.utils.jaxenv import setup as _setup

_setup()

from bench import CHUNK, N_READS, READ_LEN, build_isoform_world  # noqa: E402

import rapmap_tpu.ops.extend_packed as ep  # noqa: E402
from rapmap_tpu.config import MapConfig  # noqa: E402
from rapmap_tpu.models.quasi import QuasiMapper  # noqa: E402


def run_pass(mapper, codes, lens, batch):
    from collections import deque

    submit = lambda lo: mapper.map_se_async(codes[lo : lo + batch], lens)
    q = deque()
    t0 = time.time()
    total = 0
    for i in range(max(1, N_READS // batch)):
        if (i + 1) * batch > len(codes):
            break
        q.append(submit(i * batch))
        if len(q) >= 6:
            mapper.fetch(q.popleft())
            total += batch
    while q:
        mapper.fetch(q.popleft())
        total += batch
    return total / (time.time() - t0)


def main():
    batch = 32768
    idx, codes = build_isoform_world()
    cfg = MapConfig(
        k=idx.k, chunk=CHUNK if batch > CHUNK else 0,
        max_hits_per_strand=4, expand_budget=0, max_out=32, rec_slots=4,
    )
    lens = np.full(batch, READ_LEN, dtype=np.int32)

    mappers = {}
    for name, thresh in (("plain", 1 << 30), ("staged", 1024)):
        ep._STAGE_MIN_WIDTH = thresh
        m = QuasiMapper(idx, cfg)
        t0 = time.time()
        m.fetch(m.map_se_async(codes[:batch], lens))
        print(f"# {name}: compile+first {time.time()-t0:.1f}s", file=sys.stderr)
        mappers[name] = (m, thresh)

    res = {"plain": [], "staged": []}
    for rep in range(4):
        for name in ("plain", "staged"):
            m, thresh = mappers[name]
            ep._STAGE_MIN_WIDTH = thresh  # harmless (already compiled)
            r = run_pass(m, codes, lens, batch)
            res[name].append(r)
            print(f"# rep{rep} {name}: {r/1e3:.1f}k reads/s", file=sys.stderr)
    for name, v in res.items():
        print(f"{name}: median {statistics.median(v)/1e3:.1f}k "
              f"min {min(v)/1e3:.1f}k max {max(v)/1e3:.1f}k")


if __name__ == "__main__":
    main()
