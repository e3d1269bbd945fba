"""One-off TPU perf experiment driver for the chunked wire path.

Usage: python scripts/perf_experiment.py B C [depth]
Prints compile time, sync step time, and pipelined reads/s.
"""

from __future__ import annotations

import os
import sys
import time
from collections import deque

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rapmap_tpu.utils.jaxenv import setup as _jax_setup

_jax_setup()

import numpy as np


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    C = int(sys.argv[2]) if len(sys.argv) > 2 else 8192
    depth = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    import bench

    idx, codes = bench.build_world()
    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.models.quasi import QuasiMapper

    cfg = MapConfig(k=idx.k, chunk=C)
    mapper = QuasiMapper(idx, cfg)
    L = bench.READ_LEN
    lens = np.full(B, L, np.int32)
    n = codes.shape[0]

    t0 = time.perf_counter()
    wr = mapper.fetch(mapper.map_se_async(codes[:B], lens))
    print(f"compile+first B={B} C={C}: {time.perf_counter()-t0:.1f}s "
          f"mapped {wr.counters['reads_mapped']}/{B}", flush=True)

    # sync steps, fresh inputs
    for rep in range(3):
        i0 = (rep + 1) * B % max(n - B, 1)
        t0 = time.perf_counter()
        wr = mapper.fetch(mapper.map_se_async(codes[i0 : i0 + B], lens))
        dt = time.perf_counter() - t0
        print(f"sync step: {dt*1e3:.0f} ms = {B/dt:,.0f} reads/s", flush=True)

    # pipelined
    n_batches = max(2 * depth, (2_000_000 // B))
    q: deque = deque()
    total = 0
    t0 = time.perf_counter()
    for i in range(n_batches):
        i0 = (i * B) % max(n - B, 1)
        q.append(mapper.map_se_async(codes[i0 : i0 + B], lens))
        if len(q) >= depth:
            mapper.fetch(q.popleft())
            total += B
    while q:
        mapper.fetch(q.popleft())
        total += B
    dt = time.perf_counter() - t0
    print(f"pipelined depth={depth}: {total} reads in {dt:.2f}s = "
          f"{total/dt:,.0f} reads/s", flush=True)


if __name__ == "__main__":
    main()
