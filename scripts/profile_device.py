"""Device-side stage profiling: split per-batch cost into transfer, scan,
collate+compact, and end-to-end wire step (VERDICT round-1 item 1).

Usage: python scripts/profile_device.py [BATCH ...]

Timing rules for this runtime (memory/axon-tpu-quirks): identical repeated
inputs are memoized server-side, so every timed call uses a fresh input
buffer; results are fetched with np.asarray (single buffer).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from rapmap_tpu.utils.jaxenv import setup as _jax_setup

_jax_setup()

import jax
import jax.numpy as jnp
import numpy as np

READ_LEN = 76
REPS = 5


def timed(label, fn, reps=REPS):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    best = min(ts)
    med = sorted(ts)[len(ts) // 2]
    print(f"  {label:<28} best {best*1e3:8.1f} ms   median {med*1e3:8.1f} ms")
    return best


def main():
    batches = [int(a) for a in sys.argv[1:]] or [16384]
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import bench

    idx, codes = bench.build_world()
    from functools import partial

    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.models.quasi import QuasiMapper, map_batch_se_wire
    from rapmap_tpu.ops import encode as denc
    from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic
    from rapmap_tpu.ops.mmp import scan_batch
    from rapmap_tpu.ops.wire import pack_in_se

    cfg = MapConfig(k=idx.k)
    mapper = QuasiMapper(idx, cfg)
    didx, st = mapper.didx, mapper.st

    @partial(jax.jit, static_argnames=("st", "cfg"))
    def scan_only(didx, st, reads, lens, cfg):
        lanes = jnp.concatenate([reads, denc.revcomp_batch(reads, lens)], axis=0)
        lens2 = jnp.concatenate([lens, lens])
        h = scan_batch(didx, st, lanes, lens2, cfg)
        # reduce to a scalar so nothing big ships back
        return h.n.sum() + h.l.sum() + h.b.sum() + h.e.sum()

    @jax.jit
    def h2d_consume(w):
        return w.astype(jnp.int32).sum()

    for B in batches:
        print(f"== B={B} ==")
        lens = np.full(B, READ_LEN, np.int32)
        pool = codes[: B * (REPS + 2)].reshape(-1, B, READ_LEN)
        cap = 4 * B

        # end-to-end wire step (compile first)
        it = iter(range(100))

        def wire_step():
            i = next(it) % pool.shape[0]
            win = pack_in_se(pool[i], lens, B)
            out = map_batch_se_wire(didx, st, jnp.asarray(win), cfg, cap, B, READ_LEN)
            return np.asarray(out)

        t0 = time.perf_counter()
        wire_step()
        print(f"  compile+first(e2e wire)      {time.perf_counter()-t0:8.1f} s")
        t_e2e = timed("e2e wire step (sync)", wire_step)

        # transfer-only: h2d of the same wire buffer + tiny result back
        def h2d_only():
            i = next(it) % pool.shape[0]
            win = pack_in_se(pool[i], lens, B)
            return np.asarray(h2d_consume(jnp.asarray(win)))

        h2d_only()
        t_h2d = timed("h2d wire + tiny fetch", h2d_only)

        # d2h: fetch a cap-row result-sized buffer
        big = jnp.zeros(8 + B + cap * 4, jnp.int32) + jnp.int32(len(pool))

        def d2h_only():
            return np.asarray(big)

        t_d2h = timed("d2h result-size fetch", d2h_only)

        # scan only (device compute of phase 1+2, no collate)
        def scan_step():
            i = next(it) % pool.shape[0]
            r = jnp.asarray(pool[i], jnp.int8)
            return np.asarray(scan_only(didx, st, r, jnp.asarray(lens), cfg))

        t0 = time.perf_counter()
        scan_step()
        print(f"  compile+first(scan)          {time.perf_counter()-t0:8.1f} s")
        t_scan = timed("scan only (sync)", scan_step)

        print(f"  -> collate+compact+pack ~ {max(t_e2e - t_scan, 0)*1e3:.1f} ms "
              f"(e2e - scan, both include transfer ~{t_h2d*1e3:.0f}+{t_d2h*1e3:.0f} ms)")
        print(f"  -> reads/s sync: {B / t_e2e:,.0f}")


if __name__ == "__main__":
    main()
