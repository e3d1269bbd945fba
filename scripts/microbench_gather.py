"""Microbench: gather cost vs row width, and sort cost vs key packing.

Informs two round-2 optimizations:
  * CHD probe row layout (current chd_rows row = 24 B; is >16 B a 2x unit?)
  * collate's two lax.sort calls (3-4 int32 keys vs one packed uint64 key)

Method per the axon rules: lax.scan over NCH fresh index sets inside one
dispatch (amortize tunnel RTT), fresh random inputs per rep, numpy constants
only, didx-style tables passed as jit ARGUMENTS.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

N_ROWS = 1 << 22          # 4M-row table (HBM-resident, cache-hostile)
N_IDX = 1 << 19           # 512k gathers per scan step
NCH = 8
REPS = 3
SORT_N = 1 << 16          # collate pool size at C=8192 (CAPG = 8*8192)


def timeit(name, jfn, feed, per, unit):
    t0 = time.time()
    r0 = np.asarray(jfn(feed(0)))
    sys.stderr.write(f"# {name}: compile+first {time.time()-t0:.1f}s chk={r0!r}\n")
    sys.stderr.flush()
    best = []
    for rep in range(1, REPS + 1):
        x = feed(rep)
        t0 = time.time()
        np.asarray(jfn(x))
        best.append(time.time() - t0)
    dt = min(best)
    print(f"{name:24s} {dt*1e3:8.2f} ms  {dt/per*1e9:8.2f} ns/{unit}", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    # ---- gather width sweep -------------------------------------------------
    for ncol in (1, 2, 3, 4, 5, 6, 8):
        tbl = jnp.asarray(rng.integers(0, 1 << 30, (N_ROWS, ncol), dtype=np.int32))

        def run(tbl_arg, all_idx):  # (NCH, N_IDX) int32
            def body(acc, idx):
                v = jnp.take(tbl_arg, idx, axis=0, mode="clip")  # (N_IDX, ncol)
                return acc + jnp.sum(v[:, 0], dtype=jnp.int32) + jnp.sum(v[:, -1], dtype=jnp.int32), 0

            acc, _ = lax.scan(body, jnp.int32(0), all_idx)
            return acc

        jfn = jax.jit(run)

        def feed(rep, tbl=tbl, jfn=jfn):
            return rng.integers(0, N_ROWS, (NCH, N_IDX), dtype=np.int32)

        timeit(f"gather {4*ncol:2d}B row", lambda x, j=jfn, t=tbl: j(t, x), feed,
               NCH * N_IDX, "idx")

    # ---- sort: 3x int32 keys vs 1x uint64 packed key ------------------------
    def feed_sort(rep):
        a = rng.integers(0, 1 << 13, (NCH, SORT_N), dtype=np.int32)
        b = rng.integers(0, 1 << 16, (NCH, SORT_N), dtype=np.int32)
        c = rng.integers(0, 1 << 17, (NCH, SORT_N), dtype=np.int32)
        return a, b, c

    def run_sort3(args):
        a, b, c = args

        def body(acc, abc):
            x, y, z = abc
            k1, k2, k3 = lax.sort([x, y, z], dimension=0, num_keys=3)
            return acc + k1[0] + k2[0] + k3[0], 0

        acc, _ = lax.scan(body, jnp.int32(0), (a, b, c))
        return acc

    def run_sort4(args):
        a, b, c = args

        def body(acc, abc):
            x, y, z = abc
            k1, k2, k3, k4 = lax.sort([x, y, z, x], dimension=0, num_keys=4)
            return acc + k1[0] + k2[0] + k3[0] + k4[0], 0

        acc, _ = lax.scan(body, jnp.int32(0), (a, b, c))
        return acc

    def run_sort1(args):
        a, b, c = args

        def body(acc, abc):
            x, y, z = abc
            key = (
                x.astype(jnp.uint64) << np.uint64(33)
            ) | (y.astype(jnp.uint64) << np.uint64(17)) | z.astype(jnp.uint64)
            (ks,) = lax.sort([key], dimension=0, num_keys=1)
            return acc + ks[0].astype(jnp.int32), 0

        acc, _ = lax.scan(body, jnp.int32(0), (a, b, c))
        return acc

    def run_sort1_payload(args):
        a, b, c = args

        def body(acc, abc):
            x, y, z = abc
            key = (
                x.astype(jnp.uint64) << np.uint64(33)
            ) | (y.astype(jnp.uint64) << np.uint64(17)) | z.astype(jnp.uint64)
            ks, p1 = lax.sort([key, z], dimension=0, num_keys=1)
            return acc + ks[0].astype(jnp.int32) + p1[0], 0

        acc, _ = lax.scan(body, jnp.int32(0), (a, b, c))
        return acc

    for name, fn in (
        ("sort 3-key int32", run_sort3),
        ("sort 4-key int32", run_sort4),
        ("sort 1-key u64", run_sort1),
        ("sort 1-key u64+payload", run_sort1_payload),
    ):
        jfn = jax.jit(fn)
        timeit(name, jfn, feed_sort, NCH * SORT_N, "elem")


if __name__ == "__main__":
    main()
