"""Layout hypothesis test: do (R, 46)-shaped elementwise pipelines waste
TPU vector lanes vs (46, R) (minor dim a multiple of 128)?

Times the kmer_keys_batch bit pipeline in both layouts, plus an (R, 16)
vs (16, R) scatter-update loop shaped like the anchor walk's hit buffers.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

R = 8192
L = 76
K = 31
S = L - K + 1
NCH = 8
REPS = 3


def timeit(name, jfn, feed):
    t0 = time.time()
    r0 = np.asarray(jfn(feed(0)))
    sys.stderr.write(f"# {name}: compile+first {time.time()-t0:.1f}s chk={int(r0)}\n")
    best = []
    for rep in range(1, REPS + 1):
        x = feed(rep)
        t0 = time.time()
        np.asarray(jfn(x))
        best.append(time.time() - t0)
    dt = min(best)
    print(f"{name:16s} {dt*1e3:8.1f} ms  {dt/(NCH*R)*1e6:6.3f} us/read", flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def keys_rm(reads):  # (R, L) row-major read-window layout (current engine)
        hi = np.zeros((R, S), dtype=np.uint32)
        lo = np.zeros((R, S), dtype=np.uint32)
        valid = np.ones((R, S), dtype=bool)
        for i in range(K):
            c = reads[:, i : i + S].astype(jnp.int32)
            valid = valid & (c >= 1) & (c <= 4)
            bits = ((c - 1) & 3).astype(jnp.uint32)
            hi = (hi << np.uint32(2)) | (lo >> np.uint32(30))
            lo = (lo << np.uint32(2)) | bits
        return (
            jnp.sum(hi.astype(jnp.int32))
            + jnp.sum(lo.astype(jnp.int32))
            + jnp.sum(valid, dtype=jnp.int32)
        )

    def keys_cm(reads_t):  # (L, R) transposed: minor dim R = 64*128 lanes
        hi = np.zeros((S, R), dtype=np.uint32)
        lo = np.zeros((S, R), dtype=np.uint32)
        valid = np.ones((S, R), dtype=bool)
        for i in range(K):
            c = reads_t[i : i + S, :].astype(jnp.int32)
            valid = valid & (c >= 1) & (c <= 4)
            bits = ((c - 1) & 3).astype(jnp.uint32)
            hi = (hi << np.uint32(2)) | (lo >> np.uint32(30))
            lo = (lo << np.uint32(2)) | bits
        return (
            jnp.sum(hi.astype(jnp.int32))
            + jnp.sum(lo.astype(jnp.int32))
            + jnp.sum(valid, dtype=jnp.int32)
        )

    def chunked(fn):
        def run(all_reads):
            def body(acc, x):
                return acc + fn(x), 0

            acc, _ = lax.scan(body, jnp.int32(0), all_reads)
            return acc

        return jax.jit(run)

    def feed_rm(rep):
        r = np.random.default_rng(rep)
        return jnp.asarray(r.integers(1, 5, (NCH, R, L), dtype=np.int8))

    def feed_cm(rep):
        r = np.random.default_rng(rep)
        return jnp.asarray(
            r.integers(1, 5, (NCH, R, L), dtype=np.int8).transpose(0, 2, 1).copy()
        )

    timeit("keys (R,S)", chunked(keys_rm), feed_rm)
    timeit("keys (S,R)", chunked(keys_cm), feed_cm)

    # walk-shaped hit buffer updates: 8 iterations of masked scatter into
    # (R, 16) vs (16, R)
    H = 16
    rows = np.arange(R, dtype=np.int32)

    def walk_rm(pos0):  # (R,) int32 seeds
        def it(state, i):
            buf, n = state
            slot = jnp.clip(n, 0, H - 1)
            val = pos0 + i
            write = (val & 3) != 0
            old = buf[rows, slot]
            buf = buf.at[rows, slot].set(jnp.where(write, val, old))
            return (buf, n + write.astype(jnp.int32)), 0

        (buf, n), _ = lax.scan(it, (jnp.zeros((R, H), jnp.int32), pos0 * 0),
                               np.arange(8, dtype=np.int32))
        return jnp.sum(buf) + jnp.sum(n)

    def walk_cm(pos0):
        def it(state, i):
            buf, n = state
            slot = jnp.clip(n, 0, H - 1)
            val = pos0 + i
            write = (val & 3) != 0
            old = buf[slot, rows]
            buf = buf.at[slot, rows].set(jnp.where(write, val, old))
            return (buf, n + write.astype(jnp.int32)), 0

        (buf, n), _ = lax.scan(it, (jnp.zeros((H, R), jnp.int32), pos0 * 0),
                               np.arange(8, dtype=np.int32))
        return jnp.sum(buf) + jnp.sum(n)

    def feed_pos(rep):
        r = np.random.default_rng(100 + rep)
        return jnp.asarray(r.integers(0, 1 << 20, (NCH, R), dtype=np.int32))

    timeit("walkbuf (R,16)", chunked(walk_rm), feed_pos)
    timeit("walkbuf (16,R)", chunked(walk_cm), feed_pos)


if __name__ == "__main__":
    main()
