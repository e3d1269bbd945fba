#!/usr/bin/env python
"""Microbench: 1-gather bucketized inline-key lookup vs the 2-gather CHD.

The canonical-class CHD probe is two DEPENDENT gathers per window class:
d = chd_dir[h1(x)] (4 B), row = chd_rows[h2(x) + d] (24 B). The width sweep
(microbench_gather / BASELINE.md) showed row width is nearly free up to
~128 B, which suggests an alternative: one 128 B bucket row holding 16
inline (fingerprint32, payload32) slots — bucket index h(x), load bounded by
seed retries — would answer a probe with ONE gather plus a 16-lane VPU
compare. Same ~32 B/key memory at mean load 4.

This measures exactly that trade at bench-index scale (~20M classes) with
the real dependency structure; it does NOT build a real table (keys are
random; the compare work is identical either way).
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from rapmap_tpu.utils.jaxenv import setup as _s; _s()
import jax, jax.numpy as jnp
from jax import lax

N_KEYS = 20_000_000
N_IDX = 1 << 19     # probes per scan step (bench: ~46/read x 8192 = 377k)
NCH = 8
REPS = 3
rng = np.random.default_rng(0)

# --- CHD-like: dir (N/5 rounded to pow2) int32 + rows (2^ceil(log2 N)) x 6 ---
mbits = int(np.ceil(np.log2(N_KEYS / 5)))
tbits = int(np.ceil(np.log2(N_KEYS)))
chd_dir = jnp.asarray(rng.integers(0, 1 << 16, 1 << mbits, dtype=np.int32))
chd_rows = jnp.asarray(rng.integers(0, 1 << 30, ((1 << tbits), 6), dtype=np.int32))

def run_chd(dirt, rows, all_h1):
    tmask = np.int32((1 << tbits) - 1)
    def body(acc, h1):
        d = jnp.take(dirt, h1 >> np.int32(max(tbits - mbits, 0)), mode="clip")
        r = jnp.take(rows, (h1 + d) & tmask, axis=0, mode="clip")
        hit = (r[:, 0] == h1) & (r[:, 1] == h1)  # key-confirm compare
        return acc + jnp.sum(jnp.where(hit, r[:, 2], r[:, 4]), dtype=jnp.int32), 0
    acc, _ = lax.scan(body, jnp.int32(0), all_h1)
    return acc

# --- 1-gather bucket: (N/4) buckets x 32 int32 (16 slots of fp32+class32) ---
bbits = int(np.ceil(np.log2(N_KEYS / 4)))
buckets = jnp.asarray(rng.integers(0, 1 << 30, ((1 << bbits), 32), dtype=np.int32))

def run_bucket(bk, all_h):
    bmask = np.int32((1 << bbits) - 1)
    def body(acc, h):
        row = jnp.take(bk, h & bmask, axis=0, mode="clip")   # (N_IDX, 32)
        fp = row[:, 0::2]                                    # 16 fingerprints
        pay = row[:, 1::2]
        hit = fp == h[:, None]
        cls = jnp.max(jnp.where(hit, pay, 0), axis=1)
        found = jnp.any(hit, axis=1)
        return acc + jnp.sum(jnp.where(found, cls, 1), dtype=jnp.int32), 0
    acc, _ = lax.scan(body, jnp.int32(0), all_h)
    return acc

def timeit(name, jfn, *tables):
    x0 = rng.integers(0, 1 << 30, (NCH, N_IDX), dtype=np.int32)
    t0 = time.time(); np.asarray(jfn(*tables, x0))
    sys.stderr.write(f"# {name} compile+first {time.time()-t0:.1f}s\n"); sys.stderr.flush()
    best = []
    for _ in range(REPS):
        x = rng.integers(0, 1 << 30, (NCH, N_IDX), dtype=np.int32)
        t0 = time.time(); np.asarray(jfn(*tables, x)); best.append(time.time() - t0)
    dt = min(best)
    print(f"{name:18s} {dt*1e3:8.2f} ms  {dt/(NCH*N_IDX)*1e9:7.2f} ns/probe", flush=True)
    return dt

if __name__ == "__main__":
    a = timeit("chd 2-gather", jax.jit(run_chd), chd_dir, chd_rows)
    b = timeit("bucket 1-gather", jax.jit(run_bucket), buckets)
    print(f"bucket/chd = {b/a:.3f}", flush=True)

# --- honest variant (run with --honest): slots carry the REAL payload -------
# (khi, klo, bf, ef, br, er) = 24 B/slot; 8 slots = 192 B bucket, m = n
# buckets (Poisson(1), max load <= 8 by seed retry). Memory 192 B/key vs
# CHD's ~26 B/key — only viable below ~30M classes on a 16 GB chip.
def honest():
    hb = int(np.ceil(np.log2(N_KEYS)))
    big = jnp.asarray(rng.integers(0, 1 << 30, ((1 << hb), 48), dtype=np.int32))

    def run_big(bk, all_h):
        bmask = np.int32((1 << hb) - 1)
        def body(acc, h):
            row = jnp.take(bk, h & bmask, axis=0, mode="clip")  # (N_IDX, 48)
            r3 = row.reshape(row.shape[0], 8, 6)
            hit = (r3[:, :, 0] == h[:, None]) & (r3[:, :, 1] == h[:, None])
            bf = jnp.max(jnp.where(hit, r3[:, :, 2], 0), axis=1)
            br = jnp.max(jnp.where(hit, r3[:, :, 4], 0), axis=1)
            return acc + jnp.sum(bf + br, dtype=jnp.int32), 0
        acc, _ = lax.scan(body, jnp.int32(0), all_h)
        return acc

    # floor reference: ONE 24 B gather from a table with the CHD row count
    rows24 = jnp.asarray(rng.integers(0, 1 << 30, ((1 << tbits), 6), dtype=np.int32))

    def run_one24(rows, all_h):
        tmask = np.int32((1 << tbits) - 1)
        def body(acc, h):
            r = jnp.take(rows, h & tmask, axis=0, mode="clip")
            return acc + jnp.sum(r[:, 2] + r[:, 4], dtype=jnp.int32), 0
        acc, _ = lax.scan(body, jnp.int32(0), all_h)
        return acc

    c = timeit("bucket192 1-gather", jax.jit(run_big), big)
    d = timeit("one 24B gather ref", jax.jit(run_one24), rows24)
    return c, d

if "--honest" in sys.argv:
    honest()
