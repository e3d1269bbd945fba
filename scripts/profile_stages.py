"""Device-stage profiler: where does the per-read time go?

Times the SE hot path's stages in isolation on the real chip, each as a
lax.scan over NCH fresh 8192-read chunks inside ONE dispatch, so the axon
tunnel RTT (~0.1 s/call) is amortized and the numbers are device compute:

  lookup : k-mer keys + one canonical-class CHD probe per fwd window
  scan   : lookup + both strands' anchor walks w/ packed extension
           (ops.mmp.scan_dispatch -> scan_batch_paired)
  full   : scan + collate + compact (the production chunked wire program)

walk = scan - lookup; collate = full - scan (approx; compact/wire is tiny).
Fresh input buffers per rep (server memoizes identical executions).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from bench import CHUNK, READ_LEN, build_world  # noqa: E402

NCH = 16
REPS = 3


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from rapmap_tpu.models.quasi import QuasiMapper, map_batch_se_wire_chunked
    from rapmap_tpu.ops import encode as denc
    from rapmap_tpu.ops.collate import collate_batch
    from rapmap_tpu.ops.lookup import kmer_lookup_2str
    from rapmap_tpu.ops.mmp import scan_dispatch

    idx, codes = build_world()
    from bench import bench_cfg

    cfg = bench_cfg(idx, chunk=CHUNK)
    mapper = QuasiMapper(idx, cfg)
    didx, st = mapper.didx, mapper.st
    C, L = CHUNK, READ_LEN
    B = NCH * C
    lens_np = np.full(C, L, dtype=np.int32)
    k = st.k

    def stage_lookup(didx, reads, lens):
        # canonical dense phase: keys on fwd windows, ONE probe per class
        key_hi, key_lo, kvalid = denc.kmer_keys_batch(reads, k)
        ff, bf, ef, fr, br, er = kmer_lookup_2str(didx, st, key_hi, key_lo)
        return (
            jnp.sum(ff & kvalid, dtype=jnp.int32)
            + jnp.sum(bf + br, dtype=jnp.int32)
            + jnp.sum(ef + er, dtype=jnp.int32)
        )

    def stage_scan(didx, reads, lens):
        h = scan_dispatch(didx, st, reads, lens, cfg)
        return (
            jnp.sum(h.n, dtype=jnp.int32)
            + jnp.sum(h.b, dtype=jnp.int32)
            + jnp.sum(h.l, dtype=jnp.int32)
        )

    def stage_collate(didx, reads, lens):
        h = scan_dispatch(didx, st, reads, lens, cfg)
        out = collate_batch(didx, st, h, lens, cfg)
        return (
            jnp.sum(out.t, dtype=jnp.int32)
            + jnp.sum(out.pos, dtype=jnp.int32)
            + jnp.sum(out.mapped, dtype=jnp.int32)
        )

    def chunked(fn):
        # didx must be an ARGUMENT (not a closure capture): captured device
        # arrays become compile-request constants and the axon remote-compile
        # rejects the multi-hundred-MB body with HTTP 413
        def run(didx_arg, all_reads):  # (NCH, C, L) int8
            def body(acc, chunk_reads):
                return acc + fn(didx_arg, chunk_reads, jnp.asarray(lens_np)), 0

            acc, _ = lax.scan(body, jnp.int32(0), all_reads)
            return acc

        jfn = jax.jit(run)
        return lambda x: jfn(didx, x)

    def timeit(name, jfn, feed):
        # pre-upload every rep's input and BLOCK before timing: a jnp.asarray
        # inside the timed region hides a host->device transfer through the
        # ~70 MB/s tunnel (5 MB batch ~ 70 ms — bigger than some stages).
        # Each dispatch also carries a ~30 ms wall floor (tunnel RTT), so
        # numbers approximate device compute + 30/B ms/read of overhead.
        xs = []
        for rep in range(REPS + 1):
            x = feed(rep)
            x.block_until_ready()
            xs.append(x)
        t0 = time.time()
        r0 = np.asarray(jfn(xs[0]))
        print(f"# {name}: compile+first {time.time()-t0:.1f}s chk={int(r0)}",
              file=sys.stderr, flush=True)
        best = []
        for x in xs[1:]:
            t0 = time.time()
            np.asarray(jfn(x))
            best.append(time.time() - t0)
        dt = min(best)
        per_read = dt / B * 1e6
        print(f"{name:8s} {dt*1e3:8.1f} ms/{B} reads  {per_read:6.2f} us/read  "
              f"({B/dt:,.0f} reads/s)", flush=True)
        return dt

    def feed(rep):
        lo = (rep * B) % (len(codes) - B)
        return jnp.asarray(codes[lo : lo + B].reshape(NCH, C, L))

    t_lookup = timeit("lookup", chunked(stage_lookup), feed)
    t_scan = timeit("scan", chunked(stage_scan), feed)
    t_coll = timeit("collate", chunked(stage_collate), feed)

    # the production program (adds compact + wire pack + counters)
    from rapmap_tpu.ops.wire import pack_in_se

    capc = mapper._cap(C)

    def run_full(dx, w):
        return map_batch_se_wire_chunked(dx, st, w, cfg, capc, B, L, C)

    _jw = jax.jit(lambda dx, w: jnp.sum(run_full(dx, w)[:8], dtype=jnp.int32))
    jw = lambda w: _jw(didx, w)

    def feed_w(rep):
        lo = (rep * B) % (len(codes) - B)
        return jnp.asarray(pack_in_se(
            codes[lo : lo + B],
            np.full(B, L, dtype=np.int32), B))

    t_full = timeit("full", jw, feed_w)

    print("# breakdown (device-compute approximations):", flush=True)
    print(f"#   lookup        {t_lookup/B*1e6:6.2f} us/read", flush=True)
    print(f"#   anchor walk   {(t_scan-t_lookup)/B*1e6:6.2f} us/read", flush=True)
    print(f"#   collate       {(t_coll-t_scan)/B*1e6:6.2f} us/read", flush=True)
    print(f"#   compact+wire  {(t_full-t_coll)/B*1e6:6.2f} us/read", flush=True)


if __name__ == "__main__":
    main()
