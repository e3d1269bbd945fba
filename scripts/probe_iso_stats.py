"""One-off: measure the isoform regime's real per-read demand distribution
(MMP hits per lane, interval widths, expansion slots per read) to size the
collate layout. Run on the chip; prints percentiles."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from rapmap_tpu.utils.jaxenv import setup as _setup

_setup()

from bench import CHUNK, READ_LEN, build_isoform_world  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.models.quasi import QuasiMapper
    from rapmap_tpu.ops.mmp import scan_dispatch

    idx, codes = build_isoform_world()
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8, expand_budget=64,
                    max_out=32, rec_slots=4)
    mapper = QuasiMapper(idx, cfg)
    didx, st = mapper.didx, mapper.st

    w = np.asarray(idx.kmer_e) - np.asarray(idx.kmer_b)
    print(f"# index kmer widths: mean {w.mean():.2f} p50 {np.percentile(w,50):.0f} "
          f"p90 {np.percentile(w,90):.0f} p99 {np.percentile(w,99):.0f} max {w.max()}")

    B = CHUNK
    lens = jnp.full((B,), READ_LEN, jnp.int32)
    # didx/lens as ARGS, not closure constants: captured arrays get baked
    # into the serialized HLO and blow the remote-compile request limit
    fn = jax.jit(lambda dx, r, ln: scan_dispatch(dx, st, r, ln, cfg))
    N = 8
    ns, widths_sum, nhits_read, wmax = [], [], [], []
    for i in range(N):
        r = jnp.asarray(codes[i * B : (i + 1) * B])
        h = jax.tree.map(np.asarray, fn(didx, r, lens))
        n = h.n  # (2B,)
        hv = np.arange(h.q.shape[1])[None, :] < n[:, None]
        wd = np.where(hv, h.e - h.b, 0)
        slots_lane = wd.sum(axis=1)
        slots_read = slots_lane[:B] + slots_lane[B:]
        ns.append(n)
        nhits_read.append(n[:B] + n[B:])
        widths_sum.append(slots_read)
        wmax.append(np.where(hv, h.e - h.b, 0).max(axis=1))
        if i == 0:
            print(f"# truncated lanes: {h.truncated.sum()}")
    n = np.concatenate(ns)
    sr = np.concatenate(widths_sum)
    nh = np.concatenate(nhits_read)
    wm = np.concatenate(wmax)
    for name, x in (("hits/lane", n), ("hits/read", nh),
                    ("slots/read", sr), ("max width/lane", wm)):
        q = np.percentile(x, [50, 90, 99, 99.9, 100])
        print(f"{name:16s} mean {x.mean():6.2f}  p50 {q[0]:5.0f} p90 {q[1]:5.0f} "
              f"p99 {q[2]:5.0f} p99.9 {q[3]:6.0f} max {q[4]:6.0f}")
    # fraction of reads whose slots exceed various row budgets
    for E in (8, 12, 16, 24, 32, 48, 64):
        print(f"# frac reads slots > {E:3d}: {(sr > E).mean():.5f}")
    # fraction of lanes with hits > various H
    for H in (4, 6, 8, 12):
        print(f"# frac lanes hits > {H:2d}: {(n > H).mean():.5f}")


if __name__ == "__main__":
    main()
