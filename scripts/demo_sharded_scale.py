"""Config-5 stretch demo: the 100 Mbase production index through the
SA-sharded 2-D mesh engine with the genome-scale slot64 layout, on a virtual
CPU mesh (multi-chip TPU hardware is unavailable on this rig).

Forces slot64 (int64 GLOBAL slot ids — the >=2^31-slot regime a ~3 Gbase
genome concatenation needs, upstream divsufsort64 dispatch) on the 100 Mbase
index and checks the sharded engine's output read-for-read against the numpy
oracle. Prints one JSON line with the verified-read count.

Reuses bench_scale's cached index (builds it if missing — ~5 min).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"  # virtual mesh; no multi-chip TPU here
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=4"
)

import jax  # noqa: E402

# the axon sitecustomize force-registers the TPU and overrides JAX_PLATFORMS;
# config.update after import (before backend init) reliably selects CPU
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

N_READS = 96
READ_LEN = 76
N_DATA, N_IDX = 2, 2


def main():
    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.index.format import load_index
    from rapmap_tpu.oracle import quasimap as qm
    from rapmap_tpu.parallel import sharded
    from scripts.bench_scale import build_scale_world

    t0 = time.time()
    idx, _ = build_scale_world()
    print(f"# index loaded: {idx.n_text/1e6:.1f} Mbase ({time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)

    t0 = time.time()
    arr, st = sharded.shard_quasi_index(idx, N_IDX, slot64=True)
    assert arr.slot_base.dtype == np.int64
    print(f"# sharded (slot64): S_pad={arr.sa_cmp.shape[1]} ({time.time()-t0:.0f}s)",
          file=sys.stderr, flush=True)

    rng = np.random.default_rng(17)
    text = np.asarray(idx.text)
    off = np.asarray(idx.txp_offsets)
    tl = np.asarray(idx.txp_lens)
    seqs = []
    while len(seqs) < N_READS:
        t = int(rng.integers(0, idx.n_txps))
        if tl[t] < READ_LEN + 1:
            continue
        p = int(rng.integers(0, tl[t] - READ_LEN))
        w = text[off[t] + p : off[t] + p + READ_LEN]
        if (w >= 1).all():
            seqs.append(w.astype(np.int8))
    per = -(-N_READS // N_DATA)
    B = N_DATA * per
    codes = np.full((B, READ_LEN), 5, np.int8)
    lens = np.zeros(B, np.int32)
    for i, s in enumerate(seqs):
        codes[i] = s
        lens[i] = len(s)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8, expand_budget=64, max_out=32)

    mesh = sharded.make_mesh_2d(N_DATA, N_IDX)
    nv = np.full(N_DATA, per, np.int32)
    sharr = jax.tree.map(jnp.asarray, arr)
    t0 = time.time()
    out, ctr = sharded.map_batch_se_sharded(
        sharr, st, jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(nv), cfg, mesh
    )
    out = jax.tree.map(np.asarray, out)
    print(f"# sharded map_batch: {time.time()-t0:.0f}s "
          f"(mapped {int(np.asarray(ctr.reads_mapped))}/{N_READS})",
          file=sys.stderr, flush=True)

    n_checked = 0
    for i in range(N_READS):
        want = qm.map_read(idx, codes[i][: lens[i]], cfg)
        got = [
            (int(out.t[i, j]), int(out.pos[i, j]), out.strand[i, j] == 0,
             int(out.score[i, j]))
            for j in range(out.t.shape[1]) if out.t[i, j] != -1
        ]
        exp = [(m.txp, m.pos, m.fwd, m.score) for m in want]
        assert got == exp, f"read {i}: sharded {got} != oracle {exp}"
        n_checked += 1
    print(json.dumps({
        "metric": "sharded_slot64_oracle_parity_100Mb",
        "value": n_checked, "unit": "reads verified",
        "mbase": round(idx.n_text / 1e6, 1),
        "mesh": f"{N_DATA}x{N_IDX}", "slot_base_dtype": "int64",
    }), flush=True)


if __name__ == "__main__":
    main()
