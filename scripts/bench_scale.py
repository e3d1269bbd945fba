"""Production-scale single-chip bench: ~100 Mbase transcriptome, 90k txps.

BASELINE.json config 4 analog ("full human transcriptome index, PE 76bp at
production batch sizes"): GENCODE itself is unavailable offline, so this
builds a synthetic transcriptome at GENCODE-protein-coding scale (~100 Mbase
across ~90k transcripts, lognormal lengths) and runs the production SE
pipeline on one chip. Exercises: native SA-IS at 10^8 chars, canonical-CHD
build at ~10^8 classes, the LEAN device upload (~6-7 GB HBM), and the
chunked wire engine at production batch sizes.

Prints one JSON line: {"metric": "quasimap_reads_per_s_per_chip_100Mb", ...}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

from rapmap_tpu.utils.jaxenv import setup as _jax_setup  # noqa: E402

_jax_setup()

from bench import CACHE, CHUNK, PROVISIONAL_BASELINE_READS_PER_S, bench_cfg  # noqa: E402

TARGET_MBASE = 100
READ_LEN = 76
N_READS = 393_216
BATCH = 65536


def build_scale_world():
    from rapmap_tpu.index.builder import build_quasi_index
    from rapmap_tpu.index.format import load_index

    os.makedirs(CACHE, exist_ok=True)
    idx_dir = os.path.join(CACHE, "idx_scale_v1")
    if not os.path.exists(os.path.join(idx_dir, "header.json")):
        t0 = time.time()
        rng = np.random.default_rng(11)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        fa = os.path.join(CACHE, "txome_scale.fa")
        total = 0
        with open(fa, "w") as f:
            i = 0
            while total < TARGET_MBASE * 1_000_000:
                # lognormal transcript lengths, median ~900 bp (GENCODE-like)
                L = int(np.clip(rng.lognormal(6.8, 0.75), 200, 20_000))
                f.write(f">t{i}\n{bases[rng.integers(0, 4, L)].tobytes().decode()}\n")
                total += L
                i += 1
        print(f"# txome: {i} txps, {total/1e6:.1f} Mbase ({time.time()-t0:.0f}s)",
              file=sys.stderr, flush=True)
        t0 = time.time()
        build_quasi_index(fa, outdir=idx_dir, k=31)
        print(f"# index built ({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
    idx = load_index(idx_dir, mmap=False)
    if getattr(idx, "chd_dir", None) is None or not idx.meta.get("chd", {}).get("canonical"):
        from rapmap_tpu.index.chd import attach_chd

        t0 = time.time()
        attach_chd(idx, save_dir=idx_dir)
        print(f"# CHD attached ({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)

    reads_npz = os.path.join(CACHE, "reads_scale_v1.npz")
    if not os.path.exists(reads_npz):
        t0 = time.time()
        rng = np.random.default_rng(12)
        text = np.asarray(idx.text[: idx.n_text])
        codes = np.empty((N_READS, READ_LEN), dtype=np.int8)
        starts = rng.integers(0, idx.n_text - READ_LEN, size=N_READS)
        for i, p in enumerate(starts):
            w = text[p : p + READ_LEN].copy()
            bad = w < 1
            if bad.any():
                w[bad] = rng.integers(1, 5, int(bad.sum()))
            nerr = rng.binomial(READ_LEN, 0.01)
            if nerr:
                pos = rng.integers(0, READ_LEN, nerr)
                w[pos] = rng.integers(1, 5, nerr)
            codes[i] = w
        half = N_READS // 2
        rc = codes[:half]
        codes[:half] = np.where((rc >= 1) & (rc <= 4), 5 - rc, 5)[:, ::-1].astype(np.int8)
        np.savez(reads_npz, codes=codes)
        print(f"# reads simulated ({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
    return idx, np.load(reads_npz)["codes"]


def build_scale_pe(idx):
    """Inward-facing 76 bp mates from ~250 bp fragments of the scale txome."""
    pe_npz = os.path.join(CACHE, "reads_scale_pe_v1.npz")
    if not os.path.exists(pe_npz):
        t0 = time.time()
        rng = np.random.default_rng(13)
        text = np.asarray(idx.text[: idx.n_text])
        FRAG = 250
        n = N_READS // 2
        c1 = np.empty((n, READ_LEN), dtype=np.int8)
        c2 = np.empty((n, READ_LEN), dtype=np.int8)
        starts = rng.integers(0, idx.n_text - FRAG, size=n)
        for i, p in enumerate(starts):
            frag = text[p : p + FRAG].copy()
            bad = frag < 1
            if bad.any():
                frag[bad] = rng.integers(1, 5, int(bad.sum()))
            m1 = frag[:READ_LEN].copy()
            m2 = (5 - frag[FRAG - READ_LEN :])[::-1].astype(np.int8)
            for m in (m1, m2):
                nerr = rng.binomial(READ_LEN, 0.01)
                if nerr:
                    pos = rng.integers(0, READ_LEN, nerr)
                    m[pos] = rng.integers(1, 5, nerr)
            c1[i], c2[i] = m1, m2
        np.savez(pe_npz, c1=c1, c2=c2)
        print(f"# PE reads simulated ({time.time()-t0:.0f}s)", file=sys.stderr, flush=True)
    d = np.load(pe_npz)
    return d["c1"], d["c2"]


def main() -> None:
    from collections import deque

    from rapmap_tpu.models.quasi import QuasiMapper

    pe = "--pe" in sys.argv
    t0 = time.time()
    idx, codes = build_scale_world()
    cfg = bench_cfg(idx, chunk=CHUNK)
    t_up = time.time()
    mapper = QuasiMapper(idx, cfg)
    hbm = sum(
        a.nbytes for a in jax_leaves(mapper.didx) if a is not None
    )
    print(f"# setup {t_up-t0:.0f}s; upload {time.time()-t_up:.0f}s; "
          f"device index {hbm/2**30:.2f} GiB", file=sys.stderr, flush=True)

    lens = np.full(BATCH, READ_LEN, dtype=np.int32)
    if pe:
        c1, c2 = build_scale_pe(idx)
        submit = lambda lo: mapper.map_pe_async(
            c1[lo : lo + BATCH], lens, c2[lo : lo + BATCH], lens
        )
        n_src = len(c1)
    else:
        submit = lambda lo: mapper.map_se_async(codes[lo : lo + BATCH], lens)
        n_src = len(codes)
    t0 = time.time()
    wr = mapper.fetch(submit(0))
    print(f"# compile+first batch {time.time()-t0:.0f}s; "
          f"mapped {wr.counters['reads_mapped']}/{BATCH}; "
          f"over_budget {wr.counters['over_budget']}", file=sys.stderr, flush=True)

    DEPTH = 6
    n_batches = n_src // BATCH
    t0 = time.time()
    total = mapped = 0
    q: deque = deque()
    for i in range(n_batches):
        q.append(submit(i * BATCH))
        if len(q) >= DEPTH:
            w = mapper.fetch(q.popleft())
            mapped += w.counters["reads_mapped"]
            total += BATCH
    while q:
        w = mapper.fetch(q.popleft())
        mapped += w.counters["reads_mapped"]
        total += BATCH
    dt = time.time() - t0
    unit = "pairs" if pe else "reads"
    print(f"# {total} {unit} in {dt:.2f}s, map rate {100.0*mapped/total:.1f}%",
          file=sys.stderr, flush=True)
    print(json.dumps({
        "metric": ("quasimap_pairs_per_s_per_chip_100Mb" if pe
                   else "quasimap_reads_per_s_per_chip_100Mb"),
        "value": round(total / dt, 1),
        "unit": f"{unit}/s",
        "vs_baseline": round(total / dt / PROVISIONAL_BASELINE_READS_PER_S, 3),
        "device_index_gib": round(hbm / 2**30, 2),
    }))


def jax_leaves(didx):
    import jax

    return [x for x in jax.tree.leaves(didx) if hasattr(x, "nbytes")]


if __name__ == "__main__":
    main()
