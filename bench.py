"""Benchmark: quasi-mapping reads/s on one chip.

Prints ONE JSON line. Headline fields {"metric", "value", "unit",
"vs_baseline"} stay the uniform-SE quasimap median for cross-round
continuity; the same line now carries (VERDICT r3 item 4, machine-honest
benching):
  "rows":    per-regime medians — uniform_se, isoform_se (PRIMARY: the
             realistic multimapping regime), pe, pseudo — each median-of-5
             with min/max/spread and the compile+first-batch cost
  "canary":  a PINNED tiny program (HBM random-gather probe, the engine's
             bottleneck op) with its recorded healthy range, so a sick
             tunnel/compile-server day is a field, not a prose caveat
  "primary_row": "isoform_se"

Baseline note (BASELINE.md): the reference binary could not be built this round
(/root/reference has been an empty mount), so vs_baseline is computed against a
provisional single-core C++ figure of 150k reads/s — the RapMap-paper order of
magnitude for one thread — to be replaced by an empirical measurement the
moment the mount carries source. The north-star target is 10x that.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from rapmap_tpu.utils.jaxenv import setup as _jax_setup

_jax_setup()

PROVISIONAL_BASELINE_READS_PER_S = 150_000.0

CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".bench_cache")

# bench scale: ~20 Mbase synthetic transcriptome (human txome is ~200-350 Mbase;
# this keeps index build under a minute while exercising real HBM working sets)
N_TXPS = 10_000
TXP_LEN = (500, 3500)
READ_LEN = 76
N_READS = 786_432
BATCH = 65536  # dispatch batch; the compiled program is a lax.scan over CHUNK
# -read chunks, so compile cost tracks CHUNK (B-independent). A large share of
# engine time is per-op fixed overhead (the runtime charges ~tens of µs per
# device op regardless of shape), which amortizes with chunk size — TQM_CHUNK
# exists for A/B'ing that tradeoff against compile time.
CHUNK = int(os.environ.get("TQM_CHUNK", "8192"))


def build_world():
    from rapmap_tpu.index.builder import build_quasi_index
    from rapmap_tpu.index.format import load_index

    os.makedirs(CACHE, exist_ok=True)
    idx_dir = os.path.join(CACHE, "idx_v1")
    if not os.path.exists(os.path.join(idx_dir, "header.json")):
        rng = np.random.default_rng(0)
        bases = np.frombuffer(b"ACGT", dtype=np.uint8)
        fa = os.path.join(CACHE, "txome.fa")
        with open(fa, "w") as f:
            for i in range(N_TXPS):
                L = int(rng.integers(*TXP_LEN))
                f.write(f">t{i}\n{bases[rng.integers(0, 4, L)].tobytes().decode()}\n")
        build_quasi_index(fa, outdir=idx_dir, k=31)
    idx = load_index(idx_dir)
    if getattr(idx, "chd_dir", None) is None or not idx.meta.get("chd", {}).get(
        "canonical"
    ):
        # upgrade pre-CHD / legacy per-strand-CHD cached indexes to the
        # canonical-class 2-gather perfect-hash probe
        from rapmap_tpu.index.chd import attach_chd

        idx = load_index(idx_dir, mmap=False)
        attach_chd(idx, save_dir=idx_dir)

    reads_npz = os.path.join(CACHE, "reads_v3.npz")
    if not os.path.exists(reads_npz):
        rng = np.random.default_rng(1)
        text = np.asarray(idx.text[: idx.n_text])
        codes = np.empty((N_READS, READ_LEN), dtype=np.int8)
        starts = rng.integers(0, idx.n_text - READ_LEN, size=N_READS)
        for i, p in enumerate(starts):
            w = text[p : p + READ_LEN].copy()
            bad = w < 1
            if bad.any():
                w[bad] = rng.integers(1, 5, int(bad.sum()))
            # 1% error rate
            nerr = rng.binomial(READ_LEN, 0.01)
            if nerr:
                pos = rng.integers(0, READ_LEN, nerr)
                w[pos] = rng.integers(1, 5, nerr)
            codes[i] = w
        # half reverse-complemented
        half = N_READS // 2
        rc = codes[:half]
        rc = np.where((rc >= 1) & (rc <= 4), 5 - rc, 5)[:, ::-1].astype(np.int8)
        codes[:half] = rc
        np.savez(reads_npz, codes=codes)
    codes = np.load(reads_npz)["codes"]
    return idx, codes


def build_isoform_world():
    """Isoform-style repetitive txome (shared exons + paralogs,
    scripts/txome_sim.py) at ~bench scale: real multimapping pressure."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "scripts"))
    from txome_sim import gen_isoform_txome, write_fasta

    from rapmap_tpu.index.builder import build_quasi_index
    from rapmap_tpu.index.format import load_index

    os.makedirs(CACHE, exist_ok=True)
    idx_dir = os.path.join(CACHE, "idx_iso_v1")
    if not os.path.exists(os.path.join(idx_dir, "header.json")):
        rng = np.random.default_rng(3)
        fa = os.path.join(CACHE, "txome_iso.fa")
        write_fasta(gen_isoform_txome(rng, n_genes=2000, isoforms_per_gene=(2, 8)), fa)
        build_quasi_index(fa, outdir=idx_dir, k=31)
    idx = load_index(idx_dir)
    if getattr(idx, "chd_dir", None) is None or not idx.meta.get("chd", {}).get("canonical"):
        from rapmap_tpu.index.chd import attach_chd

        idx = load_index(idx_dir, mmap=False)
        attach_chd(idx, save_dir=idx_dir)

    reads_npz = os.path.join(CACHE, "reads_iso_v1.npz")
    if not os.path.exists(reads_npz):
        rng = np.random.default_rng(4)
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
    return idx, np.load(reads_npz)["codes"]


def build_pe_reads(idx, tag: str = "pe_v1"):
    """Mate pairs from ~250 bp fragments of the given txome: mate1 = fragment
    start (fwd), mate2 = rc of the fragment end — the reference's standard
    inward-facing library orientation. `tag` keys the read cache per world."""
    pe_npz = os.path.join(CACHE, f"reads_{tag}.npz")
    if not os.path.exists(pe_npz):
        rng = np.random.default_rng(2)
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
            m2 = frag[FRAG - READ_LEN :].copy()
            m2 = (5 - m2)[::-1].astype(np.int8)  # rc
            for m in (m1, m2):
                nerr = rng.binomial(READ_LEN, 0.01)
                if nerr:
                    pos = rng.integers(0, READ_LEN, nerr)
                    m[pos] = rng.integers(1, 5, nerr)
            c1[i], c2[i] = m1, m2
        np.savez(pe_npz, c1=c1, c2=c2)
    d = np.load(pe_npz)
    return d["c1"], d["c2"]


def bench_cfg(idx, chunk: int):
    """Device buffers sized to the measured bench-read regime (oracle probe:
    ~1.07 expansion slots and <= 2 MMP hits per read; see BASELINE.md):
    every collate/compact scan and the d2h wire scale with these, and
    overflow degrades to flagged reads, never wrong output. Shared with
    scripts/profile_stages.py so stage numbers match the bench program."""
    from rapmap_tpu.config import MapConfig

    return MapConfig(
        k=idx.k, chunk=chunk,
        max_hits_per_strand=4, expand_budget=3, rec_slots=2,
        max_out=16,  # PE merge is O(max_out log max_out)/read; bench reads
        # have <= ~2 mappings, and 17+ would flag out_truncated -> fallback
    )


def build_pseudo_world():
    """Pseudo (k-mer CSR) index over the same bench txome + the same reads."""
    from rapmap_tpu.index.builder import build_pseudo_index
    from rapmap_tpu.index.format import load_index

    idx, codes = build_world()  # ensures txome.fa + reads exist
    pidx_dir = os.path.join(CACHE, "pidx_v1")
    if not os.path.exists(os.path.join(pidx_dir, "header.json")):
        build_pseudo_index(os.path.join(CACHE, "txome.fa"), outdir=pidx_dir, k=31)
    return load_index(pidx_dir), codes


# Canary healthy range (ns per random gather index, 4M int32x8-row gathers
# incl. one dispatch): the engine is transaction-bound at ~13-15 ns/index on a
# healthy chip+tunnel (BASELINE.md gather economics); round-3's sick sessions
# measured the same code ~30% slower. Outside this range, treat the day's
# absolute numbers as tunnel-degraded and compare map rates / other rows.
CANARY_HEALTHY_NS = (9.0, 22.0)


def run_canary() -> dict:
    """Frozen micro-program: one jitted 4M-index random gather over a 128 MB
    HBM table (the probe/walk bottleneck op). Median-of-5, compile excluded."""
    import jax
    import jax.numpy as jnp

    t0 = time.time()
    rows = 1 << 22
    tab = jnp.asarray(np.arange(rows * 8, dtype=np.int32).reshape(rows, 8))
    ix = jnp.asarray(
        np.random.default_rng(9).integers(0, rows, size=1 << 22).astype(np.int32)
    )

    @jax.jit
    def g(t, i):
        return jnp.take(t, i, axis=0).sum(dtype=jnp.int32)

    # int(...) fetches the scalar to host: on the axon relay,
    # block_until_ready alone resolves ~instantly (measured 0.01-0.03 ns/ix
    # — it does NOT synchronize with remote compute); only a host data fetch
    # serializes against the device stream, so the canary times through one.
    int(g(tab, ix))
    compile_s = time.time() - t0
    reps = []
    for _ in range(5):
        t0 = time.time()
        int(g(tab, ix))
        reps.append(time.time() - t0)
    reps.sort()
    ns = reps[2] / ix.shape[0] * 1e9
    return {
        "gather_ns": round(ns, 2),
        "healthy_range": list(CANARY_HEALTHY_NS),
        "healthy": CANARY_HEALTHY_NS[0] <= ns <= CANARY_HEALTHY_NS[1],
        "min_ns": round(reps[0] / ix.shape[0] * 1e9, 2),
        "max_ns": round(reps[-1] / ix.shape[0] * 1e9, 2),
        "compile_s": round(compile_s, 1),
    }


def run_bench(batch: int, pe: bool = False, isoform: bool = False,
              pseudo: bool = False) -> dict:
    t_setup = time.time()
    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.models.quasi import QuasiMapper

    if pseudo:
        from rapmap_tpu.models.pseudo import PseudoMapper

        pidx, codes = build_pseudo_world()
        BATCH = batch
        cfg = MapConfig(
            k=pidx.k, chunk=CHUNK if batch > CHUNK else 0,
            max_hits_per_strand=4, expand_budget=3, rec_slots=2,
        )
        mapper = PseudoMapper(pidx, cfg)
        lens = np.full(BATCH, READ_LEN, dtype=np.int32)
        submit = lambda lo: mapper.map_se_async(codes[lo : lo + BATCH], lens)
        n_src = len(codes)
        # falls through to the shared warmup + N_REP median pipeline below —
        # the pseudo row used to be a single timed pass (r4 full-matrix run
        # read 302k where the same engine medianed 449k in r2: single-run
        # pseudo reporting was pure tunnel noise)
    elif isoform:
        idx, codes = build_isoform_world()
        # repetitive regime: auto-size the expansion pool (+ pair expansion)
        # from index stats; measured hits/lane maxes at 2 even here (NIP
        # skipping doesn't care about interval width), so H=4 like uniform
        cfg = MapConfig(
            k=idx.k, chunk=CHUNK if batch > CHUNK else 0,
            max_hits_per_strand=4, expand_budget=0, max_out=32, rec_slots=4,
        )
    else:
        idx, codes = build_world()
        cfg = bench_cfg(idx, chunk=CHUNK if batch > CHUNK else 0)
    if not pseudo:
        mapper = QuasiMapper(idx, cfg)
        BATCH = batch
        lens = np.full(BATCH, READ_LEN, dtype=np.int32)
        if pe:
            c1, c2 = build_pe_reads(idx, tag="pe_iso_v1" if isoform else "pe_v1")
            submit = lambda lo: mapper.map_pe_async(
                c1[lo : lo + BATCH], lens, c2[lo : lo + BATCH], lens
            )
            n_src = len(c1)
        else:
            submit = lambda lo: mapper.map_se_async(codes[lo : lo + BATCH], lens)
            n_src = len(codes)
    print(f"# setup {time.time()-t_setup:.1f}s", file=sys.stderr)

    # warmup / compile
    t0 = time.time()
    wr = mapper.fetch(submit(0))
    compile_s = time.time() - t0
    print(f"# compile+first batch {compile_s:.1f}s; "
          f"mapped {wr.counters['reads_mapped']}/{BATCH}", file=sys.stderr)

    # production pipeline: DEPTH batches in flight so device compute and both
    # transfer directions overlap (mirrors the CLI loop). N_REP timed repeats;
    # the headline value is the MEDIAN (the axon tunnel swings same-code runs
    # ~±15%, BASELINE.md variance notes — single-run reporting invites fiction)
    from collections import deque

    DEPTH = 6
    N_REP = 5
    n_batches = max(1, n_src // BATCH)

    def one_pass():
        t0 = time.time()
        total = 0
        mapped = 0
        q: deque = deque()
        for i in range(n_batches):
            if (i + 1) * BATCH > n_src:
                break
            q.append(submit(i * BATCH))
            if len(q) >= DEPTH:
                wr = mapper.fetch(q.popleft())
                mapped += wr.counters["reads_mapped"]
                total += BATCH
        while q:
            wr = mapper.fetch(q.popleft())
            mapped += wr.counters["reads_mapped"]
            total += BATCH
        return total, mapped, time.time() - t0

    # one untimed full pass first: the tunnel/dispatch path warms over the
    # first ~30 batches (measured: reps 0-2 of a cold run sit ~25% below
    # reps 3-4), which would bias the median low
    total, mapped, dt = one_pass()
    print(f"# warmup: {total} in {dt:.2f}s = {total/dt:,.0f}/s", file=sys.stderr)
    rates = []
    for rep in range(N_REP):
        total, mapped, dt = one_pass()
        rates.append(total / dt)
        print(f"# rep {rep}: {total} in {dt:.2f}s = {total/dt:,.0f}/s, "
              f"map rate {100.0*mapped/total:.1f}%", file=sys.stderr)
    rates.sort()
    rps = rates[len(rates) // 2]
    unit_name = "pairs" if pe else "reads"
    if pseudo:
        metric = "pseudomap_reads_per_s_per_chip"
    else:
        metric = ("quasimap_pairs_per_s_per_chip" if pe
                  else "quasimap_reads_per_s_per_chip")
        if isoform:
            metric += "_isoform"
    return {
        "metric": metric,
        "value": round(rps, 1),
        "unit": f"{unit_name}/s",
        "vs_baseline": round(rps / PROVISIONAL_BASELINE_READS_PER_S, 3),
        "n_rep": N_REP,
        "min": round(rates[0], 1),
        "max": round(rates[-1], 1),
        "spread_pct": round(100.0 * (rates[-1] - rates[0]) / rps, 1),
        "map_rate_pct": round(100.0 * mapped / max(total, 1), 2),
        "compile_s": round(compile_s, 1),
    }


def _run_child(mode_flags: list, ladder) -> dict | None:
    """One regime in a child process with a compile watchdog (the axon
    compile server's latency varies 280 s - 20+ min for the same program);
    falls down the batch ladder on timeout/failure. None = all rungs failed."""
    import subprocess

    for batch, timeout_s in ladder:
        try:
            res = subprocess.run(
                [sys.executable, os.path.abspath(__file__), *mode_flags, str(batch)],
                capture_output=True, text=True, timeout=timeout_s,
            )
            sys.stderr.write(res.stderr[-2000:])
            line = [l for l in res.stdout.splitlines() if l.startswith("{")]
            if res.returncode == 0 and line:
                return json.loads(line[-1])
            print(f"# batch {batch} failed rc={res.returncode}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            print(f"# batch {batch} timed out after {timeout_s}s; falling back",
                  file=sys.stderr)
    return None


def main() -> None:
    pe = "--pe" in sys.argv
    iso = "--isoform" in sys.argv
    pseudo = "--pseudo" in sys.argv
    canary_only = "--canary" in sys.argv
    argv = [a for a in sys.argv[1:]
            if a not in ("--pe", "--isoform", "--pseudo", "--canary")]
    if canary_only:  # child mode: frozen health probe
        print(json.dumps(run_canary()))
        return
    if argv:  # child mode: bench.py [--pe|--isoform|--pseudo] <batch>
        print(json.dumps(run_bench(int(argv[0]), pe=pe, isoform=iso, pseudo=pseudo)))
        return
    if pe or iso or pseudo:  # single-regime parent (manual runs)
        flags = ((["--pe"] if pe else []) + (["--isoform"] if iso else [])
                 + (["--pseudo"] if pseudo else []))
        row = _run_child(flags, ((BATCH // 2, 900), (BATCH // 4, 1200), (BATCH // 8, 1800)))
        if row is None:
            raise SystemExit("bench failed at all batch sizes")
        print(json.dumps(row))
        return

    # ---- full matrix (the driver's default invocation) ----------------------
    # Canary first: a sick tunnel/compile-server day becomes a recorded field.
    # Two attempts: the r4 full-matrix run lost its canary to one >600 s
    # compile-server episode while every engine row ran fine.
    canary = (_run_child(["--canary"], ((0, 600), (0, 600)))
              or {"error": "canary failed"})
    print(f"# canary: {json.dumps(canary)}", file=sys.stderr)
    # measured sweep (BASELINE.md): B=32768 456.8k > B=65536 391-396k >
    # B=16384 325.6k — lead with the sweet spot; fallbacks shrink compile risk
    ladder_main = ((BATCH // 2, 1500), (BATCH // 4, 1500), (BATCH // 8, 1800))
    ladder_side = ((BATCH // 2, 1500), (BATCH // 8, 1500))
    rows = {}
    rows["uniform_se"] = _run_child([], ladder_main)
    if rows["uniform_se"] is None:
        raise SystemExit("bench failed at all batch sizes (uniform SE)")
    for name, flags in (("isoform_se", ["--isoform"]), ("pe", ["--pe"]),
                        ("pseudo", ["--pseudo"])):
        row = _run_child(flags, ladder_side)
        rows[name] = row if row is not None else {"error": "all rungs failed"}
    head = rows["uniform_se"]
    out = {
        "metric": head["metric"], "value": head["value"], "unit": head["unit"],
        "vs_baseline": head["vs_baseline"],
        "n_rep": head.get("n_rep"), "min": head.get("min"),
        "max": head.get("max"), "spread_pct": head.get("spread_pct"),
        "rows": rows, "canary": canary, "primary_row": "isoform_se",
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
