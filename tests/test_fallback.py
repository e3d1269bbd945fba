"""Budget exhaustion must never silently degrade output (VERDICT r1 item 3):
the wire carries per-read FLAG_DEGRADED bits, and the host oracle fallback
restores exact results. Also covers expand_budget auto-sizing from index
repetitiveness."""

import os
import subprocess
import sys

import numpy as np

from rapmap_tpu.config import MapConfig, auto_expand_budget
from rapmap_tpu.index.builder import build_quasi_index
from rapmap_tpu.models import fallback as fb
from rapmap_tpu.models.quasi import QuasiMapper
from rapmap_tpu.ops.wire import FLAG_DEGRADED
from rapmap_tpu.oracle import quasimap as qm
from tests.test_device_parity import batch_of
from tests.util import random_transcriptome, write_fasta, write_fastq

ENV = dict(
    os.environ,
    TQM_FORCE_CPU="1",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1 --xla_cpu_parallel_codegen_split_count=1",
)


def _repetitive_world(tmp_path, rng, n_txps=6, block=60):
    """Every transcript embeds the same block -> heavy multimapping."""
    base = random_transcriptome(rng, n_txps=n_txps, min_len=200, max_len=300)
    shared = base[0][1][50 : 50 + block]
    txps = [(f"t{i}", s[:30] + shared + s[30:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path / "rep.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    return idx, txps, shared


def test_auto_expand_budget_grows_with_repetitiveness(tmp_path, rng):
    idx, _, _ = _repetitive_world(tmp_path, rng)
    widths = np.asarray(idx.kmer_e) - np.asarray(idx.kmer_b)
    # repetitive index sizes above the unique-text floor, tracking the
    # occurrence-weighted (sampled) width E[w^2]/E[w], not the table mean
    assert auto_expand_budget(widths) > auto_expand_budget(np.ones(100))
    assert auto_expand_budget(np.ones(100)) == 4  # unique-text floor
    # mapper init resolves the 0 sentinel
    m = QuasiMapper(idx, MapConfig(k=idx.k, expand_budget=0))
    assert m.cfg.expand_budget == auto_expand_budget(widths)


def test_fallback_restores_oracle_results(tmp_path, rng):
    idx, txps, shared = _repetitive_world(tmp_path, rng)
    L = 40
    reads = [shared[j : j + L] for j in range(0, len(shared) - L + 1, 3)]
    reads += [txps[0][1][:L], txps[1][1][100 : 100 + L]]
    codes, lens = batch_of(reads, L)
    # starve the pool so multimapping reads overflow
    cfg = MapConfig(k=idx.k, expand_budget=1, max_hits_per_strand=L - idx.k + 1)
    mapper = QuasiMapper(idx, cfg)
    recsd = mapper.fetch(mapper.map_se_async(codes, lens))
    assert (np.asarray(recsd.flags) & FLAG_DEGRADED).any(), (
        "test should actually exhaust the pool"
    )
    fixed = fb.remap_se(recsd, codes, lens, len(reads), idx, cfg, qm)
    off = np.concatenate([[0], np.cumsum(fixed.counts)])
    for i in range(len(reads)):
        got = [tuple(r) for r in fixed.recs[off[i] : off[i + 1]]]
        want = [
            (m.txp, m.pos, 0 if m.fwd else 1, m.score)
            for m in qm.map_read(idx, codes[i][: lens[i]], cfg)
        ]
        assert got == want, f"read {i}"
    assert fixed.counters["records"] == sum(len(qm.map_read(idx, codes[i][: lens[i]], cfg)) for i in range(len(reads)))
    assert fixed.counters["host_fallback"] > 0


def test_cli_starved_budget_equals_ample_budget(tmp_path, rng):
    """End-to-end: --expandBudget 1 (heavy fallback) == --expandBudget 64."""
    idx, txps, shared = _repetitive_world(tmp_path, rng)
    fa = str(tmp_path / "rep.fa")
    reads = [(f"r{j}", shared[j : j + 36]) for j in range(0, 24, 2)]
    fq = write_fastq(str(tmp_path / "r.fq"), [(n, s, 0, 0, False) for n, s in reads])
    idx_dir = str(tmp_path / "idx")
    r = subprocess.run(
        [sys.executable, "-m", "rapmap_tpu.cli", "quasiindex", "-t", fa, "-i", idx_dir, "-k", "11"],
        capture_output=True, text=True, env=ENV, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr
    outs = []
    for budget in ("1", "64"):
        out = str(tmp_path / f"out{budget}.sam")
        r = subprocess.run(
            [sys.executable, "-m", "rapmap_tpu.cli", "quasimap", "-i", idx_dir,
             "-r", fq, "-o", out, "--expandBudget", budget],
            capture_output=True, text=True, env=ENV, cwd="/root/repo", timeout=560,
        )
        assert r.returncode == 0, r.stderr
        outs.append([ln for ln in open(out).read().splitlines() if not ln.startswith("@")])
    assert outs[0] == outs[1]
    assert outs[0], "expected records"


def test_fallback_scores_match_oracle(tmp_path, rng):
    """--mappingScore + starved budget: device-scored records and oracle-
    remapped records (models.fallback._rec_score) must agree with the
    scoring oracle on EVERY row, SE and PE (9-col rows)."""
    from rapmap_tpu.oracle.align import score_mapping_np

    idx, txps, shared = _repetitive_world(tmp_path, rng)
    L = 40
    reads = [shared[j : j + L] for j in range(0, len(shared) - L + 1, 3)]
    reads += [txps[0][1][:L], txps[1][1][100 : 100 + L]]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(
        k=idx.k, expand_budget=1, max_hits_per_strand=L - idx.k + 1,
        mapping_score=True,
    )
    mapper = QuasiMapper(idx, cfg)

    def want_score(rcodes, t, pos, strand):
        return score_mapping_np(
            idx, rcodes, t, pos, strand, cfg.align_band, cfg.align_ma,
            cfg.align_mp, cfg.align_go, cfg.align_ge,
        )

    recsd = mapper.fetch(mapper.map_se_async(codes, lens))
    assert (np.asarray(recsd.flags) & FLAG_DEGRADED).any()
    fixed = fb.remap_se(recsd, codes, lens, len(reads), idx, cfg, qm)
    off = np.concatenate([[0], np.cumsum(fixed.counts)])
    n_rows = 0
    for i in range(len(reads)):
        for t, pos, strand, sc in fixed.recs[off[i] : off[i + 1]]:
            assert sc == want_score(codes[i][: lens[i]], int(t), int(pos), int(strand))
            n_rows += 1
    assert n_rows > 0

    # PE: right mate = rc of a window downstream of the left window
    from rapmap_tpu.index.encode import revcomp_codes

    c2 = np.stack([revcomp_codes(c) for c in codes])
    recsd2 = mapper.fetch(mapper.map_pe_async(codes, lens, c2, lens))
    fixed2 = fb.remap_pe(recsd2, codes, lens, c2, lens, len(reads), idx, cfg, qm)
    assert fixed2.recs.shape[1] == 9
    assert fixed2.counters["host_fallback"] > 0
    off = np.concatenate([[0], np.cumsum(fixed2.counts)])
    n_rows = 0
    for i in range(len(reads)):
        for row in fixed2.recs[off[i] : off[i + 1]]:
            t, p1, s1, h1, p2, s2, h2, sc1, sc2 = (int(x) for x in row)
            if h1:
                assert sc1 == want_score(codes[i][: lens[i]], t, p1, s1)
                n_rows += 1
            if h2:
                assert sc2 == want_score(c2[i][: lens[i]], t, p2, s2)
                n_rows += 1
    assert n_rows > 0
