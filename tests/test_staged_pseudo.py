"""Host-staged pseudo engine (parallel/staged.StagedPseudoEngine): mini-scale
parity vs the pseudo oracle / replicated engine — the genome-scale CSR path
that lifts the big-occ HBM scope gate (SEMANTICS.md §7/§10)."""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.builder import build_pseudo_index
from rapmap_tpu.oracle import pseudomap as pm
from rapmap_tpu.parallel.staged import StagedPseudoEngine, StagedPseudoMapper
from tests.test_device_parity import batch_of
from tests.util import random_transcriptome, sample_reads, write_fasta


def _repetitive_pseudo(tmp_path, rng, k=11, n_txps=6):
    base = random_transcriptome(rng, n_txps=n_txps, min_len=150, max_len=260)
    shared = base[0][1][30:120]
    txps = [(f"t{i}", s[:30] + shared + s[30:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path / "p.fa"), txps)
    return build_pseudo_index(fa, k=k), txps


def test_staged_pseudo_vs_oracle(tmp_path):
    rng = np.random.default_rng(51)
    idx, txps = _repetitive_pseudo(tmp_path, rng)
    L = 40
    reads = [r[1] for r in sample_reads(
        rng, txps, 40, read_len=L, error_rate=0.03, n_frac=0.02)]
    from tests.util import BASES

    reads.append(BASES[rng.integers(0, 4, L)].tobytes())  # junk
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8)
    sm = StagedPseudoEngine(idx, cfg, n_shards=3, read_len=L, batch=len(reads))
    results, stats = sm.map_batches([codes])
    assert stats["anchor_overflow"] == 0
    got = results[0]
    for i in range(len(reads)):
        want = pm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        assert got[i] == exp, f"read {i}: staged {got[i]} != oracle {exp}"


@pytest.mark.parametrize(
    "kw",
    [
        dict(consistent_hits=True),
        dict(consistent_hits=True, fuzzy=True),
        dict(quasi_coverage=0.5),
        dict(max_num_hits=2),
        dict(max_interval=4),
    ],
)
def test_staged_pseudo_config_sweep(tmp_path, kw):
    """-c/-f/-z/-m/maxInterval through the staged pseudo collate == oracle."""
    rng = np.random.default_rng(52)
    idx, txps = _repetitive_pseudo(tmp_path, rng)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 28, read_len=L, error_rate=0.03)]
    chim = txps[0][1][10:30] + txps[1][1][60:80]
    reads.append(chim)
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=L - idx.k + 1, **kw)
    sm = StagedPseudoEngine(idx, cfg, n_shards=3, read_len=L, batch=len(reads))
    results, _ = sm.map_batches([codes])
    for i in range(len(reads)):
        want = pm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        assert results[0][i] == exp, f"read {i} {kw}"


def test_staged_pseudo_variable_lens(tmp_path):
    rng = np.random.default_rng(53)
    idx, txps = _repetitive_pseudo(tmp_path, rng)
    L = 44
    seqs = []
    for r in sample_reads(rng, txps, 24, read_len=L, error_rate=0.02):
        cut = int(rng.integers(idx.k + 2, L + 1))
        seqs.append(r[1][:cut])
    codes, lens = batch_of(seqs, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8)
    sm = StagedPseudoEngine(idx, cfg, n_shards=2, read_len=L, batch=len(seqs))
    results, _ = sm.map_batches([codes], lens=[lens])
    for i in range(len(seqs)):
        want = pm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        assert results[0][i] == exp, f"read {i}"


def test_staged_pseudo_pe_parity(tmp_path):
    rng = np.random.default_rng(54)
    idx, txps = _repetitive_pseudo(tmp_path, rng)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 40
    p1s, p2s = [], []
    for _ in range(12):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        if len(seq) < 150:
            continue
        a = int(rng.integers(0, len(seq) - 120))
        p1s.append(seq[a : a + L])
        p2s.append(seq[a + 100 - L : a + 100].translate(comp)[::-1])
    c1, l1 = batch_of(p1s, L)
    c2, l2 = batch_of(p2s, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8)
    sm = StagedPseudoEngine(idx, cfg, n_shards=3, read_len=L, batch=len(p1s))
    res = sm.map_group([("pe", c1, l1, c2, l2)])[0]
    for i in range(len(p1s)):
        want, conc = pm.map_pair(idx, c1[i][: l1[i]], c2[i][: l2[i]], cfg)
        assert bool(res["conc"][i]) == conc, i
        got = [
            (t, p1 if h1 else None, p2 if h2 else None)
            for t, p1, s1, h1, p2, s2, h2 in res["recs"][i]
        ]
        exp = [(m.txp, m.pos1, m.pos2) for m in want]
        assert got == exp, f"pair {i}: {got} != {exp}"


def test_staged_pseudo_adapter_wire(tmp_path):
    """StagedPseudoMapper's async adapter: padded partial batches, wire-result
    counters, records == oracle; forced staged via explicit n_shards."""
    rng = np.random.default_rng(55)
    idx, txps = _repetitive_pseudo(tmp_path, rng)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 10, read_len=L, error_rate=0.02)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8)
    ad = StagedPseudoMapper(idx, cfg, batch=16, read_len=L, n_shards=2)
    h = ad.map_se_async(codes, lens)
    wr = ad.fetch(h)
    assert wr.counters["reads_total"] == len(reads)
    exp_recs = []
    mapped = 0
    for i in range(len(reads)):
        want = pm.map_read(idx, codes[i][: lens[i]], cfg)
        mapped += bool(want)
        exp_recs.extend((m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want)
    assert wr.counters["reads_mapped"] == mapped
    got = [tuple(int(v) for v in row) for row in wr.recs]
    assert got == exp_recs


def test_staged_quasi_budget_rerun_exact(tmp_path):
    """A too-small anchor budget escalates to the full-width stage-A rerun
    (counted in stats) with results still oracle-exact — the budgeted fast
    path can never silently drop anchors."""
    from rapmap_tpu.index.builder import build_quasi_index
    from rapmap_tpu.oracle import quasimap as qm
    from rapmap_tpu.parallel.staged import StagedMapper

    rng = np.random.default_rng(57)
    base = random_transcriptome(rng, n_txps=6, min_len=150, max_len=260)
    shared = base[0][1][30:120]
    txps = [(f"t{i}", s[:30] + shared + s[30:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path / "g.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 24, read_len=L, error_rate=0.02)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=16)
    sm = StagedMapper(idx, cfg, n_shards=3, read_len=L, batch=len(reads),
                      anchor_budget=8)
    results, stats = sm.map_batches([codes])
    assert stats["anchor_overflow"] > 0  # reruns happened...
    for i in range(len(reads)):
        want = qm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        assert results[0][i] == exp, f"read {i}"  # ...and cost no exactness


def test_staged_pseudo_strict_matches_replicated(tmp_path):
    """-s has no pseudo-oracle pin (the reference's pseudomap lacks the curb
    [REF-VERIFY]); staged and replicated engines must still agree on it."""
    from rapmap_tpu.models.pseudo import PseudoMapper

    rng = np.random.default_rng(56)
    idx, txps = _repetitive_pseudo(tmp_path, rng)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 24, read_len=L, error_rate=0.03)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8, strict_check=True,
                    expand_budget=2048, max_out=256)
    out, _ = PseudoMapper(idx, cfg).map_se(codes, lens)
    sm = StagedPseudoEngine(idx, cfg, n_shards=3, read_len=L, batch=len(reads))
    results, _ = sm.map_batches([codes])
    for i in range(len(reads)):
        rep = [
            (int(out.t[i, j]), int(out.pos[i, j]), int(out.strand[i, j]),
             int(out.score[i, j]))
            for j in range(out.t.shape[1]) if out.t[i, j] != -1
        ]
        assert results[0][i] == rep, f"read {i}"
