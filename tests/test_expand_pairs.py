"""Pair-row expansion (cfg.expand_pairs): bit-exactness vs the single-slot
pool and vs the oracle on repetitive (wide-interval) indexes.

The pair path halves expansion gathers by resolving two adjacent SA
positions per sa_meta pair-row gather (ops/collate.py, device_index
meta_pairs); the voting element multiset must be identical, so every
downstream result (records, counters, flags) must match exactly.
"""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.builder import build_quasi_index
from rapmap_tpu.models.quasi import QuasiMapper
from tests.test_device_parity import assert_se_parity, batch_of, parity_cfg
from tests.util import random_transcriptome, sample_reads, write_fasta


def repetitive_index(tmp_path, rng, k=11):
    """Transcripts sharing a long exon -> wide SA intervals (multimapping)."""
    base = random_transcriptome(rng, n_txps=4, min_len=150, max_len=220)
    shared = base[0][1][20:120]
    txps = [(f"t{i}", s[:30] + shared + s[30:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path / "rep.fa"), txps)
    return build_quasi_index(fa, k=k), txps


def test_pairs_oracle_parity(tmp_path):
    rng = np.random.default_rng(5)
    idx, txps = repetitive_index(tmp_path, rng)
    reads = [r[1] for r in sample_reads(rng, txps, 24, read_len=50, error_rate=0.02)]
    cfg = parity_cfg(idx, 50, expand_pairs=True)
    assert_se_parity(idx, reads, cfg)


@pytest.mark.parametrize(
    "kw", [dict(), dict(consistent_hits=True), dict(strict_check=True),
           dict(quasi_coverage=0.5), dict(max_num_hits=3)]
)
def test_pairs_vs_single_bitexact(tmp_path, kw):
    """Device-vs-device: pair expansion == single-slot expansion exactly."""
    rng = np.random.default_rng(6)
    idx, txps = repetitive_index(tmp_path, rng)
    reads = [r[1] for r in sample_reads(rng, txps, 32, read_len=48, error_rate=0.03)]
    codes, lens = batch_of(reads, 48)
    cfg1 = parity_cfg(idx, 48, **kw)
    cfg2 = parity_cfg(idx, 48, expand_pairs=True, **kw)
    m1 = QuasiMapper(idx, cfg1)
    m2 = QuasiMapper(idx, cfg2)
    o1, c1 = m1.map_se(codes, lens)
    o2, c2 = m2.map_se(codes, lens)
    for f, a, b in zip(o1._fields, o1, o2):
        assert np.array_equal(a, b), f"MapOut.{f} differs under expand_pairs"
    for f, a, b in zip(c1._fields, c1, c2):
        assert np.array_equal(a, b), f"Counters.{f} differs under expand_pairs"


def test_pairs_wire_records_bitexact(tmp_path):
    """The chunked wire path (production pipeline) matches too."""
    rng = np.random.default_rng(7)
    idx, txps = repetitive_index(tmp_path, rng)
    reads = [r[1] for r in sample_reads(rng, txps, 64, read_len=48, error_rate=0.02)]
    codes, lens = batch_of(reads, 48)
    res = []
    for pairs in (False, True):
        cfg = MapConfig(
            k=idx.k, max_hits_per_strand=8, expand_budget=32, max_out=16,
            rec_slots=8, chunk=16, expand_pairs=pairs,
        )
        m = QuasiMapper(idx, cfg)
        wr = m.fetch(m.map_se_async(codes, lens))
        res.append(wr)
    a, b = res
    assert np.array_equal(a.recs, b.recs)
    assert np.array_equal(a.counts, b.counts)
    assert a.counters == b.counters


def test_pairs_auto_enable(tmp_path):
    """Auto-sizing turns pairs on for wide-interval indexes, off for unique."""
    rng = np.random.default_rng(8)
    idx_rep, _ = repetitive_index(tmp_path, rng)
    m = QuasiMapper(idx_rep, MapConfig(k=idx_rep.k, expand_budget=0))
    assert m.cfg.expand_pairs, "repetitive index should auto-enable pair expansion"
    assert m.didx.sa_meta.shape[1] == 4
    base = random_transcriptome(rng, n_txps=4, min_len=150, max_len=220)
    fa = write_fasta(str(tmp_path / "uniq.fa"), base)
    idx_u = build_quasi_index(fa, k=15)
    mu = QuasiMapper(idx_u, MapConfig(k=15, expand_budget=0))
    assert not mu.cfg.expand_pairs, "unique index should keep single-slot pool"


def test_pairs_over_budget_flags(tmp_path):
    """Pool exhaustion under pairs still flags (never wrong output)."""
    rng = np.random.default_rng(9)
    idx, txps = repetitive_index(tmp_path, rng)
    reads = [r[1] for r in sample_reads(rng, txps, 8, read_len=50)]
    codes, lens = batch_of(reads, 50)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=40, expand_budget=1,
                    expand_pairs=True, max_out=8)
    m = QuasiMapper(idx, cfg)
    out, ctr = m.map_se(codes, lens)
    assert out.over_budget.any(), "tiny pair pool should overflow on shared-exon reads"
