"""Host-staged sharded mapper (parallel/staged.py): mini-scale parity vs the
oracle — the same checks scripts/genome_scale.py runs at >= 2^31 scale."""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.builder import build_quasi_index
from rapmap_tpu.oracle import quasimap as qm
from rapmap_tpu.parallel.staged import StagedMapper
from tests.test_device_parity import batch_of
from tests.util import random_transcriptome, sample_reads, write_fasta


@pytest.mark.parametrize("big_sa", [False, True])
def test_staged_vs_oracle(tmp_path, big_sa):
    rng = np.random.default_rng(31)
    base = random_transcriptome(rng, n_txps=6, min_len=150, max_len=260)
    shared = base[0][1][30:120]
    txps = [(f"t{i}", s[:30] + shared + s[30:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path / "g.fa"), txps)
    idx = build_quasi_index(fa, k=11, big_sa=big_sa)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 48, read_len=L, error_rate=0.02)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=16, expand_budget=256, max_out=64)
    sm = StagedMapper(idx, cfg, n_shards=3, read_len=L, batch=len(reads))
    results, stats = sm.map_batches([codes])
    assert stats["anchor_overflow"] == 0
    got = results[0]
    for i, r in enumerate(reads):
        want = qm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        assert got[i] == exp, f"read {i}: staged {got[i]} != oracle {exp}"


def test_staged_read_len_cap(tmp_path):
    rng = np.random.default_rng(32)
    txps = random_transcriptome(rng, n_txps=2, min_len=200, max_len=220)
    fa = write_fasta(str(tmp_path / "s.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    with pytest.raises(ValueError, match="sa_cmp"):
        StagedMapper(idx, MapConfig(k=11), n_shards=2, read_len=120, batch=4)


def test_staged_chunked_upload_parity(tmp_path, monkeypatch):
    """Row-sliced shard uploads (relay-friendly multi-part transfers) are
    result-identical to whole-array uploads: force a tiny per-transfer cap
    so every shard array goes up in many pieces."""
    import rapmap_tpu.parallel.staged as stg

    rng = np.random.default_rng(33)
    txps = random_transcriptome(rng, n_txps=5, min_len=150, max_len=240)
    fa = write_fasta(str(tmp_path / "c.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 24, read_len=L, error_rate=0.02)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=16, expand_budget=256, max_out=64)
    whole, _ = StagedMapper(idx, cfg, n_shards=2, read_len=L, batch=len(reads)).map_batches([codes])
    monkeypatch.setattr(stg, "_MAX_XFER", 4096)
    parts, _ = StagedMapper(idx, cfg, n_shards=2, read_len=L, batch=len(reads)).map_batches([codes])
    assert whole == parts
