"""Staged-engine geometry edge cases (ADVICE r4): occ-skew rebalance of
pseudo shard cuts, LUT-term shard sizing, and empty-shard pad-key fills."""

import math

import numpy as np

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.builder import build_pseudo_index, build_quasi_index
from rapmap_tpu.parallel import staged
from rapmap_tpu.parallel.staged import (
    StagedPseudoEngine,
    pseudo_shard_device_arrays,
    shard_device_arrays,
    staged_geometry,
    staged_geometry_pseudo,
)
from tests.test_device_parity import batch_of
from tests.util import random_transcriptome, sample_reads, write_fasta


class _FakeCsr:
    """Minimal pseudo-index surface for staged_geometry_pseudo: a key-sorted
    k-mer table (khi/klo) + CSR offsets with controlled occurrence skew."""

    def __init__(self, k: int, prefixes: np.ndarray, occ_counts: np.ndarray):
        # place each row in its own prefix bucket: key = prefix << 2*(k-p)
        # with p=4 for K=64 (staged_geometry_pseudo's formula); klo carries
        # the prefix in its top bits (khi=0 keeps the full-key path in play)
        self.k = k
        self.kmer_hi = np.zeros(len(prefixes), np.uint32)
        self.kmer_lo = ((prefixes.astype(np.uint64) << np.uint64(24))
                        | np.arange(len(prefixes), dtype=np.uint64)).astype(np.uint32)
        self.kmer_off = np.concatenate(
            [[0], np.cumsum(occ_counts.astype(np.int64))]
        )


def test_pseudo_geometry_occ_skew_rebalance(monkeypatch):
    """Row-balanced cuts put 480 of 528 occs in shard 0; with the int32 limit
    lowered to 200 the geometry must re-cut by occurrence count and fit."""
    K = 64
    prefixes = np.arange(K) * 4  # distinct prefix buckets -> cuts can fall
    # anywhere, so occ balance is achievable at prefix granularity
    occ = np.where(np.arange(K) < 16, 30, 1)
    idx = _FakeCsr(16, prefixes, occ)
    # sanity: row-balanced cuts are occ-skewed (this is the ADVICE scenario)
    geo0 = staged_geometry_pseudo(idx, 4)
    assert geo0.S_pad == 480
    monkeypatch.setattr(staged, "_S_PAD_LIMIT", 200)
    geo = staged_geometry_pseudo(idx, 4)
    assert geo.S_pad < 200, f"rebalanced S_pad {geo.S_pad} still over limit"
    # cuts still partition the CSR exactly
    assert geo.slot_cuts[0] == 0 and geo.slot_cuts[-1] == 528
    assert all(a <= b for a, b in zip(geo.slot_cuts, geo.slot_cuts[1:]))
    assert geo.row_cuts[0] == 0 and geo.row_cuts[-1] == K


def test_pseudo_geometry_truly_unsplittable_still_asserts(monkeypatch):
    """A single CSR row over the limit cannot be split at any granularity:
    the fail-fast assert must survive the rebalance."""
    K = 16
    occ = np.ones(K, np.int64)
    occ[7] = 500
    idx = _FakeCsr(16, np.arange(K) * 4, occ)
    monkeypatch.setattr(staged, "_S_PAD_LIMIT", 200)
    try:
        staged_geometry_pseudo(idx, 4)
    except AssertionError as e:
        assert "occ offsets overflow" in str(e)
    else:
        raise AssertionError("expected the S_pad overflow assert")


def test_pseudo_auto_shards_lut_term(tmp_path, monkeypatch):
    """StagedPseudoMapper's device-bytes estimate uses the geometry's real
    prefix-LUT size (4^p * 8), not a hardcoded 4^8 term (ADVICE r4)."""
    rng = np.random.default_rng(77)
    txps = random_transcriptome(rng, n_txps=5, min_len=150, max_len=260)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    idx = build_pseudo_index(fa, k=11)
    K = len(idx.kmer_hi)
    p = max(4, min(idx.k, 12, math.ceil(math.log(max(K, 2), 4)) + 1))
    dev_bytes = K * 16 + 4**p * 8
    # budget sized so the LUT term decides the shard count: with the LUT
    # counted n_shards=2, with the stale 4^8 term it would be 1
    budget_gb = (dev_bytes - 4**p * 4) / 2**30
    monkeypatch.setenv("TQM_STAGED_SHARD_GB", f"{budget_gb:.9f}")
    from rapmap_tpu.parallel.staged import StagedPseudoMapper

    m = StagedPseudoMapper(idx, MapConfig(k=idx.k), batch=8, read_len=40)
    # exact: the stale 4^8 LUT term would give a wildly different count at
    # this scale (where 4^p << 4^8), the corrected formula gives exactly 2
    assert m.sm.n_shards == 2


def _empty_shard(geo):
    for p in range(len(geo.row_cuts) - 1):
        if geo.row_cuts[p] == geo.row_cuts[p + 1]:
            return p
    return None


def _low_complexity_txps(rng):
    """AC-only transcripts: k-mers occupy only 2^p of the 4^p prefix buckets,
    so a high shard count forces duplicate prefix-boundary cuts (the empty-
    shard scenario the pad-fill must survive)."""
    from tests.util import BASES

    seqs = [BASES[rng.integers(0, 2, n)].tobytes() for n in (2000, 1200)]
    return [(f"ac{i}", s) for i, s in enumerate(seqs)]


def test_empty_shard_pad_keys(tmp_path):
    """Empty shards (duplicate prefix-boundary cuts at high n_shards) must
    carry -1 pad keys, not all-zero rows whose key equals the poly-A k-mer."""
    rng = np.random.default_rng(78)
    txps = _low_complexity_txps(rng)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)

    pidx = build_pseudo_index(fa, k=11)
    geo = staged_geometry_pseudo(pidx, 150)
    p = _empty_shard(geo)
    assert p is not None, "expected a duplicate cut at n_shards=150"
    didx, _s0 = pseudo_shard_device_arrays(pidx, geo, p)
    rows = np.asarray(didx.kmer_rows)
    assert (rows[:, 0] == -1).all() and (rows[:, 1] == -1).all()

    qidx = build_quasi_index(fa, k=11)
    qgeo = staged_geometry(qidx, 150)
    qp = _empty_shard(qgeo)
    assert qp is not None
    qdidx, _st, _qs0 = shard_device_arrays(qidx, qgeo, qp)
    qrows = np.asarray(qdidx.kmer_rows)
    assert (qrows[:, 0] == -1).all() and (qrows[:, 1] == -1).all()


def test_staged_pseudo_parity_with_empty_shards(tmp_path):
    """End-to-end: a shard count high enough to create empty shards still
    maps bit-identically to the oracle."""
    from rapmap_tpu.oracle import pseudomap as pm

    rng = np.random.default_rng(79)
    txps = _low_complexity_txps(rng)
    fa = write_fasta(str(tmp_path / "p.fa"), txps)
    idx = build_pseudo_index(fa, k=11)
    L = 40
    reads = [r[1] for r in sample_reads(
        rng, txps, 24, read_len=L, error_rate=0.03, n_frac=0.02)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8)
    sm = StagedPseudoEngine(idx, cfg, n_shards=150, read_len=L, batch=len(reads))
    assert _empty_shard(sm.geo) is not None
    results, _stats = sm.map_batches([codes])
    got = results[0]
    for i in range(len(reads)):
        want = pm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        assert got[i] == exp, f"read {i}: staged {got[i]} != oracle {exp}"
