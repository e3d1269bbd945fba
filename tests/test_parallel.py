"""Sharded (8 virtual CPU devices) mapping == single-device mapping."""

import jax
import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.models.quasi import QuasiMapper
from rapmap_tpu.parallel import dp
from tests.util import sample_reads, toy_index
from tests.test_device_parity import batch_of


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_matches_single_device(tmp_path):
    rng = np.random.default_rng(17)
    idx, txps = toy_index(tmp_path, rng, n_txps=6, min_len=150, max_len=300, k=11)
    reads = sample_reads(rng, txps, 61, read_len=40, error_rate=0.02)  # 61: ragged tail
    L = 40
    seqs = [r[1] for r in reads]
    n_dev = 8
    per = 8  # shard batch
    B = n_dev * per
    codes, lens = batch_of(seqs + [b""] * (B - len(seqs)), L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=30, expand_budget=512, max_out=32)
    mapper = QuasiMapper(idx, cfg)

    out1, ctr1 = mapper.map_se(codes, lens, n_valid=len(seqs))
    mesh = dp.make_mesh(n_dev)
    nv = dp.split_valid(len(seqs), n_dev, per)
    out8, ctr8 = dp.map_batch_se_dp(
        mapper.didx, mapper.st, codes, lens, nv, cfg, mesh
    )
    out8 = jax.tree.map(np.asarray, out8)
    ctr8 = jax.tree.map(np.asarray, ctr8)
    for field in ("t", "pos", "strand", "score"):
        assert np.array_equal(getattr(out1, field), getattr(out8, field)), field
    for field in ctr1._fields:
        assert int(getattr(ctr1, field)) == int(getattr(ctr8, field)), field


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dp_pe_matches_single_device(tmp_path):
    rng = np.random.default_rng(19)
    idx, txps = toy_index(tmp_path, rng, n_txps=5, min_len=250, max_len=400, k=11)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 36
    lefts, rights = [], []
    for _ in range(30):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        a = int(rng.integers(0, len(seq) - 130))
        lefts.append(seq[a : a + L])
        rights.append(seq[a + 100 - L : a + 100].translate(comp)[::-1])
    n_dev, per = 8, 4
    B = n_dev * per
    c1, l1 = batch_of(lefts + [b""] * (B - len(lefts)), L)
    c2, l2 = batch_of(rights + [b""] * (B - len(rights)), L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=26, expand_budget=512, max_out=32)
    mapper = QuasiMapper(idx, cfg)
    _, _, po1, ctr1 = mapper.map_pe(c1, l1, c2, l2, n_valid=len(lefts))
    mesh = dp.make_mesh(n_dev)
    nv = dp.split_valid(len(lefts), n_dev, per)
    _, _, po8, ctr8 = dp.map_batch_pe_dp(mapper.didx, mapper.st, c1, l1, c2, l2, nv, cfg, mesh)
    po8 = jax.tree.map(np.asarray, po8)
    for field in ("t", "p1", "s1", "has1", "p2", "s2", "has2", "concordant"):
        assert np.array_equal(getattr(po1, field), getattr(po8, field)), field
    assert int(ctr1.reads_mapped) == int(np.asarray(ctr8.reads_mapped))
