"""Mapping-only index artifact (index_type quasi_map; VERDICT r4 item 5):
the pruned on-disk set the host-staged engine maps from — no text column,
uint32 sa/kmer_b, uint32 interval widths for kmer_e. Parity: staged mapping
off the artifact must equal staged mapping off the full index bit-for-bit."""

import os

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.builder import build_quasi_index
from rapmap_tpu.index.format import (
    MappingQuasiIndex,
    load_index,
    save_mapping_index,
)
from rapmap_tpu.parallel.staged import StagedMapper
from tests.test_device_parity import batch_of
from tests.util import random_transcriptome, sample_reads, write_fasta


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("mapidx")
    rng = np.random.default_rng(81)
    txps = random_transcriptome(rng, n_txps=6, min_len=150, max_len=300)
    fa = write_fasta(str(tmp / "t.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    info = save_mapping_index(idx, str(tmp / "mapidx"))
    reads = [r[1] for r in sample_reads(
        rng, txps, 32, read_len=40, error_rate=0.03, n_frac=0.02)]
    codes, _lens = batch_of(reads, 40)
    return idx, str(tmp / "mapidx"), info, codes


def test_artifact_smaller_and_verifies(world):
    idx, mdir, info, _codes = world
    midx = load_index(mdir, verify=True)
    assert isinstance(midx, MappingQuasiIndex)
    assert np.asarray(midx.sa).dtype == np.uint32
    assert np.asarray(midx.kmer_w).dtype == np.uint32
    full_bytes = (idx.text.nbytes + idx.sa.nbytes + idx.kmer_b.nbytes
                  + idx.kmer_e.nbytes)
    pruned_same = (info["per_array"]["sa"] + info["per_array"]["kmer_b"]
                   + info["per_array"]["kmer_w"])
    assert pruned_same < full_bytes  # text dropped + narrowed columns
    # kmer_e synthesis matches the full index exactly
    e = midx.kmer_e[0 : len(idx.kmer_b)]
    np.testing.assert_array_equal(e, np.asarray(idx.kmer_e, dtype=np.int64))


def test_staged_parity_full_vs_mapping_artifact(world):
    idx, mdir, _info, codes = world
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8)
    full = StagedMapper(idx, cfg, n_shards=3, read_len=40, batch=len(codes))
    r_full, _ = full.map_batches([codes])
    midx = load_index(mdir)
    pruned = StagedMapper(midx, cfg, n_shards=3, read_len=40, batch=len(codes))
    r_map, _ = pruned.map_batches([codes])
    assert r_full == r_map


def test_mapping_score_refused_on_artifact(world):
    _idx, mdir, _info, codes = world
    midx = load_index(mdir)
    cfg = MapConfig(k=midx.k, mapping_score=True)
    with pytest.raises(ValueError, match="mapping-only"):
        StagedMapper(midx, cfg, n_shards=2, read_len=40, batch=len(codes))


def test_corrupt_artifact_fails_hash(world):
    _idx, mdir, _info, _codes = world
    path = os.path.join(mdir, "kmer_w.npy")
    raw = bytearray(open(path, "rb").read())
    raw[-5] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    try:
        with pytest.raises(ValueError, match="content-hash"):
            load_index(mdir, verify=True)
    finally:
        raw[-5] ^= 0xFF
        open(path, "wb").write(bytes(raw))
