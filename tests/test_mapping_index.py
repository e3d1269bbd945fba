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


def test_cli_quasimap_on_mapping_artifact(tmp_path):
    """`tqm quasimap -i <quasi_map dir>` routes to the staged engine and
    emits the same records as the full index; --mappingScore and
    --engine replicated are refused with clear errors."""
    import subprocess
    import sys

    from tests.util import sample_reads as _sr, write_fastq

    ENV = dict(
        os.environ, TQM_FORCE_CPU="1",
        XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
        + " --xla_cpu_parallel_codegen_split_count=1",
    )

    def tqm(*args):
        return subprocess.run(
            [sys.executable, "-m", "rapmap_tpu.cli", *args],
            capture_output=True, text=True, env=ENV, cwd="/root/repo",
            timeout=560,
        )

    rng = np.random.default_rng(82)
    txps = random_transcriptome(rng, n_txps=4, min_len=150, max_len=250)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    reads = _sr(rng, txps, 12, read_len=36)
    fq = write_fastq(str(tmp_path / "r.fq"), reads)
    r = tqm("quasiindex", "-t", fa, "-i", str(tmp_path / "idx"), "-k", "11")
    assert r.returncode == 0, r.stderr
    idx = load_index(str(tmp_path / "idx"), mmap=False)
    save_mapping_index(idx, str(tmp_path / "mapidx"))

    full = tqm("quasimap", "-i", str(tmp_path / "idx"), "-r", fq,
               "-o", str(tmp_path / "full.sam"), "--engine", "staged",
               "--maxReadLen", "36")
    assert full.returncode == 0, full.stderr
    pruned = tqm("quasimap", "-i", str(tmp_path / "mapidx"), "-r", fq,
                 "-o", str(tmp_path / "map.sam"), "--maxReadLen", "36")
    assert pruned.returncode == 0, pruned.stderr
    assert "shard 0:" in pruned.stderr  # staged-engine sweep log signature
    recs = lambda p: sorted(
        ln for ln in open(p).read().splitlines() if not ln.startswith("@"))
    assert recs(str(tmp_path / "map.sam")) == recs(str(tmp_path / "full.sam"))

    r = tqm("quasimap", "-i", str(tmp_path / "mapidx"), "-r", fq, "-o", "-",
            "--mappingScore")
    assert r.returncode == 1 and "mapping-only" in r.stderr
    r = tqm("quasimap", "-i", str(tmp_path / "mapidx"), "-r", fq, "-o", "-",
            "--engine", "replicated")
    assert r.returncode == 1 and "replicated" in r.stderr
    r = tqm("pseudomap", "-i", str(tmp_path / "mapidx"), "-r", fq, "-o", "-")
    assert r.returncode == 1 and "expected pseudo" in r.stderr
