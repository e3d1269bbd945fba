"""Core index artifact (index_type quasi_core; VERDICT r4 item 5 closure):
stores only {text, sa, txp geometry, CHD} — ~11 GB at 2.2 Gbase vs 89 GB
full / 62 GB mapping-only — and re-derives the k-mer interval table, prefix
LUT, text pack and sa_txp/sa_tpos at load, verified bit-exact against the
save-time content hashes. load_index returns a full QuasiIndex, so every
engine (and the CLI) maps from it unchanged."""

import os

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.builder import build_quasi_index
from rapmap_tpu.index.format import QuasiIndex, load_index, save_core_index
from rapmap_tpu.parallel.staged import StagedMapper
from tests.test_device_parity import batch_of
from tests.util import random_transcriptome, sample_reads, write_fasta

_DERIVED = ["text2b", "sa_txp", "sa_tpos", "kmer_hi", "kmer_lo",
            "kmer_b", "kmer_e", "prefix_lut"]


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("coreidx")
    rng = np.random.default_rng(91)
    txps = random_transcriptome(rng, n_txps=6, min_len=150, max_len=300)
    fa = write_fasta(str(tmp / "t.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    info = save_core_index(idx, str(tmp / "coreidx"))
    reads = [r[1] for r in sample_reads(
        rng, txps, 32, read_len=40, error_rate=0.03, n_frac=0.02)]
    codes, _lens = batch_of(reads, 40)
    return idx, str(tmp / "coreidx"), info, codes


def test_core_roundtrip_bitexact(world):
    idx, cdir, info, _codes = world
    ridx = load_index(cdir)
    assert isinstance(ridx, QuasiIndex)
    for name in ["text", "sa", "txp_offsets", "txp_lens"] + _DERIVED:
        np.testing.assert_array_equal(
            np.asarray(getattr(ridx, name)), np.asarray(getattr(idx, name)),
            err_msg=name)
        assert np.asarray(getattr(ridx, name)).dtype == \
            np.asarray(getattr(idx, name)).dtype, name
    assert ridx.txp_names == idx.txp_names
    # CHD stored verbatim (placement is thread-order dependent)
    if idx.chd_dir is not None:
        for n in ("chd_dir", "chd_perm", "chd_cls"):
            np.testing.assert_array_equal(
                np.asarray(getattr(ridx, n)), np.asarray(getattr(idx, n)))
    # the artifact drops the k-mer table + derived columns entirely
    derived_bytes = sum(np.asarray(getattr(idx, n)).nbytes for n in _DERIVED)
    assert info["bytes"] < derived_bytes + idx.text.nbytes
    assert set(info["per_array"]) >= {"text", "sa", "txp_offsets", "txp_lens"}
    # sa narrowed on disk (text fits uint32), restored to the build dtype
    assert np.load(os.path.join(cdir, "sa.npy"), mmap_mode="r").dtype == np.uint32
    assert np.asarray(ridx.sa).dtype == np.asarray(idx.sa).dtype


def test_core_big_sa_roundtrip(tmp_path):
    rng = np.random.default_rng(92)
    txps = random_transcriptome(rng, n_txps=3, min_len=120, max_len=200)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    idx = build_quasi_index(fa, k=11, big_sa=True)
    assert np.asarray(idx.sa).dtype == np.int64
    save_core_index(idx, str(tmp_path / "core"))
    ridx = load_index(str(tmp_path / "core"))
    assert np.asarray(ridx.sa).dtype == np.int64
    np.testing.assert_array_equal(np.asarray(ridx.sa), np.asarray(idx.sa))


def test_core_staged_mapping_parity(world):
    idx, cdir, _info, codes = world
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8)
    full = StagedMapper(idx, cfg, n_shards=3, read_len=40, batch=len(codes))
    r_full, _ = full.map_batches([codes])
    ridx = load_index(cdir)
    core = StagedMapper(ridx, cfg, n_shards=3, read_len=40, batch=len(codes))
    r_core, _ = core.map_batches([codes])
    assert r_full == r_core


def test_core_corrupt_stored_fails(world):
    _idx, cdir, _info, _codes = world
    path = os.path.join(cdir, "sa.npy")
    raw = bytearray(open(path, "rb").read())
    raw[-5] ^= 0xFF
    open(path, "wb").write(bytes(raw))
    try:
        with pytest.raises(ValueError, match="content-hash"):
            load_index(cdir)
    finally:
        raw[-5] ^= 0xFF
        open(path, "wb").write(bytes(raw))


def test_cli_core_index_build_and_map(tmp_path):
    """`tqm quasiindex --coreIndex` + `tqm quasimap -i <core dir>`: the CLI
    builds the compact artifact and maps from it with records identical to
    the full index (core reloads into a full QuasiIndex, so the default
    engine path is exercised); pseudomap refuses the type."""
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

    rng = np.random.default_rng(93)
    txps = random_transcriptome(rng, n_txps=4, min_len=150, max_len=250)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    reads = _sr(rng, txps, 12, read_len=36)
    fq = write_fastq(str(tmp_path / "r.fq"), reads)
    r = tqm("quasiindex", "-t", fa, "-i", str(tmp_path / "idx"), "-k", "11")
    assert r.returncode == 0, r.stderr
    r = tqm("quasiindex", "-t", fa, "-i", str(tmp_path / "core"), "-k", "11",
            "--coreIndex")
    assert r.returncode == 0, r.stderr
    assert "core index written" in r.stderr

    full = tqm("quasimap", "-i", str(tmp_path / "idx"), "-r", fq,
               "-o", str(tmp_path / "full.sam"), "--maxReadLen", "36")
    assert full.returncode == 0, full.stderr
    core = tqm("quasimap", "-i", str(tmp_path / "core"), "-r", fq,
               "-o", str(tmp_path / "core.sam"), "--maxReadLen", "36")
    assert core.returncode == 0, core.stderr
    recs = lambda p: sorted(
        ln for ln in open(p).read().splitlines() if not ln.startswith("@"))
    assert recs(str(tmp_path / "core.sam")) == recs(str(tmp_path / "full.sam"))

    r = tqm("pseudomap", "-i", str(tmp_path / "core"), "-r", fq, "-o", "-")
    assert r.returncode == 1 and "expected pseudo" in r.stderr


def test_core_reconstruction_mismatch_fails(world):
    """A derived-array hash that no longer matches (header tamper stands in
    for a derivation regression) must refuse to map, naming the array."""
    import json

    _idx, cdir, _info, _codes = world
    hpath = os.path.join(cdir, "header.json")
    orig = open(hpath).read()
    h = json.loads(orig)
    h["hashes"]["kmer_hi"] = "0" * 16
    open(hpath, "w").write(json.dumps(h))
    try:
        with pytest.raises(ValueError, match="reconstruction of kmer_hi"):
            load_index(cdir)
    finally:
        open(hpath, "w").write(orig)
