"""Edge inputs: empty FASTQ, all-N reads, reads shorter than k, tiny batches."""

import json

import numpy as np

from rapmap_tpu.config import MapConfig
from rapmap_tpu.models.quasi import QuasiMapper
from tests.util import random_transcriptome, toy_index, write_fasta, write_fastq
from tests.test_cli_sam import tqm
from tests.test_device_parity import batch_of


def test_empty_fastq_cli(tmp_path):
    rng = np.random.default_rng(101)
    txps = random_transcriptome(rng, n_txps=3, min_len=100, max_len=150)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    assert tqm("quasiindex", "-t", fa, "-i", str(tmp_path / "idx"), "-k", "11").returncode == 0
    empty = str(tmp_path / "empty.fq")
    open(empty, "w").close()
    out = str(tmp_path / "o.sam")
    st = str(tmp_path / "s.json")
    r = tqm("quasimap", "-i", str(tmp_path / "idx"), "-r", empty, "-o", out, "--statsJson", st)
    assert r.returncode == 0, r.stderr
    stats = json.load(open(st))
    assert stats.get("reads_total", 0) == 0
    # header still written
    assert open(out).read().startswith("@HD")


def test_all_n_and_short_reads(tmp_path):
    rng = np.random.default_rng(102)
    idx, txps = toy_index(tmp_path, rng, n_txps=3, min_len=120, max_len=200, k=11)
    L = 40
    seqs = [
        b"N" * 40,                      # all N
        txps[0][1][:8],                 # shorter than k
        txps[0][1][:11],                # exactly k
        b"N" * 12 + txps[1][1][20:48],  # N prefix then mappable suffix
    ]
    codes, lens = batch_of(seqs, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=30, expand_budget=64, max_out=16)
    mapper = QuasiMapper(idx, cfg)
    out, ctr = mapper.map_se(codes, lens)
    from rapmap_tpu.oracle import quasimap as qm

    for i in range(len(seqs)):
        want = [(m.txp, m.pos, m.fwd) for m in qm.map_read(idx, codes[i][: lens[i]], cfg)]
        got = [
            (int(out.t[i, j]), int(out.pos[i, j]), out.strand[i, j] == 0)
            for j in range(out.t.shape[1]) if out.t[i, j] != -1
        ]
        assert got == want, (i, got, want)
    assert not out.mapped[0] and not out.mapped[1]
    assert out.mapped[2] and out.mapped[3]


def test_single_read_batch(tmp_path):
    rng = np.random.default_rng(103)
    idx, txps = toy_index(tmp_path / "s", rng, n_txps=3, min_len=120, max_len=200, k=11)
    codes, lens = batch_of([txps[0][1][10:40]], 30)
    mapper = QuasiMapper(idx, MapConfig(k=idx.k, max_hits_per_strand=20, expand_budget=64, max_out=8))
    out, ctr = mapper.map_se(codes, lens)
    assert out.mapped[0] and int(out.t[0, 0]) == 0 and int(out.pos[0, 0]) == 10
    wr = mapper.fetch(mapper.map_se_async(codes, lens))
    assert wr.counters["reads_mapped"] == 1 and wr.total >= 1
