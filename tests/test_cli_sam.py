"""CLI surface + SAM output: the reference's command surface end-to-end."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from tests.util import random_transcriptome, sample_reads, write_fasta, write_fastq

ENV = dict(
    os.environ,
    TQM_FORCE_CPU="1",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=8 --xla_cpu_parallel_codegen_split_count=1",
)


def tqm(*args, cwd=None, env_extra=None):
    env = dict(ENV, **env_extra) if env_extra else ENV
    return subprocess.run(
        [sys.executable, "-m", "rapmap_tpu.cli", *args],
        capture_output=True, text=True, env=env, cwd="/root/repo", timeout=560,
    )


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(31)
    tmp = tmp_path_factory.mktemp("cli")
    txps = random_transcriptome(rng, n_txps=4, min_len=150, max_len=250)
    fa = write_fasta(str(tmp / "txome.fa"), txps)
    reads = sample_reads(rng, txps, 12, read_len=36)
    fq = write_fastq(str(tmp / "reads.fq"), reads)
    r = tqm("quasiindex", "-t", fa, "-i", str(tmp / "idx"), "-k", "11")
    assert r.returncode == 0, r.stderr
    return tmp, txps, reads, fq


def parse_sam(text: str):
    headers, records = [], []
    for line in text.splitlines():
        (headers if line.startswith("@") else records).append(line)
    return headers, [r.split("\t") for r in records]


def test_version():
    r = tqm("--version")
    assert r.returncode == 0 and "tqm" in r.stdout


def test_quasiindex_then_quasimap_se(world):
    tmp, txps, reads, fq = world
    out = str(tmp / "out.sam")
    stats = str(tmp / "stats.json")
    r = tqm("quasimap", "-i", str(tmp / "idx"), "-r", fq, "-o", out, "--statsJson", stats)
    assert r.returncode == 0, r.stderr
    headers, records = parse_sam(open(out).read())
    assert headers[0].startswith("@HD")
    sq = [h for h in headers if h.startswith("@SQ")]
    assert len(sq) == len(txps)
    assert any(h.startswith("@PG") for h in headers)
    by_name = {}
    for rec in records:
        by_name.setdefault(rec[0], []).append(rec)
    for name, seq, t, p, was_rc in reads:
        recs = by_name[name]
        primary = [r for r in recs if int(r[1]) & 0x100 == 0]
        assert len(primary) == 1
        flags = int(primary[0][1])
        assert flags & 0x4 == 0, f"{name} unmapped"
        found = [(r[2], int(r[3]) - 1, bool(int(r[1]) & 0x10)) for r in recs]
        assert (txps[t][0], p, was_rc) in found, (name, found)
        # SEQ on reverse strand must be rc'd back to the reference strand
        for r in recs:
            if int(r[1]) & 0x10:
                comp = bytes.maketrans(b"ACGT", b"TGCA")
                assert r[9].encode() == seq.translate(comp)[::-1]
            else:
                assert r[9].encode() == seq
        assert all(r[5] == f"{len(seq)}M" for r in recs)
    st = json.load(open(stats))
    assert st["reads_total"] == len(reads) and st["reads_mapped"] == len(reads)


def test_quasimap_pe_sam(world):
    tmp, txps, reads, fq = world
    rng = np.random.default_rng(41)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 36
    p1s, p2s, truth = [], [], []
    for i in range(8):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        a = int(rng.integers(0, len(seq) - 120))
        left = seq[a : a + L]
        right = seq[a + 100 - L : a + 100].translate(comp)[::-1]
        p1s.append((f"p{i}", left))
        p2s.append((f"p{i}", right))
        truth.append((t, a, a + 100 - L))
    f1 = write_fastq(str(tmp / "r1.fq"), p1s)
    f2 = write_fastq(str(tmp / "r2.fq"), p2s)
    out = str(tmp / "pe.sam")
    r = tqm("quasimap", "-i", str(tmp / "idx"), "-1", f1, "-2", f2, "-o", out)
    assert r.returncode == 0, r.stderr
    _, records = parse_sam(open(out).read())
    by_name = {}
    for rec in records:
        by_name.setdefault(rec[0], []).append(rec)
    for i, (t, pl, pr) in enumerate(truth):
        recs = by_name[f"p{i}"]
        firsts = [r for r in recs if int(r[1]) & 0x40 and not int(r[1]) & 0x100]
        seconds = [r for r in recs if int(r[1]) & 0x80 and not int(r[1]) & 0x100]
        assert len(firsts) == 1 and len(seconds) == 1
        f, s = firsts[0], seconds[0]
        assert int(f[1]) & 0x2 and int(s[1]) & 0x2  # proper pair
        assert f[2] == s[2] == txps[t][0]
        assert int(f[3]) - 1 == pl and int(s[3]) - 1 == pr
        assert f[6] == "=" and int(f[7]) - 1 == pr
        tlen_f, tlen_s = int(f[8]), int(s[8])
        assert tlen_f == 100 and tlen_s == -100


def test_engine_dispatch_staged_se(world):
    """The SAME `tqm quasimap` command, forced through the host-staged engine
    by a tiny HBM budget (header-driven dispatch, VERDICT r3 item 2): SAM
    records byte-identical to the replicated engine's."""
    tmp, txps, reads, fq = world
    idxd = str(tmp / "idx")
    out_r, out_s = str(tmp / "er.sam"), str(tmp / "es.sam")
    r = tqm("quasimap", "-i", idxd, "-r", fq, "-o", out_r)
    assert r.returncode == 0, r.stderr
    r2 = tqm("quasimap", "-i", idxd, "-r", fq, "-o", out_s,
             env_extra={"TQM_HBM_GB": "0.000001"})
    assert r2.returncode == 0, r2.stderr
    assert "host-staged engine" in r2.stderr
    _, rec_r = parse_sam(open(out_r).read())
    _, rec_s = parse_sam(open(out_s).read())
    assert rec_s == rec_r


def test_engine_flag_staged_pe_score(world):
    """--engine staged drives PE + --mappingScore through the staged engine;
    records identical to the replicated engine's (staged flag parity)."""
    tmp, txps, reads, fq = world
    rng = np.random.default_rng(47)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 36
    p1s, p2s = [], []
    for i in range(8):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        a = int(rng.integers(0, len(seq) - 120))
        p1s.append((f"q{i}", seq[a : a + L]))
        p2s.append((f"q{i}", seq[a + 100 - L : a + 100].translate(comp)[::-1]))
    f1 = write_fastq(str(tmp / "d1.fq"), p1s)
    f2 = write_fastq(str(tmp / "d2.fq"), p2s)
    idxd = str(tmp / "idx")
    out_r, out_s = str(tmp / "epr.sam"), str(tmp / "eps.sam")
    args = ("quasimap", "-i", idxd, "-1", f1, "-2", f2, "--mappingScore")
    r = tqm(*args, "-o", out_r, "--engine", "replicated")
    assert r.returncode == 0, r.stderr
    r2 = tqm(*args, "-o", out_s, "--engine", "staged")
    assert r2.returncode == 0, r2.stderr
    _, rec_r = parse_sam(open(out_r).read())
    _, rec_s = parse_sam(open(out_s).read())
    assert rec_s == rec_r and len(rec_s) > 0


def test_pseudoindex_pseudomap(world):
    tmp, txps, reads, fq = world
    r = tqm("pseudoindex", "-t", str(tmp / "txome.fa"), "-i", str(tmp / "pidx"), "-k", "11")
    assert r.returncode == 0, r.stderr
    out = str(tmp / "pm.sam")
    r = tqm("pseudomap", "-i", str(tmp / "pidx"), "-r", fq, "-o", out)
    assert r.returncode == 0, r.stderr
    _, records = parse_sam(open(out).read())
    names = {rec[0] for rec in records if not int(rec[1]) & 0x4}
    assert len(names) == len(reads)


def test_engine_dispatch_staged_pseudomap(world):
    """The SAME `tqm pseudomap` command, forced through the host-staged
    pseudo engine by a tiny HBM budget (size-driven dispatch mirroring
    quasimap's): SAM records byte-identical to the replicated engine's."""
    tmp, txps, reads, fq = world
    pidx = str(tmp / "pidx")
    if not (tmp / "pidx" / "header.json").exists():
        r0 = tqm("pseudoindex", "-t", str(tmp / "txome.fa"), "-i", pidx, "-k", "11")
        assert r0.returncode == 0, r0.stderr
    out_r, out_s = str(tmp / "pmr.sam"), str(tmp / "pms.sam")
    r = tqm("pseudomap", "-i", pidx, "-r", fq, "-o", out_r)
    assert r.returncode == 0, r.stderr
    r2 = tqm("pseudomap", "-i", pidx, "-r", fq, "-o", out_s,
             env_extra={"TQM_HBM_GB": "0.000001"})
    assert r2.returncode == 0, r2.stderr
    assert "host-staged engine" in r2.stderr
    _, rec_r = parse_sam(open(out_r).read())
    _, rec_s = parse_sam(open(out_s).read())
    assert rec_s == rec_r and len(rec_s) > 0


def test_index_type_mismatch(world):
    tmp, *_ = world
    r = tqm("quasimap", "-i", str(tmp / "pidx"), "-r", str(tmp / "reads.fq"))
    assert r.returncode == 1
    r2 = tqm("pseudomap", "-i", str(tmp / "idx"), "-r", str(tmp / "reads.fq"))
    assert r2.returncode == 1


def test_no_output_flag(world):
    tmp, txps, reads, fq = world
    stats = str(tmp / "n.json")
    r = tqm("quasimap", "-i", str(tmp / "idx"), "-r", fq, "-n", "--statsJson", stats)
    assert r.returncode == 0, r.stderr
    assert r.stdout == ""
    assert json.load(open(stats))["reads_mapped"] == len(reads)


def test_multi_file_reads(world):
    tmp, txps, reads, fq = world
    # split the FASTQ into two files; comma-separated input must equal the whole
    lines = open(fq).read().splitlines(keepends=False)
    recs = ["\n".join(lines[i : i + 4]) for i in range(0, len(lines), 4)]
    fa_ = str(tmp / "part1.fq")
    fb_ = str(tmp / "part2.fq")
    open(fa_, "w").write("\n".join(recs[:6]) + "\n")
    open(fb_, "w").write("\n".join(recs[6:]) + "\n")
    out1 = str(tmp / "whole.sam")
    out2 = str(tmp / "split.sam")
    assert tqm("quasimap", "-i", str(tmp / "idx"), "-r", fq, "-o", out1).returncode == 0
    r = tqm("quasimap", "-i", str(tmp / "idx"), "-r", f"{fa_},{fb_}", "-o", out2)
    assert r.returncode == 0, r.stderr
    body = lambda p: [l for l in open(p).read().splitlines() if not l.startswith("@PG")]
    assert body(out1) == body(out2)


def test_mixed_read_lengths(tmp_path_factory):
    """One FASTQ mixing lengths across several static buckets (32..320):
    every read maps to its true locus with a full-length CIGAR, and a read
    shorter than k comes back as a clean unmapped record."""
    rng = np.random.default_rng(53)
    tmp = tmp_path_factory.mktemp("mixed")
    txps = random_transcriptome(rng, n_txps=5, min_len=400, max_len=700)
    fa = write_fasta(str(tmp / "txome.fa"), txps)
    r = tqm("quasiindex", "-t", fa, "-i", str(tmp / "idx"), "-k", "11")
    assert r.returncode == 0, r.stderr

    reads = []
    for j, L in enumerate([20, 36, 60, 90, 130, 200, 300, 36, 200, 20]):
        (rd,) = sample_reads(rng, txps, 1, read_len=L)
        reads.append((f"m{j}_L{L}", rd[1], rd[2], rd[3], rd[4]))
    short = b"ACGTACG"  # len 7 < k=11 -> no window, must be unmapped
    reads.append(("tiny", short, -1, -1, False))
    fq = write_fastq(str(tmp / "mixed.fq"), reads)

    out = str(tmp / "out.sam")
    r = tqm("quasimap", "-i", str(tmp / "idx"), "-r", fq, "-o", out,
            "--batchSize", "4")  # force several batches, mixed buckets
    assert r.returncode == 0, r.stderr
    _, records = parse_sam(open(out).read())
    by_name = {}
    for rec in records:
        by_name.setdefault(rec[0], []).append(rec)
    for name, seq, t, p, was_rc in reads[:-1]:
        found = [
            (rec[2], int(rec[3]) - 1, bool(int(rec[1]) & 0x10))
            for rec in by_name[name]
            if int(rec[1]) & 0x4 == 0
        ]
        assert (txps[t][0], p, was_rc) in found, (name, found)
        assert all(rec[5] == f"{len(seq)}M" for rec in by_name[name]
                   if int(rec[1]) & 0x4 == 0)
    tiny = by_name["tiny"]
    assert len(tiny) == 1 and int(tiny[0][1]) & 0x4
