"""Chunk-granular checkpoint/resume: interrupted run + --resume == clean run."""

import json
import os

import numpy as np

from tests.util import random_transcriptome, sample_reads, write_fasta, write_fastq
from tests.test_cli_sam import tqm


def test_resume_produces_identical_sam(tmp_path):
    rng = np.random.default_rng(61)
    txps = random_transcriptome(rng, n_txps=4, min_len=150, max_len=250)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    reads = sample_reads(rng, txps, 40, read_len=36)
    fq = write_fastq(str(tmp_path / "r.fq"), reads)
    r = tqm("quasiindex", "-t", fa, "-i", str(tmp_path / "idx"), "-k", "11")
    assert r.returncode == 0, r.stderr

    # clean run, small batches so there are several checkpoints
    clean = str(tmp_path / "clean.sam")
    r = tqm("quasimap", "-i", str(tmp_path / "idx"), "-r", fq, "-o", clean,
            "--batchSize", "8", "--pipelineDepth", "2")
    assert r.returncode == 0, r.stderr
    assert os.path.exists(clean + ".tqm_progress.json")

    # simulate an interrupted run: take the clean output truncated at the
    # 3rd checkpoint and its progress file, then resume
    part = str(tmp_path / "part.sam")
    r = tqm("quasimap", "-i", str(tmp_path / "idx"), "-r", fq, "-o", part,
            "--batchSize", "8", "--pipelineDepth", "2")
    assert r.returncode == 0, r.stderr
    prog = json.load(open(part + ".tqm_progress.json"))
    assert prog["batches_done"] == 5
    # rewind the progress to 2 batches and chop the file mid-way with garbage tail
    with open(part + ".tqm_progress.json") as f:
        full = json.load(f)
    # recompute a 2-batch progress point by re-running with only 16 reads? instead:
    # simply truncate at a synthetic earlier point recorded during the run is not
    # observable; emulate crash-after-2-batches by crafting the progress file from
    # a fresh partial run with 16 reads
    fq16 = write_fastq(str(tmp_path / "r16.fq"), reads[:16])
    r = tqm("quasimap", "-i", str(tmp_path / "idx"), "-r", fq16, "-o", part,
            "--batchSize", "8", "--pipelineDepth", "2")
    assert r.returncode == 0, r.stderr
    with open(part, "a") as f:
        f.write("GARBAGE LINE FROM A CRASHED BATCH\n")  # partial batch tail
    # progress says 2 batches done; resume with the FULL fastq
    r = tqm("quasimap", "-i", str(tmp_path / "idx"), "-r", fq, "-o", part,
            "--batchSize", "8", "--pipelineDepth", "2", "--resume")
    assert r.returncode == 0, r.stderr
    body = lambda p: [l for l in open(p).read().splitlines() if not l.startswith("@PG")]
    assert body(part) == body(clean)
    st = json.load(open(part + ".tqm_progress.json"))
    assert st["batches_done"] == 5
    assert st["counters"]["reads_total"] == len(reads)
