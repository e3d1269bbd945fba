"""Real multi-process distribution (SURVEY.md §4 item 4, §5.8): two CLI
processes on localhost via jax.distributed (Gloo CPU collectives) must
produce the same record union and the same GLOBAL psum'd counters as one
process."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

from tests.util import random_transcriptome, sample_reads, write_fasta, write_fastq

ENV = dict(
    os.environ,
    TQM_FORCE_CPU="1",
    XLA_FLAGS=os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=1 --xla_cpu_parallel_codegen_split_count=1",
)


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def _records(path: str) -> list[str]:
    with open(path) as f:
        return sorted(ln for ln in f.read().splitlines()
                      if ln and not ln.startswith("@"))


def test_two_process_cli_matches_single(tmp_path):
    rng = np.random.default_rng(21)
    txps = random_transcriptome(rng, n_txps=5, min_len=150, max_len=260)
    fa = write_fasta(str(tmp_path / "txome.fa"), txps)
    reads = sample_reads(rng, txps, 44, read_len=36, error_rate=0.02)
    fq = write_fastq(str(tmp_path / "reads.fq"), reads)
    idx = str(tmp_path / "idx")
    r = subprocess.run(
        [sys.executable, "-m", "rapmap_tpu.cli", "quasiindex", "-t", fa, "-i", idx, "-k", "11"],
        capture_output=True, text=True, env=ENV, cwd="/root/repo", timeout=300,
    )
    assert r.returncode == 0, r.stderr

    base = ["quasimap", "-i", idx, "-r", fq, "--batchSize", "8"]
    # single-process reference run
    single_out = str(tmp_path / "single.sam")
    single_stats = str(tmp_path / "single.json")
    r = subprocess.run(
        [sys.executable, "-m", "rapmap_tpu.cli", *base, "-o", single_out,
         "--statsJson", single_stats],
        capture_output=True, text=True, env=ENV, cwd="/root/repo", timeout=560,
    )
    assert r.returncode == 0, r.stderr

    # two cooperating processes
    port = _free_port()
    multi_out = str(tmp_path / "multi.sam")
    procs = []
    for rank in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "rapmap_tpu.cli", *base, "-o", multi_out,
             "--statsJson", str(tmp_path / f"multi{rank}.json"),
             "--worldSize", "2", "--rank", str(rank),
             "--coordinator", f"localhost:{port}"],
            stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
            env=ENV, cwd="/root/repo",
        ))
    errs = []
    for p in procs:
        try:
            _, err = p.communicate(timeout=540)
        except subprocess.TimeoutExpired:
            p.kill()
            _, err = p.communicate()
        errs.append(err)
        assert p.returncode == 0, err

    # record union across shards == single-process records
    shard0 = _records(multi_out + ".0000")
    shard1 = _records(multi_out + ".0001")
    assert shard0 and shard1, "both processes should have produced records"
    assert sorted(shard0 + shard1) == _records(single_out)

    # every shard is a standalone SAM (has a header)
    for suffix in (".0000", ".0001"):
        with open(multi_out + suffix) as f:
            assert f.readline().startswith("@HD")

    # psum'd global counters equal the single-process counters on every rank
    single = json.load(open(single_stats))
    for rank in range(2):
        multi = json.load(open(tmp_path / f"multi{rank}.json"))
        for key in ("reads_total", "reads_mapped", "records", "too_ambiguous"):
            assert multi[key] == single[key], (key, rank, errs[rank][-800:])
