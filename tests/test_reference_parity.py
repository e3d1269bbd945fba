"""Reference-parity harness (SURVEY.md Appendix A; VERDICT round-1 item 7).

The upstream mount /root/reference has been EMPTY through rounds 0-2 (zero
files), so every test here skips until it carries source. The moment it does,
this file is the first thing to run: it builds the reference binary, produces
golden SAMs on a shared fixture, and compares this framework's output
record-for-record under canonical sorting (the north-star correctness metric).

Also prints a loud reminder to re-measure the empirical baseline (SURVEY §6 /
BASELINE.md still carries a provisional 150k reads/s single-core figure).
"""

import os
import shutil
import subprocess
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
BUILD_DIR = "/tmp/ref_build"


def _mount_has_source() -> bool:
    try:
        for _, _, files in os.walk(REFERENCE):
            if files:
                return True
    except OSError:
        return False
    return False


pytestmark = pytest.mark.skipif(
    not _mount_has_source(),
    reason="/root/reference is an empty mount (no source to compare against); "
    "re-run the moment it is populated — see SURVEY.md Appendix A",
)


@pytest.fixture(scope="module")
def reference_binary():
    """Build the reference with CMake (SURVEY Appendix A items 9-10)."""
    exe = os.path.join(BUILD_DIR, "src", "rapmap")
    if not os.path.exists(exe):
        os.makedirs(BUILD_DIR, exist_ok=True)
        subprocess.run(
            ["cmake", "-S", REFERENCE, "-B", BUILD_DIR, "-DCMAKE_BUILD_TYPE=Release"],
            check=True, capture_output=True, timeout=600,
        )
        subprocess.run(
            ["cmake", "--build", BUILD_DIR, "-j", str(os.cpu_count() or 4)],
            check=True, capture_output=True, timeout=3600,
        )
    if not os.path.exists(exe):
        found = shutil.which("rapmap", path=f"{BUILD_DIR}/src:{BUILD_DIR}/bin")
        assert found, "reference built but no rapmap executable located"
        exe = found
    return exe


@pytest.fixture(scope="module")
def fixture_world(tmp_path_factory):
    from tests.util import random_transcriptome, sample_reads, write_fasta, write_fastq

    tmp = tmp_path_factory.mktemp("refparity")
    rng = np.random.default_rng(1234)
    txps = random_transcriptome(rng, n_txps=32, min_len=300, max_len=1500)
    fa = write_fasta(str(tmp / "txome.fa"), txps)
    reads = sample_reads(rng, txps, 2000, read_len=76, error_rate=0.01)
    fq = write_fastq(str(tmp / "reads.fq"), reads)
    return tmp, fa, fq


def _canon_records(sam_text: str) -> list[tuple]:
    """Canonical record set: (qname, flag, rname, pos) sorted — column subset
    both tools must agree on exactly (SEMANTICS.md north star)."""
    recs = []
    for line in sam_text.splitlines():
        if not line or line.startswith("@"):
            continue
        f = line.split("\t")
        recs.append((f[0], int(f[1]), f[2], int(f[3])))
    return sorted(recs)


def test_quasimap_se_matches_reference(reference_binary, fixture_world, tmp_path):
    tmp, fa, fq = fixture_world
    ref_idx = str(tmp_path / "ref_idx")
    ref_sam = str(tmp_path / "ref.sam")
    subprocess.run(
        [reference_binary, "quasiindex", "-t", fa, "-i", ref_idx, "-k", "31"],
        check=True, capture_output=True, timeout=600,
    )
    subprocess.run(
        [reference_binary, "quasimap", "-i", ref_idx, "-r", fq, "-o", ref_sam],
        check=True, capture_output=True, timeout=600,
    )

    tqm_idx = str(tmp_path / "tqm_idx")
    tqm_sam = str(tmp_path / "tqm.sam")
    env = dict(os.environ, TQM_FORCE_CPU="1")
    subprocess.run(
        [sys.executable, "-m", "rapmap_tpu.cli", "quasiindex", "-t", fa, "-i", tqm_idx, "-k", "31"],
        check=True, capture_output=True, timeout=600, env=env, cwd="/root/repo",
    )
    subprocess.run(
        [sys.executable, "-m", "rapmap_tpu.cli", "quasimap", "-i", tqm_idx, "-r", fq,
         "-o", tqm_sam, "--noUnmapped"],
        check=True, capture_output=True, timeout=1200, env=env, cwd="/root/repo",
    )
    ref = _canon_records(open(ref_sam).read())
    got = _canon_records(open(tqm_sam).read())
    assert got == ref, (
        f"record sets diverge: ref={len(ref)} tqm={len(got)}; "
        "dump both SAMs and diff per-read (see SEMANTICS.md for the "
        "known [REF-VERIFY] items: PE merge constraints, tie ordering)"
    )


def test_baseline_reminder(reference_binary):
    """Not a comparison: fails loudly so BASELINE.md gets re-measured."""
    pytest.fail(
        "Reference now builds! Re-measure the single-core baseline "
        "(SURVEY Appendix A item 12) and replace the provisional 150k "
        "figure in bench.py and BASELINE.md, then delete this test."
    )
