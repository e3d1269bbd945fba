"""Golden-SAM regression gate.

The live parity tests compare the device engines against the numpy oracle;
this test pins the ORACLE itself (and the whole CLI path) against a
checked-in golden SAM, so a semantic change that drifts oracle and engine
together still trips a failure. The fixture is fully deterministic: seeded
transcriptome, fixed reads, default flags.

To intentionally change mapping semantics, regenerate with:
    python tests/test_golden_sam.py --regen
"""

import gzip
import os
import subprocess
import sys

import numpy as np

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "tiny_quasi.sam")


def _fixture(tmp: str):
    rng = np.random.default_rng(20260817)
    bases = np.frombuffer(b"ACGT", dtype=np.uint8)
    txps = []
    fa = os.path.join(tmp, "t.fa")
    with open(fa, "w") as f:
        for i in range(6):
            L = int(rng.integers(180, 400))
            s = bases[rng.integers(0, 4, L)].tobytes()
            txps.append(s)
            f.write(f">tx{i}\n{s.decode()}\n")
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    reads = []
    for i in range(24):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t]
        L = int(rng.integers(40, 61))
        p = int(rng.integers(0, len(seq) - L + 1))
        r = bytearray(seq[p : p + L])
        for j in range(L):  # ~2% errors, occasional N
            u = rng.random()
            if u < 0.02:
                r[j] = bases[int(rng.integers(0, 4))]
            elif u < 0.025:
                r[j] = ord("N")
        if rng.random() < 0.5:
            r = bytearray(bytes(r).translate(comp)[::-1])
        reads.append(bytes(r))
    reads.append(b"ACGT" * 12)  # junk
    fq = os.path.join(tmp, "r.fq.gz")
    with gzip.open(fq, "wt") as f:
        for i, r in enumerate(reads):
            f.write(f"@r{i}\n{r.decode()}\n+\n{'I' * len(r)}\n")
    return fa, fq


def _run_cli(tmp: str) -> list[str]:
    fa, fq = _fixture(tmp)
    env = dict(os.environ, TQM_FORCE_CPU="1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sam = os.path.join(tmp, "out.sam")
    for cmd in (
        ["quasiindex", "-t", fa, "-i", os.path.join(tmp, "idx"), "-k", "15"],
        ["quasimap", "-i", os.path.join(tmp, "idx"), "-r", fq, "-o", sam],
    ):
        subprocess.run(
            [sys.executable, "-m", "rapmap_tpu.cli", *cmd],
            check=True, cwd=root, env=env, capture_output=True,
        )
    with open(sam) as f:
        # @PG carries the command line; drop it from the pinned content
        return [ln for ln in f.read().splitlines() if not ln.startswith("@PG")]


def test_cli_matches_golden_sam(tmp_path):
    got = _run_cli(str(tmp_path))
    with open(GOLDEN) as f:
        want = f.read().splitlines()
    assert got == want, "CLI SAM deviates from the pinned golden output"


if __name__ == "__main__" and "--regen" in sys.argv:
    import tempfile

    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        lines = _run_cli(td)
    with open(GOLDEN, "w") as f:
        f.write("\n".join(lines) + "\n")
    print(f"regenerated {GOLDEN}: {len(lines)} lines")
