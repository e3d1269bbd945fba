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


GOLDEN_PE = os.path.join(os.path.dirname(__file__), "golden", "tiny_quasi_pe.sam")
GOLDEN_PS = os.path.join(os.path.dirname(__file__), "golden", "tiny_pseudo.sam")
GOLDEN_SE_AS = os.path.join(os.path.dirname(__file__), "golden", "tiny_quasi_se_as.sam")
GOLDEN_PE_AS = os.path.join(os.path.dirname(__file__), "golden", "tiny_quasi_pe_as.sam")


def _pe_fixture(tmp: str, fa: str):
    rng = np.random.default_rng(7_20260817)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    txps = []
    cur = None
    for ln in open(fa):
        if ln.startswith(">"):
            cur = []
            txps.append(cur)
        else:
            cur.append(ln.strip().encode())
    seqs = [b"".join(t) for t in txps]
    f1 = os.path.join(tmp, "pe_1.fq.gz")
    f2 = os.path.join(tmp, "pe_2.fq.gz")
    with gzip.open(f1, "wt") as a, gzip.open(f2, "wt") as b:
        for i in range(12):
            seq = seqs[int(rng.integers(0, len(seqs)))]
            if len(seq) < 130:
                seq = seqs[0]
            p = int(rng.integers(0, len(seq) - 120))
            left = seq[p : p + 44]
            right = seq[p + 120 - 44 : p + 120].translate(comp)[::-1]
            a.write(f"@p{i}\n{left.decode()}\n+\n{'I'*44}\n")
            b.write(f"@p{i}\n{right.decode()}\n+\n{'I'*44}\n")
    return f1, f2


def _run(cmds, tmp):
    env = dict(os.environ, TQM_FORCE_CPU="1")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    for cmd in cmds:
        subprocess.run(
            [sys.executable, "-m", "rapmap_tpu.cli", *cmd],
            check=True, cwd=root, env=env, capture_output=True,
        )


def _read_sam(path):
    with open(path) as f:
        # @PG carries the command line; drop it from the pinned content
        return [ln for ln in f.read().splitlines() if not ln.startswith("@PG")]


def _run_cli(tmp: str):
    fa, fq = _fixture(tmp)
    f1, f2 = _pe_fixture(tmp, fa)
    idx, pidx = os.path.join(tmp, "idx"), os.path.join(tmp, "pidx")
    se, pe, ps, sa, pa = (
        os.path.join(tmp, n)
        for n in ("se.sam", "pe.sam", "ps.sam", "se_as.sam", "pe_as.sam")
    )
    score = ["--mappingScore", "--minScoreFraction", "0.5"]
    _run(
        [
            ["quasiindex", "-t", fa, "-i", idx, "-k", "15"],
            ["pseudoindex", "-t", fa, "-i", pidx, "-k", "15"],
            ["quasimap", "-i", idx, "-r", fq, "-o", se],
            ["quasimap", "-i", idx, "-1", f1, "-2", f2, "-o", pe],
            ["pseudomap", "-i", pidx, "-r", fq, "-o", ps],
            ["quasimap", "-i", idx, "-r", fq, "-o", sa, *score],
            ["quasimap", "-i", idx, "-1", f1, "-2", f2, "-o", pa, *score],
        ],
        tmp,
    )
    return tuple(_read_sam(x) for x in (se, pe, ps, sa, pa))


def test_cli_matches_golden_sam(tmp_path):
    se, pe, ps, sa, pa = _run_cli(str(tmp_path))
    for got, path, name in (
        (se, GOLDEN, "SE quasimap"),
        (pe, GOLDEN_PE, "PE quasimap"),
        (ps, GOLDEN_PS, "pseudomap"),
        (sa, GOLDEN_SE_AS, "SE quasimap --mappingScore"),
        (pa, GOLDEN_PE_AS, "PE quasimap --mappingScore"),
    ):
        with open(path) as f:
            want = f.read().splitlines()
        assert got == want, f"{name} SAM deviates from the pinned golden output"


if __name__ == "__main__" and "--regen" in sys.argv:
    import tempfile

    os.makedirs(os.path.dirname(GOLDEN), exist_ok=True)
    with tempfile.TemporaryDirectory() as td:
        outs = _run_cli(td)
    for lines, path in zip(
        outs, (GOLDEN, GOLDEN_PE, GOLDEN_PS, GOLDEN_SE_AS, GOLDEN_PE_AS)
    ):
        with open(path, "w") as f:
            f.write("\n".join(lines) + "\n")
        print(f"regenerated {path}: {len(lines)} lines")
