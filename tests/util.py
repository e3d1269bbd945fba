"""Synthetic transcriptome / read generation shared by tests and bench."""

from __future__ import annotations

import os

import numpy as np

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def random_transcriptome(
    rng: np.random.Generator,
    n_txps: int = 8,
    min_len: int = 80,
    max_len: int = 400,
    shared_prefix: int = 0,
) -> list[tuple[str, bytes]]:
    txps = []
    shared = rng.integers(0, 4, size=shared_prefix) if shared_prefix else None
    for i in range(n_txps):
        L = int(rng.integers(min_len, max_len + 1))
        seq = rng.integers(0, 4, size=L)
        if shared is not None and i % 2 == 0 and L > shared_prefix:
            seq[:shared_prefix] = shared
        txps.append((f"txp{i}", BASES[seq].tobytes()))
    return txps


def write_fasta(path: str, txps: list[tuple[str, bytes]]) -> str:
    with open(path, "w") as f:
        for name, seq in txps:
            f.write(f">{name}\n{seq.decode()}\n")
    return path


def sample_reads(
    rng: np.random.Generator,
    txps: list[tuple[str, bytes]],
    n_reads: int,
    read_len: int = 50,
    error_rate: float = 0.0,
    rc_frac: float = 0.5,
    n_frac: float = 0.0,
) -> list[tuple[str, bytes, int, int, bool]]:
    """Returns (name, seq, true_txp, true_pos, was_rc)."""
    comp = dict(zip(b"ACGT", b"TGCA"))
    out = []
    for i in range(n_reads):
        t = int(rng.integers(0, len(txps)))
        name, seq = txps[t]
        if len(seq) < read_len:
            t = max(range(len(txps)), key=lambda j: len(txps[j][1]))
            name, seq = txps[t]
        p = int(rng.integers(0, len(seq) - read_len + 1))
        r = bytearray(seq[p : p + read_len])
        for j in range(read_len):
            if error_rate and rng.random() < error_rate:
                r[j] = BASES[int(rng.integers(0, 4))]
            if n_frac and rng.random() < n_frac:
                r[j] = ord("N")
        was_rc = bool(rng.random() < rc_frac)
        if was_rc:
            r = bytearray(comp.get(c, ord("N")) for c in reversed(r))
        out.append((f"r{i}", bytes(r), t, p, was_rc))
    return out


def write_fastq(path: str, reads: list[tuple]) -> str:
    with open(path, "w") as f:
        for rec in reads:
            name, seq = rec[0], rec[1]
            f.write(f"@{name}\n{seq.decode()}\n+\n{'I' * len(seq)}\n")
    return path


def toy_index(tmp_path, rng, **kw):
    from rapmap_tpu.index.builder import build_quasi_index

    os.makedirs(str(tmp_path), exist_ok=True)
    k = kw.pop("k", 11)
    txps = random_transcriptome(rng, **kw)
    fa = write_fasta(os.path.join(str(tmp_path), "txome.fa"), txps)
    idx = build_quasi_index(fa, k=k)
    return idx, txps
