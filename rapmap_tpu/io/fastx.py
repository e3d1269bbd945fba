"""FASTA/FASTQ readers and batched read iteration (host pipeline).

Python implementation of the reference's kseq/FastxParser role (SURVEY.md §2.1
#15); a C++ fast path lives in rapmap_tpu/native and is used when built. Gzip
transparently supported by magic-byte sniffing.
"""

from __future__ import annotations

import gzip
import io
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from rapmap_tpu.index.encode import NCODE, encode_reads


def _open(path: str):
    f = open(path, "rb")
    magic = f.read(2)
    f.seek(0)
    if magic == b"\x1f\x8b":
        return io.BufferedReader(gzip.GzipFile(fileobj=f))
    return f


def read_fasta(path: str) -> Iterator[tuple[str, bytes]]:
    """Yield (name, raw sequence bytes) per record; name is up to first whitespace."""
    name = None
    chunks: list[bytes] = []
    with _open(path) as f:
        for line in f:
            line = line.rstrip()
            if not line:
                continue
            if line.startswith(b">"):
                if name is not None:
                    yield name, b"".join(chunks)
                name = line[1:].split()[0].decode()
                chunks = []
            else:
                chunks.append(line)
        if name is not None:
            yield name, b"".join(chunks)


def read_fastq(path: str) -> Iterator[tuple[str, bytes, bytes]]:
    """Yield (name, seq bytes, qual bytes). Also accepts FASTA (qual = b'I'*len)."""
    with _open(path) as f:
        first = f.peek(1)[:1] if hasattr(f, "peek") else b"@"
        if first == b">":
            for name, seq in _fasta_records(f):
                yield name, seq, b"I" * len(seq)
            return
        while True:
            h = f.readline()
            if not h:
                return
            h = h.rstrip()
            if not h:
                continue
            seq = f.readline().rstrip()
            f.readline()  # '+'
            qual = f.readline().rstrip()
            yield h[1:].split()[0].decode(), seq, qual


def _fasta_records(f) -> Iterator[tuple[str, bytes]]:
    name, chunks = None, []
    for line in f:
        line = line.rstrip()
        if not line:
            continue
        if line.startswith(b">"):
            if name is not None:
                yield name, b"".join(chunks)
            name, chunks = line[1:].split()[0].decode(), []
        else:
            chunks.append(line)
    if name is not None:
        yield name, b"".join(chunks)


@dataclass
class ReadBatch:
    """Padded, encoded read batch ready for the device engine.

    codes: (B, L) int8 read codes (pad = NCODE); lens: (B,) int32.
    names/seqs/quals retained host-side for SAM emission. For pairs, a second
    batch is carried alongside (see PairBatch).
    """

    codes: np.ndarray
    lens: np.ndarray
    names: list[str]
    seqs: list[bytes]
    quals: list[bytes]

    @property
    def n(self) -> int:
        return len(self.names)


def pack_batch(records: Sequence[tuple[str, bytes, bytes]], pad_len: int, pad_n: int) -> ReadBatch:
    """Encode + pad records to (pad_n, pad_len); extra rows are all-pad."""
    B = pad_n
    codes = np.full((B, pad_len), NCODE, dtype=np.int8)
    lens = np.zeros(B, dtype=np.int32)
    names, seqs, quals = [], [], []
    for i, (name, seq, qual) in enumerate(records):
        L = min(len(seq), pad_len)
        codes[i, :L] = encode_reads(np.frombuffer(seq[:L], dtype=np.uint8))
        lens[i] = L
        names.append(name)
        seqs.append(seq[:L])
        quals.append(qual[:L])
    return ReadBatch(codes, lens, names, seqs, quals)


_LEN_BUCKETS = (32, 48, 64, 96, 128, 160, 192, 256, 320, 384, 448, 512, 768, 1023)


def bucket_len(n: int, max_len: int) -> int:
    """Round a batch's max read length up to a small set of pad buckets so the
    engine compiles one program per bucket instead of per exact length."""
    for b in _LEN_BUCKETS:
        if n <= b <= max_len:
            return b
    return min(max_len, _LEN_BUCKETS[-1])


def _read_fastq_multi(paths: str) -> Iterator[tuple[str, bytes, bytes]]:
    """Chain comma-separated FASTQ/FASTA files (reference multi-file surface)."""
    for path in paths.split(","):
        yield from read_fastq(path)


def batched_reads(path: str, batch_size: int, max_len: int) -> Iterator[ReadBatch]:
    buf: list[tuple[str, bytes, bytes]] = []
    for rec in _read_fastq_multi(path):
        buf.append(rec)
        if len(buf) == batch_size:
            L = bucket_len(max(len(r[1]) for r in buf), max_len)
            yield pack_batch(buf, L, batch_size)
            buf = []
    if buf:
        L = bucket_len(max(len(r[1]) for r in buf), max_len)
        yield pack_batch(buf, L, batch_size)


def batched_read_pairs(
    path1: str, path2: str, batch_size: int, max_len: int
) -> Iterator[tuple[ReadBatch, ReadBatch]]:
    buf1: list[tuple[str, bytes, bytes]] = []
    buf2: list[tuple[str, bytes, bytes]] = []
    it2 = _read_fastq_multi(path2)

    def emit():
        L = bucket_len(
            max(max(len(r[1]) for r in buf1), max(len(r[1]) for r in buf2)), max_len
        )
        return pack_batch(buf1, L, batch_size), pack_batch(buf2, L, batch_size)

    for rec1 in _read_fastq_multi(path1):
        try:
            rec2 = next(it2)
        except StopIteration:
            raise ValueError("paired FASTQ files have unequal record counts")
        buf1.append(rec1)
        buf2.append(rec2)
        if len(buf1) == batch_size:
            yield emit()
            buf1, buf2 = [], []
    if buf1:
        yield emit()
