"""Native batched-read path (io.fastx native fast path + prefetch thread)
must be byte-identical to the Python parser across gzip, multi-file chains,
short tails, and pairs (upstream:include/FastxParser.hpp role)."""

import gzip
import os

import numpy as np
import pytest

from rapmap_tpu.io import fastx
from rapmap_tpu.native import bindings as nat

requires_native = pytest.mark.skipif(
    not nat.available(), reason="native library unavailable"
)


def _write_fq(path, recs, gz=False):
    op = gzip.open if gz else open
    with op(path, "wt") as f:
        for name, seq in recs:
            f.write(f"@{name} extra comment\n{seq}\n+\n{'I' * len(seq)}\n")
    return str(path)


def _mk_recs(rng, n, lmin=40, lmax=90):
    bases = "ACGT"
    out = []
    for i in range(n):
        L = int(rng.integers(lmin, lmax))
        out.append((f"read{i}", "".join(rng.choice(list(bases), L))))
    return out


def _collect(path, batch_size, max_len):
    return list(fastx.batched_reads(path, batch_size, max_len))


def _assert_batches_equal(a, b):
    assert len(a) == len(b)
    for x, y in zip(a, b):
        assert x.names == y.names
        assert x.seqs == y.seqs
        assert x.quals == y.quals
        assert np.array_equal(np.asarray(x.codes), np.asarray(y.codes))
        assert np.array_equal(x.lens, y.lens)


@requires_native
@pytest.mark.parametrize("gz", [False, True])
def test_native_matches_python(tmp_path, rng, gz):
    recs = _mk_recs(rng, 37)
    p = _write_fq(tmp_path / ("r.fq.gz" if gz else "r.fq"), recs, gz=gz)
    native = _collect(p, 8, 128)
    os.environ["TQM_NO_NATIVE_PARSE"] = "1"
    try:
        py = _collect(p, 8, 128)
    finally:
        del os.environ["TQM_NO_NATIVE_PARSE"]
    assert len(native) == 5  # 37 reads / 8 -> short tail batch
    _assert_batches_equal(native, py)


@requires_native
def test_native_multifile_spans_batches(tmp_path, rng):
    r1, r2 = _mk_recs(rng, 5), _mk_recs(rng, 6)
    p1 = _write_fq(tmp_path / "a.fq", r1)
    p2 = _write_fq(tmp_path / "b.fq.gz", r2, gz=True)
    both = f"{p1},{p2}"
    native = _collect(both, 4, 128)
    os.environ["TQM_NO_NATIVE_PARSE"] = "1"
    try:
        py = _collect(both, 4, 128)
    finally:
        del os.environ["TQM_NO_NATIVE_PARSE"]
    # 11 reads in batches of 4: the middle batch spans the file boundary
    assert [b.n for b in native] == [4, 4, 3]
    _assert_batches_equal(native, py)


@requires_native
def test_native_pairs_and_prefetch(tmp_path, rng):
    left = _mk_recs(rng, 13)
    right = _mk_recs(rng, 13)
    p1 = _write_fq(tmp_path / "l.fq", left)
    p2 = _write_fq(tmp_path / "r.fq", right)
    pairs = list(fastx.prefetch(fastx.batched_read_pairs(p1, p2, 4, 128), depth=2))
    os.environ["TQM_NO_NATIVE_PARSE"] = "1"
    try:
        ref = list(fastx.batched_read_pairs(p1, p2, 4, 128))
    finally:
        del os.environ["TQM_NO_NATIVE_PARSE"]
    _assert_batches_equal([a for a, _ in pairs], [a for a, _ in ref])
    _assert_batches_equal([b for _, b in pairs], [b for _, b in ref])


@requires_native
def test_native_pairs_unequal_counts(tmp_path, rng):
    p1 = _write_fq(tmp_path / "l.fq", _mk_recs(rng, 9))
    p2 = _write_fq(tmp_path / "r.fq", _mk_recs(rng, 7))
    with pytest.raises(ValueError, match="unequal record counts"):
        list(fastx.batched_read_pairs(p1, p2, 4, 128))


@requires_native
def test_prefetch_propagates_errors(tmp_path, rng):
    p1 = _write_fq(tmp_path / "l.fq", _mk_recs(rng, 9))
    p2 = _write_fq(tmp_path / "r.fq", _mk_recs(rng, 7))
    with pytest.raises(ValueError, match="unequal record counts"):
        list(fastx.prefetch(fastx.batched_read_pairs(p1, p2, 4, 128)))


def test_fasta_input_falls_back(tmp_path, rng):
    # FASTA goes through the Python parser regardless of the native lib
    p = tmp_path / "t.fa"
    with open(p, "w") as f:
        f.write(">a\nACGTACGTACGTACGTACGT\n>b\nTTTTACGTACGTGGGG\n")
    batches = _collect(str(p), 4, 64)
    assert batches[0].names == ["a", "b"]
    assert batches[0].quals[0] == b"I" * 20
