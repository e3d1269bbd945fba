"""Native C++ SAM formatter must emit byte-identical output to the Python
writers in io/sam.py (the executable spec). Pure host test — no device."""

import io

import numpy as np
import pytest

from rapmap_tpu.io import sam
from rapmap_tpu.native import bindings as nat

pytestmark = pytest.mark.skipif(
    not nat.available(), reason="native toolchain unavailable"
)

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _reads(rng, B, Lmax=80):
    names, seqs, quals = [], [], []
    for i in range(B):
        L = int(rng.integers(20, Lmax))
        names.append(f"r{i}/x{rng.integers(0, 99)}")
        seqs.append(BASES[rng.integers(0, 4, L)].tobytes())
        quals.append(bytes(33 + rng.integers(0, 40, L)))
    return names, seqs, quals


@pytest.mark.parametrize("write_unmapped", [True, False])
@pytest.mark.parametrize("with_score", [False, True])
def test_se_byte_parity(write_unmapped, with_score):
    rng = np.random.default_rng(3)
    B = 64
    names, seqs, quals = _reads(rng, B)
    txp_names = [f"txp{i}" for i in range(10)]
    counts = rng.integers(0, 4, B).astype(np.int32)
    total = int(counts.sum())
    recs = np.stack(
        [
            rng.integers(0, 10, total),          # t
            rng.integers(-5, 5000, total),       # pos (some negative)
            rng.integers(0, 2, total),           # strand
            rng.integers(0, 100, total),         # score
        ],
        axis=1,
    ).astype(np.int32)

    py = io.StringIO()
    n_py = sam.write_se_records_dense(py, names, seqs, quals, recs, counts,
                                      txp_names, write_unmapped,
                                      with_score=with_score)
    fmt = sam.get_native_formatter(txp_names)
    assert fmt is not None
    na = io.StringIO()
    n_na = sam.write_se_records_dense(na, names, seqs, quals, recs, counts,
                                      txp_names, write_unmapped, formatter=fmt,
                                      with_score=with_score)
    assert n_py == n_na
    assert py.getvalue() == na.getvalue()
    if with_score:
        assert "\tAS:i:" in py.getvalue()


@pytest.mark.parametrize("write_unmapped", [True, False])
@pytest.mark.parametrize("with_score", [False, True])
def test_pe_byte_parity(write_unmapped, with_score):
    rng = np.random.default_rng(5)
    B = 64
    names, seqs1, quals1 = _reads(rng, B)
    _, seqs2, quals2 = _reads(rng, B)
    txp_names = [f"t{i}.iso{i%3}" for i in range(12)]
    counts = rng.integers(0, 4, B).astype(np.int32)
    total = int(counts.sum())
    h1 = rng.integers(0, 2, total)
    h2 = np.where(h1 == 0, 1, rng.integers(0, 2, total))  # at least one mate
    recs = np.stack(
        [
            rng.integers(0, 12, total),
            rng.integers(-5, 3000, total),
            rng.integers(0, 2, total),
            h1,
            rng.integers(-5, 3000, total),
            rng.integers(0, 2, total),
            h2,
        ],
        axis=1,
    ).astype(np.int32)
    if with_score:
        recs = np.concatenate(
            [recs, rng.integers(0, 200, (total, 2)).astype(np.int32)], axis=1
        )

    py = io.StringIO()
    n_py = sam.write_pe_records_dense(py, names, seqs1, quals1, seqs2, quals2,
                                      recs, counts, txp_names, write_unmapped,
                                      with_score=with_score)
    fmt = sam.get_native_formatter(txp_names)
    na = io.StringIO()
    n_na = sam.write_pe_records_dense(na, names, seqs1, quals1, seqs2, quals2,
                                      recs, counts, txp_names, write_unmapped,
                                      formatter=fmt, with_score=with_score)
    assert n_py == n_na
    assert py.getvalue() == na.getvalue()
    if with_score:
        assert "\tAS:i:" in py.getvalue()


def test_grow_and_reuse():
    """Formatter output buffer grows on demand and is reusable across batches."""
    rng = np.random.default_rng(7)
    txp_names = ["tx"]
    fmt = sam.get_native_formatter(txp_names)
    fmt._out = np.empty(16, dtype=np.uint8)  # force the grow-retry path
    for _ in range(3):
        B = 32
        names, seqs, quals = _reads(rng, B)
        counts = np.ones(B, dtype=np.int32)
        recs = np.zeros((B, 4), dtype=np.int32)
        py = io.StringIO()
        sam.write_se_records_dense(py, names, seqs, quals, recs, counts, txp_names)
        na = io.StringIO()
        sam.write_se_records_dense(na, names, seqs, quals, recs, counts,
                                   txp_names, formatter=fmt)
        assert py.getvalue() == na.getvalue()
