"""Native SA-IS and FASTQ parser vs numpy oracles."""

import numpy as np
import pytest

from rapmap_tpu.native import bindings as nat
from rapmap_tpu.index.suffix_array import suffix_array_bruteforce, suffix_array_numpy

pytestmark = pytest.mark.skipif(not nat.available(), reason="native lib not built")


@pytest.mark.parametrize("n", [1, 2, 3, 10, 64, 257, 1000, 5000])
def test_sais_matches_bruteforce(rng, n):
    t = rng.integers(0, 5, size=n).astype(np.int8)
    sa = nat.suffix_array(t)
    assert np.array_equal(sa, suffix_array_bruteforce(t))


def test_sais_matches_numpy_large(rng):
    t = rng.integers(0, 5, size=200_000).astype(np.int8)
    assert np.array_equal(nat.suffix_array(t), suffix_array_numpy(t))


def test_sais_repetitive(rng):
    # heavy repeats stress induced sorting
    t = np.tile(rng.integers(0, 4, size=13).astype(np.int8) + 1, 500)
    assert np.array_equal(nat.suffix_array(t), suffix_array_numpy(t))
    t2 = np.zeros(1000, dtype=np.int8)
    assert np.array_equal(nat.suffix_array(t2), np.arange(999, -1, -1, dtype=np.int32))


def test_fastq_parse_roundtrip():
    recs = [
        ("read1", b"ACGTNacgt", b"IIIIIIIII"),
        ("read2 extra comment", b"TTTT", b"FFFF"),
        ("read3", b"GGGGCCCC", b"ABCDEFGH"),
    ]
    buf = b"".join(
        b"@" + n.encode() + b"\n" + s + b"\n+\n" + q + b"\n" for n, s, q in recs
    )
    codes, lens, noff, nlen, soff, slen, qoff, consumed, n = nat.fastq_parse(buf, 8, 12)
    assert n == 3 and consumed == len(buf)
    assert list(lens[:3]) == [9, 4, 8]
    assert list(codes[0][:9]) == [1, 2, 3, 4, 5, 1, 2, 3, 4]
    assert all(c == 5 for c in codes[1][4:])
    for i, (name, seq, qual) in enumerate(recs):
        assert buf[noff[i] : noff[i] + nlen[i]] == name.split()[0].encode()
        assert buf[soff[i] : soff[i] + slen[i]] == seq
        assert buf[qoff[i] : qoff[i] + slen[i]] == qual


def test_fastq_parse_partial_tail():
    buf = b"@r1\nACGT\n+\nIIII\n@r2\nACG"
    codes, lens, *_, consumed, n = nat.fastq_parse(buf, 8, 10)
    assert n == 1 and consumed == 16  # r2 left for the next chunk
    buf2 = buf[consumed:] + b"T\n+\nIIII\n"
    _, lens2, *_, c2, n2 = nat.fastq_parse(buf2, 8, 10)
    assert n2 == 1 and lens2[0] == 4


def test_fastq_parse_malformed():
    with pytest.raises(ValueError):
        nat.fastq_parse(b">not_fastq\nACGT\n", 4, 10)
