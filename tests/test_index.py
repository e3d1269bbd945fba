"""Index construction: suffix array, k-mer table, format roundtrip."""

import numpy as np
import pytest

from rapmap_tpu.index import encode
from rapmap_tpu.index.builder import build_quasi_index, concat_transcriptome
from rapmap_tpu.index.format import load_index, save_index
from rapmap_tpu.index.kmer_table import build_kmer_table, build_prefix_lut, pack_text_2bit
from rapmap_tpu.index.suffix_array import suffix_array_bruteforce, suffix_array_numpy
from tests.util import random_transcriptome, toy_index, write_fasta


def test_encode_roundtrip():
    seq = np.frombuffer(b"ACGTacgtNNX", dtype=np.uint8)
    codes = encode.encode_reads(seq)
    assert list(codes) == [1, 2, 3, 4, 1, 2, 3, 4, 5, 5, 5]
    rc = encode.revcomp_codes(np.array([1, 2, 3, 4, 5], dtype=np.int8))
    assert list(rc) == [5, 1, 2, 3, 4]  # rc(ACGTN) = NACGT


def test_encode_transcript_deterministic():
    seq = np.frombuffer(b"ACGNNTT", dtype=np.uint8)
    a = encode.encode_transcript(seq.copy(), 100, seed=7)
    b = encode.encode_transcript(seq.copy(), 100, seed=7)
    assert np.array_equal(a, b)
    assert np.all((a >= 1) & (a <= 4))
    c = encode.encode_transcript(seq.copy(), 101, seed=7)
    assert np.array_equal(a[:3], c[:3])


def test_kmer_keys_order():
    # numeric order of keys == lexicographic order of strings
    codes1 = encode.encode_reads(np.frombuffer(b"ACGT", dtype=np.uint8))
    codes2 = encode.encode_reads(np.frombuffer(b"ACTT", dtype=np.uint8))
    h1, l1, v1 = encode.kmer_keys(codes1, 4)
    h2, l2, v2 = encode.kmer_keys(codes2, 4)
    assert v1[0] and v2[0]
    assert (h1[0], l1[0]) < (h2[0], l2[0])
    # N invalidates
    _, _, v = encode.kmer_keys(encode.encode_reads(np.frombuffer(b"ACNT", dtype=np.uint8)), 4)
    assert not v[0]


@pytest.mark.parametrize("n", [1, 2, 17, 100, 500])
def test_suffix_array_matches_bruteforce(rng, n):
    t = rng.integers(0, 5, size=n).astype(np.int8)
    assert np.array_equal(suffix_array_numpy(t), suffix_array_bruteforce(t))


def test_kmer_table_bruteforce(rng):
    k = 5
    txps = random_transcriptome(rng, n_txps=4, min_len=30, max_len=80)
    chunks = []
    for _, seq in txps:
        chunks.append(encode.encode_reads(np.frombuffer(seq, dtype=np.uint8)))
        chunks.append(np.zeros(1, dtype=np.int8))
    text = np.concatenate(chunks)
    sa = suffix_array_numpy(text)
    hi, lo, kb, ke = build_kmer_table(text, sa, k, chunk=37)
    keys = (hi.astype(np.uint64) << np.uint64(32)) | lo.astype(np.uint64)
    assert np.all(np.diff(keys.astype(np.int64)) > 0)  # sorted unique
    # every interval's suffixes match the k-mer; brute-force recount
    from collections import Counter

    counts = Counter()
    for i in range(len(text) - k + 1):
        w = text[i : i + k]
        if np.all(w >= 1):
            counts[tuple(w.tolist())] += 1
    assert len(counts) == len(keys)
    for i in range(len(keys)):
        b, e = int(kb[i]), int(ke[i])
        first = text[sa[b] : sa[b] + k]
        assert counts[tuple(first.tolist())] == e - b
        for p in range(b, e):
            assert np.array_equal(text[sa[p] : sa[p] + k], first)


def test_prefix_lut(rng):
    idx, _ = toy_index("/tmp/tqm_lut", rng, n_txps=4, k=6)
    lut = build_prefix_lut(idx.kmer_hi, idx.kmer_lo, idx.k, idx.prefix_bases)
    assert np.array_equal(lut, idx.prefix_lut)
    keys = (idx.kmer_hi.astype(np.uint64) << np.uint64(32)) | idx.kmer_lo.astype(np.uint64)
    p = idx.prefix_bases
    for i in range(len(keys)):
        pref = int(keys[i] >> np.uint64(2 * (idx.k - p)))
        assert lut[pref] <= i < lut[pref + 1]


def test_pack_text_2bit():
    codes = np.array([1, 2, 3, 4, 0, 1] + [4] * 20, dtype=np.int8)
    packed, smask = pack_text_2bit(codes)
    # base i lives at bits [30-2*(i%16), +2) of word i//16
    def base(i):
        w = int(packed[i // 16])
        return (w >> (30 - 2 * (i % 16))) & 3

    def is_sent(i):
        w = int(smask[i // 16])
        return ((w >> (30 - 2 * (i % 16))) & 3) != 0

    for i, c in enumerate(codes):
        if c == 0:
            assert is_sent(i)
        else:
            assert base(i) == c - 1 and not is_sent(i)


def test_index_roundtrip(tmp_path, rng):
    txps = random_transcriptome(rng, n_txps=5, min_len=50, max_len=120)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    idx = build_quasi_index(fa, outdir=str(tmp_path / "idx"), k=9)
    idx2 = load_index(str(tmp_path / "idx"), verify=True)
    assert idx2.k == 9 and idx2.n_text == idx.n_text
    for name in ("text", "sa", "sa_txp", "kmer_hi", "kmer_lo", "kmer_b", "kmer_e"):
        assert np.array_equal(np.asarray(getattr(idx, name)), np.asarray(getattr(idx2, name)))
    assert idx2.txp_names == idx.txp_names


def test_dedup_and_sa_txp(tmp_path, rng):
    txps = random_transcriptome(rng, n_txps=3, min_len=40, max_len=60)
    txps.append(("dup0", txps[0][1]))
    fa = write_fasta(str(tmp_path / "d.fa"), txps)
    idx = build_quasi_index(fa, k=7)
    assert idx.n_txps == 3
    # sa_txp correctness: global position within transcript t's span
    sa = np.asarray(idx.sa, dtype=np.int64)
    for p in range(0, len(sa), 7):
        g = sa[p]
        t = int(idx.sa_txp[p])
        assert idx.txp_offsets[t] <= g <= idx.txp_offsets[t] + idx.txp_lens[t]


def test_kmer_table_native_matches_numpy(rng, monkeypatch):
    """The native packed-word SA scan (native/kmerscan.cpp) and the numpy
    fallback in build_kmer_table must agree bit-for-bit, for i32 and i64 SA."""
    from rapmap_tpu.native import bindings as nat

    if not nat.available() or nat.kmer_table(
        np.zeros(1, np.int32), np.zeros(1, np.uint32), np.zeros(1, np.uint32), 4
    ) is None:
        pytest.skip("native kmer_table unavailable")
    for n, k in [(4000, 17), (2500, 31), (1500, 32), (800, 4)]:
        t = rng.integers(1, 5, n).astype(np.int8)
        t[rng.integers(0, n, max(1, n // 60))] = 0
        sa = suffix_array_numpy(t)
        packed, smask = pack_text_2bit(t)
        native = nat.kmer_table(sa, packed, smask, k)
        native64 = nat.kmer_table(sa.astype(np.int64), packed, smask, k)
        monkeypatch.setattr(nat, "kmer_table", lambda *a, **kw: None)
        fallback = build_kmer_table(t, sa, k, chunk=373)
        monkeypatch.undo()
        for a, b, c in zip(fallback, native, native64):
            assert np.array_equal(a, b) and np.array_equal(a, c)


def test_canonical_chd_native_matches_numpy(tmp_path, rng, monkeypatch):
    """build_canonical_chd's native class pass (native/canonical.cpp) and its
    numpy fallback must produce identical CHD sections."""
    from rapmap_tpu.index import chd as chd_mod
    from rapmap_tpu.native import bindings as nat

    if not nat.available():
        pytest.skip("native library unavailable")
    t = rng.integers(1, 5, 6000).astype(np.int8)
    t[rng.integers(0, 6000, 80)] = 0
    sa = suffix_array_numpy(t)
    khi, klo, _, _ = build_kmer_table(t, sa, 15)
    a = chd_mod.build_canonical_chd(khi, klo, 15)
    monkeypatch.setattr(nat, "canonical_classes", lambda *args, **kw: None)
    b = chd_mod.build_canonical_chd(khi, klo, 15)
    assert a is not None and b is not None
    assert a["seed"] == b["seed"] and a["m_bits"] == b["m_bits"]
    for name in ("dir", "perm", "cls"):
        assert np.array_equal(a[name], b[name]), name
