"""Oracle semantics: reads sampled from transcripts must map back correctly."""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.encode import encode_reads
from rapmap_tpu.oracle import quasimap as qm
from tests.util import random_transcriptome, sample_reads, toy_index


def codes(seq: bytes) -> np.ndarray:
    return encode_reads(np.frombuffer(seq, dtype=np.uint8))


def test_exact_reads_map_to_truth(tmp_path, rng):
    idx, txps = toy_index(tmp_path, rng, n_txps=6, min_len=100, max_len=300, k=11)
    reads = sample_reads(rng, txps, 60, read_len=40)
    n_hit = 0
    for name, seq, t, p, was_rc in reads:
        maps = qm.map_read(idx, codes(seq))
        assert maps, f"{name} unmapped"
        found = [(m.txp, m.pos, m.fwd) for m in maps]
        assert (t, p, not was_rc) in found, (name, found, (t, p, was_rc))
        n_hit += 1
    assert n_hit == len(reads)


def test_mutated_reads_still_map(tmp_path, rng):
    idx, txps = toy_index(tmp_path, rng, n_txps=6, min_len=150, max_len=300, k=11)
    reads = sample_reads(rng, txps, 40, read_len=60, error_rate=0.02)
    mapped = sum(bool(qm.map_read(idx, codes(seq))) for _, seq, *_ in reads)
    assert mapped >= 0.8 * len(reads)


def test_random_reads_do_not_map(tmp_path, rng):
    idx, _ = toy_index(tmp_path, rng, n_txps=4, min_len=100, max_len=200, k=11)
    from tests.util import BASES

    n_mapped = 0
    for _ in range(30):
        seq = BASES[rng.integers(0, 4, size=50)].tobytes()
        n_mapped += bool(qm.map_read(idx, codes(seq)))
    assert n_mapped <= 2


def test_no_mmp_crosses_transcript_boundary(tmp_path, rng):
    """MMP extension must stop at the '$' separator: a junction read's MMPs
    never exceed the within-transcript overlap (overhang mappings themselves
    are legitimate quasi-mappings, SEMANTICS.md §4)."""
    idx, txps = toy_index(tmp_path, rng, n_txps=3, min_len=100, max_len=150, k=11)
    a, b = txps[0][1], txps[1][1]
    junction = a[-20:] + b[:20]
    from rapmap_tpu.config import MapConfig

    hits = qm.scan_strand(idx, codes(junction), MapConfig(k=idx.k))
    sa = np.asarray(idx.sa, dtype=np.int64)
    for h in hits:
        assert h.length <= 40
        for p in range(h.b, h.e):
            g = int(sa[p])
            # the matched text span contains no '$'
            assert np.all(np.asarray(idx.text[g : g + h.length]) >= 1)


def test_n_in_read_skips(tmp_path, rng):
    idx, txps = toy_index(tmp_path, rng, n_txps=4, min_len=150, max_len=200, k=11)
    name, seq = txps[0][1][:60], None
    read = bytearray(txps[0][1][10:70])
    read[5] = ord("N")
    maps = qm.map_read(idx, codes(bytes(read)))
    assert any(m.txp == 0 and m.pos == 10 and m.fwd for m in maps)


def test_consistent_hits_filters_partial(tmp_path, rng):
    """A chimera of two transcripts maps to both by default, to neither with -c."""
    idx, txps = toy_index(tmp_path, rng, n_txps=4, min_len=200, max_len=260, k=11)
    chim = txps[0][1][20:60] + txps[1][1][100:140]
    default = qm.map_read(idx, codes(chim))
    assert {m.txp for m in default} >= {0, 1}
    strict = qm.map_read(idx, codes(chim), MapConfig(k=idx.k, consistent_hits=True))
    assert not any(m.txp in (0, 1) and m.score >= 2 for m in strict) or len(strict) < len(default)


def test_max_num_hits_discards(tmp_path):
    # a transcriptome of many copies of the same sequence -> highly multimapping
    local = np.random.default_rng(424242)
    seq = bytes(np.frombuffer(b"ACGT", dtype=np.uint8)[local.integers(0, 4, 80)])
    txps = [(f"c{i}", seq) for i in range(10)]
    from tests.util import write_fasta
    from rapmap_tpu.index.builder import build_quasi_index

    fa = write_fasta(str(tmp_path / "m.fa"), txps)
    idx = build_quasi_index(fa, k=11, dedup=False)
    read = codes(seq[10:50])
    maps = qm.map_read(idx, read)
    # the exact fwd mapping appears on every copy (chance rc k-mer matches may
    # add more entries; that's correct default-mode behaviour)
    assert {(m.txp, m.pos) for m in maps if m.fwd} == {(t, 10) for t in range(10)}
    assert qm.map_read(idx, read, MapConfig(k=11, max_num_hits=5)) == []


def test_pair_merge_semantics(tmp_path, rng):
    idx, txps = toy_index(tmp_path, rng, n_txps=5, min_len=250, max_len=400, k=11)
    t = 0
    seq = txps[t][1]
    left = seq[10:60]  # fwd
    import tests.util as U

    comp = bytes.maketrans(b"ACGT", b"TGCA")
    right = seq[150:200].translate(comp)[::-1]  # rc
    recs, conc = qm.map_pair(idx, codes(left), codes(right))
    assert conc
    assert any(r.txp == t and r.pos1 == 10 and r.fwd1 and r.pos2 == 150 and not r.fwd2 for r in recs)
    # orphan path: right mate random
    rand = U.BASES[rng.integers(0, 4, 50)].tobytes()
    recs2, conc2 = qm.map_pair(idx, codes(left), codes(rand))
    assert not conc2
    assert any(r.pos2 is None and r.txp == t for r in recs2)
    recs3, _ = qm.map_pair(idx, codes(left), codes(rand), MapConfig(k=idx.k, no_orphans=True))
    assert recs3 == []
