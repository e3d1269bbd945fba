"""Wire-format single-buffer paths == plain MapOut paths."""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.models.quasi import QuasiMapper
from tests.util import random_transcriptome, sample_reads, toy_index
from tests.test_device_parity import batch_of


def test_wire_se_matches_mapout(tmp_path):
    rng = np.random.default_rng(55)
    idx, txps = toy_index(tmp_path, rng, n_txps=5, min_len=150, max_len=300, k=11)
    reads = sample_reads(rng, txps, 20, read_len=40, error_rate=0.02)
    L = 40
    codes, lens = batch_of([r[1] for r in reads], L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=30, expand_budget=512, max_out=32)
    mapper = QuasiMapper(idx, cfg)
    out, ctr = mapper.map_se(codes, lens)
    wr = mapper.fetch(mapper.map_se_async(codes, lens))
    assert wr.counters["reads_mapped"] == int(ctr.reads_mapped)
    assert not wr.overflowed
    off = 0
    for i in range(len(reads)):
        exp = [
            (int(out.t[i, j]), int(out.pos[i, j]), int(out.strand[i, j]), int(out.score[i, j]))
            for j in range(out.t.shape[1]) if out.t[i, j] != -1
        ]
        c = int(wr.counts[i])
        got = [tuple(int(x) for x in wr.recs[off + j]) for j in range(c)]
        assert got == exp, i
        off += c
    assert off == wr.total


def test_wire_se_chunked_matches_unchunked(tmp_path):
    """Chunked wire step (lax.scan over fixed chunks + direct-compact collate)
    must produce the same records/counters as the single-program path."""
    rng = np.random.default_rng(57)
    idx, txps = toy_index(tmp_path, rng, n_txps=5, min_len=150, max_len=300, k=11)
    reads = sample_reads(rng, txps, 29, read_len=40, error_rate=0.02, n_frac=0.01)
    L = 40
    B = 32
    codes, lens = batch_of([r[1] for r in reads] + [b""] * (B - len(reads)), L)
    base = dict(k=idx.k, max_hits_per_strand=30, expand_budget=512)
    m1 = QuasiMapper(idx, MapConfig(**base))
    m2 = QuasiMapper(idx, MapConfig(**base, chunk=8))
    w1 = m1.fetch(m1.map_se_async(codes, lens, n_valid=len(reads)))
    w2 = m2.fetch(m2.map_se_async(codes, lens, n_valid=len(reads)))
    assert w1.counters == w2.counters
    assert np.array_equal(w1.counts, w2.counts)
    assert np.array_equal(w1.recs, w2.recs)


def test_wire_pe_chunked_matches_unchunked(tmp_path):
    rng = np.random.default_rng(58)
    idx, txps = toy_index(tmp_path, rng, n_txps=5, min_len=250, max_len=400, k=11)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 36
    lefts, rights = [], []
    for _ in range(13):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        a = int(rng.integers(0, len(seq) - 130))
        lefts.append(seq[a : a + L])
        rights.append(seq[a + 100 - L : a + 100].translate(comp)[::-1])
    B = 16
    c1, l1 = batch_of(lefts + [b""] * (B - len(lefts)), L)
    c2, l2 = batch_of(rights + [b""] * (B - len(rights)), L)
    base = dict(k=idx.k, max_hits_per_strand=26, expand_budget=256)
    m1 = QuasiMapper(idx, MapConfig(**base))
    m2 = QuasiMapper(idx, MapConfig(**base, chunk=4))
    w1 = m1.fetch(m1.map_pe_async(c1, l1, c2, l2, n_valid=len(lefts)))
    w2 = m2.fetch(m2.map_pe_async(c1, l1, c2, l2, n_valid=len(lefts)))
    assert w1.counters == w2.counters
    assert np.array_equal(w1.counts, w2.counts)
    assert np.array_equal(w1.recs, w2.recs)


def test_compact_overflow_clamps_counts():
    """Regression: when total records exceed cap, per-read counts must clamp to
    what was actually written so host SAM writers never index past recs."""
    import io

    import jax.numpy as jnp

    from rapmap_tpu.io import sam
    from rapmap_tpu.ops.collate import MapOut
    from rapmap_tpu.ops.compact import compact_se

    B, MO, cap = 4, 8, 10  # 4 reads x 6 records = 24 > cap
    t = np.where(np.arange(MO)[None, :] < 6, np.arange(B)[:, None], -1)
    z = np.zeros((B, MO), np.int32)
    flags = np.zeros(B, bool)
    out = MapOut(
        t=jnp.asarray(t, jnp.int32), pos=jnp.asarray(z), strand=jnp.asarray(z),
        score=jnp.asarray(z), n_mappings=jnp.asarray((t != -1).sum(1), jnp.int32),
        mapped=jnp.asarray(~flags), too_ambiguous=jnp.asarray(flags),
        over_budget=jnp.asarray(flags), out_truncated=jnp.asarray(flags),
    )
    recsd = compact_se(out, cap)
    counts = np.asarray(recsd.counts)
    assert bool(recsd.overflowed)
    assert int(np.sum(counts)) == cap  # clamped: 6 + 4 + 0 + 0
    assert list(counts) == [6, 4, 0, 0]
    recs = np.asarray(recsd.recs)
    buf = io.StringIO()
    names = [f"r{i}" for i in range(B)]
    seqs = [b"ACGT" * 5] * B
    quals = [b"I" * 20] * B
    sam.write_se_records_dense(buf, names, seqs, quals, recs, counts, [f"t{i}" for i in range(B)])
    assert buf.getvalue().count("\n") >= B  # no IndexError, all reads emitted


def test_wire_pe_matches_pairout(tmp_path):
    rng = np.random.default_rng(56)
    idx, txps = toy_index(tmp_path, rng, n_txps=5, min_len=250, max_len=400, k=11)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 36
    lefts, rights = [], []
    for _ in range(12):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        a = int(rng.integers(0, len(seq) - 130))
        lefts.append(seq[a : a + L])
        rights.append(seq[a + 100 - L : a + 100].translate(comp)[::-1])
    c1, l1 = batch_of(lefts, L)
    c2, l2 = batch_of(rights, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=26, expand_budget=512, max_out=32)
    mapper = QuasiMapper(idx, cfg)
    _, _, po, ctr = mapper.map_pe(c1, l1, c2, l2)
    wr = mapper.fetch(mapper.map_pe_async(c1, l1, c2, l2))
    assert wr.counters["reads_mapped"] == int(ctr.reads_mapped)
    off = 0
    for i in range(len(lefts)):
        exp = [
            (int(po.t[i, j]), int(po.p1[i, j]), int(po.s1[i, j]), int(po.has1[i, j]),
             int(po.p2[i, j]), int(po.s2[i, j]), int(po.has2[i, j]))
            for j in range(po.t.shape[1]) if po.t[i, j] != -1
        ]
        c = int(wr.counts[i])
        got = [tuple(int(x) for x in wr.recs[off + j]) for j in range(c)]
        assert got == exp, i
        off += c


@pytest.mark.parametrize(
    "kw",
    [
        dict(),
        dict(no_orphans=True),
        dict(max_frag_len=120, pair_order=True),
        dict(max_num_hits=1),
        dict(consistent_hits=True),
    ],
)
def test_wire_pe_direct_merge_corner_cases(tmp_path, kw):
    """Chunked PE (direct core merge, ops.pairs.collate_records_pe) must equal
    the unchunked slotted-merge path on orphan-heavy, discordant, ambiguous,
    and constraint-filtered read sets."""
    rng = np.random.default_rng(77)
    # duplicated segment -> genuinely ambiguous pairs
    base_t = random_transcriptome(rng, n_txps=4, min_len=260, max_len=400)
    shared = base_t[0][1][40:160]
    txps = [(f"t{i}", s[:30] + shared + s[30:]) for i, (_, s) in enumerate(base_t)]
    from tests.util import write_fasta
    from rapmap_tpu.index.builder import build_quasi_index

    fa = write_fasta(str(tmp_path / "pe.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 36
    lefts, rights = [], []
    for i in range(6):  # concordant pairs
        t = i % len(txps)
        seq = txps[t][1]
        a = int(rng.integers(0, len(seq) - 130))
        lefts.append(seq[a : a + L])
        rights.append(seq[a + 100 - L : a + 100].translate(comp)[::-1])
    # orphan: right mate junk
    lefts.append(txps[0][1][5 : 5 + L])
    rights.append(bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), L)))
    # orphan: left junk
    lefts.append(bytes(rng.choice(np.frombuffer(b"ACGT", np.uint8), L)))
    rights.append(txps[1][1][50 : 50 + L].translate(comp)[::-1])
    # discordant: both map, same strand (no opposite-strand partner)
    lefts.append(txps[2][1][10 : 10 + L])
    rights.append(txps[3][1][10 : 10 + L])
    # ambiguous: both mates inside the shared segment
    lefts.append(shared[10 : 10 + L])
    rights.append(shared[60 : 60 + L].translate(comp)[::-1])
    # empty pair
    lefts.append(b"")
    rights.append(b"")
    B = 12
    c1, l1 = batch_of(lefts, L)
    c2, l2 = batch_of(rights, L)
    base = dict(k=idx.k, max_hits_per_strand=26, expand_budget=256, **kw)
    m1 = QuasiMapper(idx, MapConfig(**base))
    m2 = QuasiMapper(idx, MapConfig(**base, chunk=4))
    w1 = m1.fetch(m1.map_pe_async(c1, l1, c2, l2, n_valid=len(lefts)))
    w2 = m2.fetch(m2.map_pe_async(c1, l1, c2, l2, n_valid=len(lefts)))
    assert w1.counters == w2.counters
    assert np.array_equal(w1.counts, w2.counts)
    assert np.array_equal(w1.flags, w2.flags)
    assert np.array_equal(w1.recs, w2.recs)


def test_rec_spec_roundtrip_extremes():
    """pack_rec_fields/unpack_rec_rows must survive field extremes: negative
    positions down to -bias, max transcript ids, max scores, orphan zeros."""
    import jax.numpy as jnp

    from rapmap_tpu.ops.wire import RecSpec, pack_rec_fields, unpack_rec_rows

    se = RecSpec("se", (18, 20, 1, 6), bias=600)
    t = np.array([0, 262143, 5, 131072], np.int32)
    pos = np.array([-599, 0, 447000, -1], np.int32)
    strand = np.array([0, 1, 1, 0], np.int32)
    score = np.array([0, 63, 7, 1], np.int32)
    hi, lo = pack_rec_fields(se, [jnp.asarray(x) for x in (t, pos, strand, score)])
    rows = np.stack([np.asarray(hi), np.asarray(lo)], axis=1)
    out = unpack_rec_rows(se, rows)
    assert np.array_equal(out[:, 0], t)
    assert np.array_equal(out[:, 1], pos)
    assert np.array_equal(out[:, 2], strand)
    assert np.array_equal(out[:, 3], score)

    pe = RecSpec("pe", (18, 20, 1, 1, 20, 1, 1), bias=600)
    t = np.array([7, 262143], np.int32)
    p1 = np.array([-600, 12], np.int32)
    has1 = np.array([1, 0], np.int32)
    p2 = np.array([3, 447000], np.int32)
    has2 = np.array([1, 1], np.int32)
    s1 = np.array([1, 0], np.int32)
    s2 = np.array([0, 1], np.int32)
    hi, lo = pack_rec_fields(
        pe, [jnp.asarray(x) for x in (t, p1, s1, has1, p2, s2, has2)]
    )
    out = unpack_rec_rows(pe, np.stack([np.asarray(hi), np.asarray(lo)], axis=1))
    assert np.array_equal(out[:, 0], t)
    # positions are zeroed where the has flag is off (never read downstream)
    assert np.array_equal(out[:, 1], np.where(has1 != 0, p1, 0))
    assert np.array_equal(out[:, 4], np.where(has2 != 0, p2, 0))
    assert np.array_equal(out[:, 3], has1)
    assert np.array_equal(out[:, 6], has2)


def test_counts_flags_roundtrip():
    import jax.numpy as jnp

    from rapmap_tpu.ops.wire import pack_counts_flags, unpack_counts_flags

    rng = np.random.default_rng(5)
    C = 64
    counts = rng.integers(0, 1 << 16, C).astype(np.int32)
    flags = rng.integers(0, 16, C).astype(np.int32)
    cw, fw = pack_counts_flags(jnp.asarray(counts), jnp.asarray(flags))
    c2, f2 = unpack_counts_flags(np.asarray(cw), np.asarray(fw), C)
    assert np.array_equal(c2, counts)
    assert np.array_equal(f2, flags)
