"""Pseudo index + pseudomap: oracle behaviour and device parity."""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.builder import build_pseudo_index
from rapmap_tpu.index.format import load_index
from rapmap_tpu.models.pseudo import PseudoMapper
from rapmap_tpu.oracle import pseudomap as pm
from tests.util import random_transcriptome, sample_reads, write_fasta
from tests.test_device_parity import batch_of


@pytest.fixture(scope="module")
def pidx(tmp_path_factory):
    rng = np.random.default_rng(21)
    tmp = tmp_path_factory.mktemp("pseudo")
    txps = random_transcriptome(rng, n_txps=6, min_len=120, max_len=300)
    fa = write_fasta(str(tmp / "p.fa"), txps)
    idx = build_pseudo_index(fa, outdir=str(tmp / "pidx"), k=11)
    idx2 = load_index(str(tmp / "pidx"), verify=True)
    assert np.array_equal(np.asarray(idx.occ_txp), np.asarray(idx2.occ_txp))
    return idx, txps


def test_pseudo_oracle_exact_reads(pidx):
    rng = np.random.default_rng(2)
    idx, txps = pidx
    for name, seq, t, p, was_rc in sample_reads(rng, txps, 40, read_len=44):
        from rapmap_tpu.index.encode import encode_reads

        maps = pm.map_read(idx, encode_reads(np.frombuffer(seq, dtype=np.uint8)))
        assert (t, p, not was_rc) in [(m.txp, m.pos, m.fwd) for m in maps], name


def test_pseudo_device_parity(pidx):
    rng = np.random.default_rng(4)
    idx, txps = pidx
    reads = sample_reads(rng, txps, 32, read_len=44, error_rate=0.03, n_frac=0.01)
    from tests.util import BASES

    seqs = [r[1] for r in reads] + [BASES[rng.integers(0, 4, 44)].tobytes()]
    L = 44
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8, expand_budget=2048, max_out=256)
    mapper = PseudoMapper(idx, cfg)
    codes, lens = batch_of(seqs, L)
    out, ctr = mapper.map_se(codes, lens)
    assert not out.over_budget.any()
    for i in range(len(seqs)):
        want = pm.map_read(idx, codes[i][: lens[i]], cfg)
        got = [
            (int(out.t[i, j]), int(out.pos[i, j]), out.strand[i, j] == 0, int(out.score[i, j]))
            for j in range(out.t.shape[1])
            if out.t[i, j] != -1
        ]
        exp = [(m.txp, m.pos, m.fwd, m.score) for m in want]
        assert got == exp, f"read {i}: {got} != {exp}"


def test_pseudo_device_parity_pe(pidx):
    rng = np.random.default_rng(6)
    idx, txps = pidx
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 40
    pairs = []
    for _ in range(12):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        if len(seq) < 150:
            continue
        p1 = int(rng.integers(0, len(seq) - 140))
        left = seq[p1 : p1 + L]
        right = seq[p1 + 100 - L : p1 + 100].translate(comp)[::-1]
        pairs.append((left, right))
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8, expand_budget=2048, max_out=256)
    mapper = PseudoMapper(idx, cfg)
    c1, l1 = batch_of([p[0] for p in pairs], L)
    c2, l2 = batch_of([p[1] for p in pairs], L)
    _, _, po, _ = mapper.map_pe(c1, l1, c2, l2)
    for i in range(len(pairs)):
        want, conc = pm.map_pair(idx, c1[i][: l1[i]], c2[i][: l2[i]], cfg)
        assert bool(po.concordant[i]) == conc
        got = [
            (int(po.t[i, j]), int(po.p1[i, j]) if po.has1[i, j] else None,
             int(po.p2[i, j]) if po.has2[i, j] else None)
            for j in range(po.t.shape[1]) if po.t[i, j] != -1
        ]
        exp = [(m.txp, m.pos1, m.pos2) for m in want]
        assert got == exp, f"pair {i}: {got} != {exp}"


def test_pseudo_wire_chunked_matches_unchunked(tmp_path):
    """pseudo_map_batch_se_wire_chunked must equal the unchunked pseudo wire
    path (records, counts, flags, counters)."""
    import numpy as np

    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.index.builder import build_pseudo_index
    from rapmap_tpu.models.pseudo import PseudoMapper
    from tests.test_device_parity import batch_of
    from tests.util import random_transcriptome, sample_reads, write_fasta

    rng = np.random.default_rng(91)
    txps = random_transcriptome(rng, n_txps=5, min_len=150, max_len=300)
    fa = write_fasta(str(tmp_path / "p.fa"), txps)
    pidx = build_pseudo_index(fa, k=11)
    reads = sample_reads(rng, txps, 29, read_len=40, error_rate=0.02)
    L = 40
    B = 32
    codes, lens = batch_of([r[1] for r in reads] + [b""] * (B - len(reads)), L)
    base = dict(k=pidx.k, max_hits_per_strand=30, expand_budget=512)
    m1 = PseudoMapper(pidx, MapConfig(**base))
    m2 = PseudoMapper(pidx, MapConfig(**base, chunk=8))
    w1 = m1.fetch(m1.map_se_async(codes, lens, n_valid=len(reads)))
    w2 = m2.fetch(m2.map_se_async(codes, lens, n_valid=len(reads)))
    assert w1.counters == w2.counters
    assert np.array_equal(w1.counts, w2.counts)
    assert np.array_equal(w1.flags, w2.flags)
    assert np.array_equal(w1.recs, w2.recs)
