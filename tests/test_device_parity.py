"""Device engine vs numpy oracle: bit-exact agreement on toy transcriptomes.

This is the framework's core correctness gate (SURVEY.md §4 test pyramid
levels 2-3): the XLA engine must reproduce the oracle's mappings exactly —
same transcripts, positions, strands, scores, same ordering.
"""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.encode import encode_reads
from rapmap_tpu.models.quasi import QuasiMapper
from rapmap_tpu.oracle import quasimap as qm
from tests.util import random_transcriptome, sample_reads, toy_index


def codes_of(seq: bytes, L: int) -> tuple[np.ndarray, int]:
    c = encode_reads(np.frombuffer(seq, dtype=np.uint8))
    out = np.full(L, 5, dtype=np.int8)
    out[: len(c)] = c
    return out, len(c)


def batch_of(seqs: list[bytes], L: int) -> tuple[np.ndarray, np.ndarray]:
    B = len(seqs)
    codes = np.full((B, L), 5, dtype=np.int8)
    lens = np.zeros(B, dtype=np.int32)
    for i, s in enumerate(seqs):
        codes[i], lens[i] = codes_of(s, L)
    return codes, lens


def parity_cfg(idx, L, **kw):
    # budgets sized so the device engine never truncates on toy data
    return MapConfig(
        k=idx.k, max_hits_per_strand=max(1, L - idx.k + 1), expand_budget=2048,
        max_out=256, **kw,
    )


def assert_se_parity(idx, seqs: list[bytes], cfg: MapConfig):
    L = max(len(s) for s in seqs)
    codes, lens = batch_of(seqs, L)
    mapper = QuasiMapper(idx, cfg)
    out, ctr = mapper.map_se(codes, lens)
    assert not out.over_budget.any(), "budget too small for parity test"
    for i, s in enumerate(seqs):
        want = qm.map_read(idx, codes[i][: lens[i]], cfg)
        got = [
            (int(out.t[i, j]), int(out.pos[i, j]), out.strand[i, j] == 0, int(out.score[i, j]))
            for j in range(out.t.shape[1])
            if out.t[i, j] != -1
        ]
        exp = [(m.txp, m.pos, m.fwd, m.score) for m in want]
        assert got == exp, f"read {i}: device {got} != oracle {exp}"
    n_mapped = sum(bool(qm.map_read(idx, codes[i][: lens[i]], cfg)) for i in range(len(seqs)))
    assert int(ctr.reads_mapped) == n_mapped


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_se_parity_exact_reads(tmp_path, seed):
    rng = np.random.default_rng(seed)
    idx, txps = toy_index(tmp_path / f"s{seed}", rng, n_txps=6, min_len=120, max_len=300, k=11)
    reads = sample_reads(rng, txps, 32, read_len=48, rc_frac=0.5)
    assert_se_parity(idx, [r[1] for r in reads], parity_cfg(idx, 48))


def test_se_parity_messy_reads(tmp_path):
    rng = np.random.default_rng(7)
    idx, txps = toy_index(tmp_path, rng, n_txps=8, min_len=100, max_len=250, k=11, shared_prefix=40)
    reads = sample_reads(rng, txps, 48, read_len=52, error_rate=0.05, n_frac=0.02)
    from tests.util import BASES

    seqs = [r[1] for r in reads]
    seqs += [BASES[rng.integers(0, 4, 52)].tobytes() for _ in range(8)]  # junk
    seqs += [b"N" * 52, txps[0][1][:52]]
    assert_se_parity(idx, seqs, parity_cfg(idx, 52))


def test_se_parity_mixed_lengths(tmp_path):
    """Variable-length reads in ONE batch: rc lanes are right-aligned on
    device (comp_flip_batch + col_off), so len < L exercises the offset."""
    rng = np.random.default_rng(21)
    idx, txps = toy_index(tmp_path, rng, n_txps=6, min_len=150, max_len=300, k=11)
    seqs = []
    for rl in (30, 41, 52, 64, 72):
        seqs += [r[1] for r in sample_reads(rng, txps, 6, read_len=rl,
                                            rc_frac=0.6, error_rate=0.03)]
    assert_se_parity(idx, seqs, parity_cfg(idx, 72))


def test_se_parity_multimapping(tmp_path):
    rng = np.random.default_rng(3)
    # duplicated segments across transcripts -> heavy multimapping
    base = random_transcriptome(rng, n_txps=3, min_len=150, max_len=200)
    shared = base[0][1][30:110]
    txps = [(f"t{i}", s[:40] + shared + s[40:]) for i, (_, s) in enumerate(base)]
    from tests.util import write_fasta
    from rapmap_tpu.index.builder import build_quasi_index

    fa = write_fasta(str(tmp_path / "mm.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    reads = [shared[5:55], shared[10:60], txps[0][1][:50]]
    assert_se_parity(idx, reads, parity_cfg(idx, 60))


@pytest.mark.parametrize(
    "kw",
    [
        dict(consistent_hits=True),
        dict(consistent_hits=True, fuzzy=True),
        dict(quasi_coverage=0.5),
        dict(max_num_hits=2),
        dict(max_interval=4),
        dict(strict_check=True),
        dict(strict_check=True, consistent_hits=True),
    ],
)
def test_se_parity_config_sweep(tmp_path, kw):
    rng = np.random.default_rng(11)
    idx, txps = toy_index(tmp_path, rng, n_txps=5, min_len=150, max_len=250, k=11)
    reads = sample_reads(rng, txps, 24, read_len=50, error_rate=0.03)
    chim = txps[0][1][10:35] + txps[1][1][50:75]
    seqs = [r[1] for r in reads] + [chim]
    assert_se_parity(idx, seqs, parity_cfg(idx, 50, **kw))


def test_se_parity_bitonic_sort(tmp_path):
    """cfg.bitonic_sort swaps the voting sort for the specialized network;
    output must stay bit-identical to the oracle (pool sized a power of 2,
    keys pack to 2 words, so the bitonic path actually engages)."""
    rng = np.random.default_rng(17)
    idx, txps = toy_index(tmp_path, rng, n_txps=4, min_len=150, max_len=250, k=11)
    reads = sample_reads(rng, txps, 16, read_len=50, error_rate=0.03)
    seqs = [r[1] for r in reads]
    cfg = MapConfig(
        k=idx.k, max_hits_per_strand=40, expand_budget=64, max_out=64,
        bitonic_sort=True,
    )
    assert len(seqs) * cfg.expand_budget & (len(seqs) * cfg.expand_budget - 1) == 0
    assert_se_parity(idx, seqs, cfg)


def test_pe_parity(tmp_path):
    rng = np.random.default_rng(5)
    idx, txps = toy_index(tmp_path, rng, n_txps=6, min_len=250, max_len=400, k=11)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 40
    pairs = []
    for i in range(24):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        if len(seq) < 160:
            continue
        p1 = int(rng.integers(0, len(seq) - 150))
        frag = int(rng.integers(90, 150))
        left = seq[p1 : p1 + L]
        right = seq[p1 + frag - L : p1 + frag].translate(comp)[::-1]
        pairs.append((left, right))
    from tests.util import BASES

    pairs.append((txps[0][1][:L], BASES[rng.integers(0, 4, L)].tobytes()))  # orphan case
    pairs.append((BASES[rng.integers(0, 4, L)].tobytes(),) * 2)  # unmapped pair

    cfg = parity_cfg(idx, L)
    mapper = QuasiMapper(idx, cfg)
    c1, l1 = batch_of([p[0] for p in pairs], L)
    c2, l2 = batch_of([p[1] for p in pairs], L)
    o1, o2, po, ctr = mapper.map_pe(c1, l1, c2, l2)
    for i, (lseq, rseq) in enumerate(pairs):
        want, conc = qm.map_pair(idx, c1[i][: l1[i]], c2[i][: l2[i]], cfg)
        assert bool(po.concordant[i]) == conc, f"pair {i} concordance"
        got = []
        for j in range(po.t.shape[1]):
            if po.t[i, j] == -1:
                continue
            got.append(
                (
                    int(po.t[i, j]),
                    int(po.p1[i, j]) if po.has1[i, j] else None,
                    int(po.p2[i, j]) if po.has2[i, j] else None,
                )
            )
        exp = [(m.txp, m.pos1, m.pos2) for m in want]
        assert got == exp, f"pair {i}: device {got} != oracle {exp}"


def test_pe_no_orphans(tmp_path):
    rng = np.random.default_rng(9)
    idx, txps = toy_index(tmp_path, rng, n_txps=4, min_len=200, max_len=300, k=11)
    from tests.util import BASES

    L = 40
    cfg = parity_cfg(idx, L, no_orphans=True)
    mapper = QuasiMapper(idx, cfg)
    c1, l1 = batch_of([txps[0][1][:L]], L)
    c2, l2 = batch_of([BASES[rng.integers(0, 4, L)].tobytes()], L)
    _, _, po, ctr = mapper.map_pe(c1, l1, c2, l2)
    assert not po.any_record[0] and int(ctr.records) == 0


@pytest.mark.parametrize(
    "kw",
    [dict(max_frag_len=120), dict(pair_order=True), dict(max_frag_len=100, pair_order=True)],
)
def test_pe_parity_fidelity_constraints(tmp_path, kw):
    """[REF-VERIFY] fragment-length / orientation-order constrained merge:
    device == oracle, including pairs the constraints reject (which must fall
    back to orphan records)."""
    rng = np.random.default_rng(17)
    idx, txps = toy_index(tmp_path, rng, n_txps=5, min_len=300, max_len=500, k=11)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 40
    pairs = []
    for _ in range(24):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        p1 = int(rng.integers(0, len(seq) - 260))
        frag = int(rng.integers(60, 260))  # some beyond max_frag_len
        left = seq[p1 : p1 + L]
        right = seq[p1 + frag - L : p1 + frag].translate(comp)[::-1]
        if rng.random() < 0.3:  # swapped order: rc mate before fwd mate
            left, right = right.translate(comp)[::-1], left.translate(comp)[::-1]
        pairs.append((left, right))

    cfg = parity_cfg(idx, L, **kw)
    mapper = QuasiMapper(idx, cfg)
    c1, l1 = batch_of([p[0] for p in pairs], L)
    c2, l2 = batch_of([p[1] for p in pairs], L)
    _, _, po, _ = mapper.map_pe(c1, l1, c2, l2)
    n_conc = 0
    for i in range(len(pairs)):
        want, conc = qm.map_pair(idx, c1[i][: l1[i]], c2[i][: l2[i]], cfg)
        assert bool(po.concordant[i]) == conc, f"pair {i} concordance"
        n_conc += bool(conc)
        got = []
        for j in range(po.t.shape[1]):
            if po.t[i, j] == -1:
                continue
            got.append(
                (
                    int(po.t[i, j]),
                    int(po.p1[i, j]) if po.has1[i, j] else None,
                    int(po.p2[i, j]) if po.has2[i, j] else None,
                )
            )
        exp = [(m.txp, m.pos1, m.pos2) for m in want]
        assert got == exp, f"pair {i}: device {got} != oracle {exp}"
    assert 0 < n_conc < len(pairs), "constraints should reject some pairs only"


@pytest.mark.parametrize("seed", [101, 202, 303, 404])
def test_se_parity_fuzz(tmp_path, seed):
    """Randomized regime fuzz: txome shape, k, read lengths, error/N rates,
    and config knobs all drawn from the seed — device == oracle bit-for-bit.
    A net for refactors beyond the deterministic suites above."""
    rng = np.random.default_rng(seed)
    k = int(rng.integers(7, 16))
    idx, txps = toy_index(
        tmp_path, rng,
        n_txps=int(rng.integers(3, 9)),
        min_len=int(rng.integers(80, 150)),
        max_len=int(rng.integers(200, 500)),
        k=k,
        shared_prefix=int(rng.integers(0, 50)),
    )
    seqs = []
    for _ in range(int(rng.integers(12, 30))):
        rl = int(rng.integers(k + 1, 90))
        (rd,) = sample_reads(
            rng, txps, 1, read_len=rl,
            error_rate=float(rng.uniform(0, 0.08)),
            n_frac=float(rng.uniform(0, 0.04)),
        )
        seqs.append(rd[1])
    kw = {}
    if rng.random() < 0.4:
        kw["consistent_hits"] = True
        kw["fuzzy"] = rng.random() < 0.5
    if rng.random() < 0.3:
        kw["strict_check"] = True
    if rng.random() < 0.3:
        kw["quasi_coverage"] = float(rng.uniform(0.1, 0.6))
    if rng.random() < 0.3:
        kw["max_interval"] = int(rng.integers(4, 64))
    L = max(len(s) for s in seqs)
    assert_se_parity(idx, seqs, parity_cfg(idx, L, **kw))


@pytest.mark.parametrize("seed", [505, 606, 707])
def test_pe_parity_fuzz(tmp_path, seed):
    """Randomized PE fuzz: fragment geometry, error/N rates, orphan and
    unmapped mates, and pair-fidelity knobs drawn from the seed."""
    rng = np.random.default_rng(seed)
    k = int(rng.integers(9, 14))
    idx, txps = toy_index(
        tmp_path, rng, n_txps=int(rng.integers(4, 8)),
        min_len=250, max_len=int(rng.integers(300, 600)), k=k,
    )
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    from tests.util import BASES

    def noisy(seq):
        b = bytearray(seq)
        for j in range(len(b)):
            r = rng.random()
            if r < 0.02:
                b[j] = BASES[int(rng.integers(0, 4))]
            elif r < 0.03:
                b[j] = ord("N")
        return bytes(b)

    L = int(rng.integers(k + 5, 60))
    pairs = []
    for _ in range(int(rng.integers(10, 20))):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        frag = int(rng.integers(2 * L, min(len(seq), 4 * L)))
        p1 = int(rng.integers(0, len(seq) - frag + 1))
        left = noisy(seq[p1 : p1 + L])
        right = noisy(seq[p1 + frag - L : p1 + frag].translate(comp)[::-1])
        if rng.random() < 0.15:
            right = BASES[rng.integers(0, 4, L)].tobytes()  # orphan
        pairs.append((left, right))
    pairs.append((BASES[rng.integers(0, 4, L)].tobytes(),) * 2)

    kw = {}
    if rng.random() < 0.4:
        kw["max_frag_len"] = int(rng.integers(2 * L, 5 * L))
    if rng.random() < 0.4:
        kw["pair_order"] = True
    if rng.random() < 0.3:
        kw["no_orphans"] = True
    cfg = parity_cfg(idx, L, **kw)
    mapper = QuasiMapper(idx, cfg)
    c1, l1 = batch_of([p[0] for p in pairs], L)
    c2, l2 = batch_of([p[1] for p in pairs], L)
    _, _, po, _ = mapper.map_pe(c1, l1, c2, l2)
    for i in range(len(pairs)):
        want, conc = qm.map_pair(idx, c1[i][: l1[i]], c2[i][: l2[i]], cfg)
        assert bool(po.concordant[i]) == conc, f"pair {i} concordance"
        got = []
        for j in range(po.t.shape[1]):
            if po.t[i, j] == -1:
                continue
            got.append(
                (int(po.t[i, j]),
                 int(po.p1[i, j]) if po.has1[i, j] else None,
                 int(po.p2[i, j]) if po.has2[i, j] else None)
            )
        exp = [(m.txp, m.pos1, m.pos2) for m in want]
        assert got == exp, f"pair {i}: device {got} != oracle {exp}"
