"""Host-staged sharded mapper (parallel/staged.py): mini-scale parity vs the
oracle — the same checks scripts/genome_scale.py runs at >= 2^31 scale."""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.builder import build_quasi_index
from rapmap_tpu.oracle import quasimap as qm
from rapmap_tpu.parallel.staged import StagedMapper
from tests.test_device_parity import batch_of
from tests.util import random_transcriptome, sample_reads, write_fasta


@pytest.mark.parametrize("big_sa", [False, True])
def test_staged_vs_oracle(tmp_path, big_sa):
    rng = np.random.default_rng(31)
    base = random_transcriptome(rng, n_txps=6, min_len=150, max_len=260)
    shared = base[0][1][30:120]
    txps = [(f"t{i}", s[:30] + shared + s[30:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path / "g.fa"), txps)
    idx = build_quasi_index(fa, k=11, big_sa=big_sa)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 48, read_len=L, error_rate=0.02)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=16, expand_budget=256, max_out=64)
    sm = StagedMapper(idx, cfg, n_shards=3, read_len=L, batch=len(reads))
    results, stats = sm.map_batches([codes])
    assert stats["anchor_overflow"] == 0
    got = results[0]
    for i, r in enumerate(reads):
        want = qm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        assert got[i] == exp, f"read {i}: staged {got[i]} != oracle {exp}"


@pytest.mark.parametrize("overlap", [False, True])
def test_staged_sweep_checkpoint_resume(tmp_path, overlap):
    """Resumable sweep (both pipeline modes — the genome run uses checkpoint
    AND upload overlap together): kill the sweep mid-shard (induced fault
    after the first checkpoint), relaunch with the same geometry — the
    resumed run starts past shard 0, completes, equals the uninterrupted run
    bit-for-bit, and removes its snapshot on completion."""
    import os

    rng = np.random.default_rng(34)
    base = random_transcriptome(rng, n_txps=6, min_len=150, max_len=260)
    shared = base[0][1][40:130]
    txps = [(f"t{i}", s[:25] + shared + s[25:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path / "g.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 48, read_len=L, error_rate=0.02)]
    codes, _lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=16, expand_budget=256, max_out=64)

    def mapper():
        sm = StagedMapper(idx, cfg, n_shards=4, read_len=L, batch=len(reads))
        sm.checkpoint_path = str(tmp_path / "ckpt.npz")
        sm.checkpoint_every = 2
        sm.upload_overlap = overlap
        return sm

    want, _ = StagedMapper(
        idx, cfg, n_shards=4, read_len=L, batch=len(reads)
    ).map_batches([codes])

    crash = mapper()
    orig = crash._stage_a_union

    def faulting(didx, lanes_j, lens2, a, s0, _n=[0]):
        _n[0] += 1
        if _n[0] > 3:  # shards 0-2 complete; checkpoint exists at shard 2
            raise RuntimeError("induced relay wedge")
        return orig(didx, lanes_j, lens2, a, s0)

    crash._stage_a_union = faulting
    with pytest.raises(RuntimeError, match="induced"):
        crash.map_batches([codes])
    assert os.path.exists(str(tmp_path / "ckpt.npz"))

    resumed = mapper()
    shards_run = []
    orig2 = resumed._stage_a_union

    def counting(didx, lanes_j, lens2, a, s0):
        shards_run.append(s0)
        return orig2(didx, lanes_j, lens2, a, s0)

    resumed._stage_a_union = counting
    got, stats = resumed.map_batches([codes])
    assert stats["anchor_overflow"] == 0
    assert len(shards_run) == 2  # resumed at shard 2 of 4, not 0
    assert got == want
    assert not os.path.exists(str(tmp_path / "ckpt.npz"))  # removed when done


def test_staged_upload_overlap_parity(tmp_path):
    """upload_overlap pipelines shard p+1's upload under shard p's device
    phase (two shards resident) — output must equal the serial sweep
    bit-for-bit, and the timing rows must carry exposed_wait_s."""
    rng = np.random.default_rng(35)
    base = random_transcriptome(rng, n_txps=6, min_len=150, max_len=260)
    shared = base[0][1][30:120]
    txps = [(f"t{i}", s[:30] + shared + s[30:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path / "g.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 48, read_len=L, error_rate=0.02)]
    codes, _lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=16, expand_budget=256, max_out=64)

    serial = StagedMapper(idx, cfg, n_shards=4, read_len=L, batch=len(reads))
    want, _ = serial.map_batches([codes])
    over = StagedMapper(idx, cfg, n_shards=4, read_len=L, batch=len(reads))
    over.upload_overlap = True
    got, stats = over.map_batches([codes])
    assert stats["anchor_overflow"] == 0
    assert got == want
    assert all(t["exposed_wait_s"] is not None for t in over.shard_timings)
    assert all(t["exposed_wait_s"] is None for t in serial.shard_timings)


def test_staged_read_len_cap(tmp_path):
    rng = np.random.default_rng(32)
    txps = random_transcriptome(rng, n_txps=2, min_len=200, max_len=220)
    fa = write_fasta(str(tmp_path / "s.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    with pytest.raises(ValueError, match="sa_cmp"):
        StagedMapper(idx, MapConfig(k=11), n_shards=2, read_len=120, batch=4)


def _repetitive_index(tmp_path, rng, k=11, n_txps=6):
    base = random_transcriptome(rng, n_txps=n_txps, min_len=150, max_len=260)
    shared = base[0][1][30:120]
    txps = [(f"t{i}", s[:30] + shared + s[30:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path / "g.fa"), txps)
    return build_quasi_index(fa, k=k), txps


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
def test_staged_config_sweep(tmp_path, kw):
    """Staged collate covers the full flag surface (-c/-f/-s/-z/-m); mirrors
    the replicated engine's test_se_parity_config_sweep (VERDICT r3 item 3)."""
    rng = np.random.default_rng(41)
    idx, txps = _repetitive_index(tmp_path, rng)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 32, read_len=L, error_rate=0.03)]
    chim = txps[0][1][10:30] + txps[1][1][60:80]
    reads.append(chim)
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=L - idx.k + 1, **kw)
    sm = StagedMapper(idx, cfg, n_shards=3, read_len=L, batch=len(reads))
    results, _ = sm.map_batches([codes])
    for i in range(len(reads)):
        want = qm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        assert results[0][i] == exp, f"read {i} {kw}: {results[0][i]} != {exp}"


def test_staged_variable_lens(tmp_path):
    """Mixed read lengths through the staged engine (length-aware rc lanes)."""
    rng = np.random.default_rng(42)
    idx, txps = _repetitive_index(tmp_path, rng)
    L = 44
    reads = []
    for ln in (20, 27, 33, 40, 44, 44, 31, 25):
        reads += [r[1] for r in sample_reads(rng, txps, 2, read_len=ln, error_rate=0.02)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=L - idx.k + 1)
    sm = StagedMapper(idx, cfg, n_shards=2, read_len=L, batch=len(reads))
    results, _ = sm.map_batches([codes], lens=[lens])
    for i in range(len(reads)):
        want = qm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        assert results[0][i] == exp, f"read {i} (len {lens[i]}): {results[0][i]} != {exp}"


@pytest.mark.parametrize("kw", [dict(), dict(no_orphans=True), dict(max_frag_len=150)])
def test_staged_pe_parity(tmp_path, kw):
    """Staged PE merge == oracle map_pair (SEMANTICS §5), incl. orphans and
    the fidelity constraints (VERDICT r3 item 3: staged PE parity)."""
    rng = np.random.default_rng(43)
    idx, txps = _repetitive_index(tmp_path, rng)
    L = 40
    pairs = []
    comp = dict(zip(b"ACGT", b"TGCA"))
    for i in range(24):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        F = min(len(seq), 120)
        p = int(rng.integers(0, len(seq) - F + 1))
        frag = seq[p : p + F]
        m1 = frag[:L]
        m2 = bytes(comp.get(c, ord("N")) for c in reversed(frag[-L:]))
        pairs.append((m1, m2))
    # one discordant pair: mates from different transcripts
    pairs.append((txps[0][1][:L], txps[1][1][50 : 50 + L]))
    c1, l1 = batch_of([p[0] for p in pairs], L)
    c2, l2 = batch_of([p[1] for p in pairs], L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=L - idx.k + 1, **kw)
    sm = StagedMapper(idx, cfg, n_shards=3, read_len=L, batch=len(pairs))
    res = sm.map_group([("pe", c1, l1, c2, l2)])[0]
    for i in range(len(pairs)):
        want, conc = qm.map_pair(idx, c1[i][: l1[i]], c2[i][: l2[i]], cfg)
        exp = [
            (m.txp,
             m.pos1 if m.pos1 is not None else 0, 0 if m.fwd1 else 1,
             int(m.pos1 is not None),
             m.pos2 if m.pos2 is not None else 0, 0 if m.fwd2 else 1,
             int(m.pos2 is not None))
            for m in want
        ]
        assert res["recs"][i] == exp, f"pair {i} {kw}"
        assert bool(res["conc"][i]) == conc, f"pair {i} conc {kw}"


def test_staged_mapping_score(tmp_path):
    """Staged --mappingScore: host banded scorer == oracle.align per record."""
    from rapmap_tpu.oracle.align import score_mapping_np

    rng = np.random.default_rng(44)
    idx, txps = _repetitive_index(tmp_path, rng)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 24, read_len=L, error_rate=0.04)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=L - idx.k + 1, mapping_score=True)
    sm = StagedMapper(idx, cfg, n_shards=2, read_len=L, batch=len(reads))
    results, _ = sm.map_batches([codes])
    n_recs = 0
    for i in range(len(reads)):
        want = qm.map_read(idx, codes[i][: lens[i]], cfg)
        assert len(results[0][i]) == len(want)
        for got, m in zip(results[0][i], want):
            ref_sc = score_mapping_np(
                idx, codes[i][: lens[i]], m.txp, m.pos, 0 if m.fwd else 1,
                cfg.align_band, cfg.align_ma, cfg.align_mp, cfg.align_go,
                cfg.align_ge,
            )
            assert got == (m.txp, m.pos, 0 if m.fwd else 1, ref_sc)
            n_recs += 1
    assert n_recs > 10  # the comparison actually exercised scores


def test_staged_adapter_wire(tmp_path):
    """StagedQuasiMapper (the CLI adapter) produces WireResults whose record
    stream, counts, flags, and counters match the oracle + QuasiMapper
    contract — queued-group execution included (two batches, one sweep)."""
    from rapmap_tpu.ops.wire import FLAG_MAPPED
    from rapmap_tpu.parallel.staged import StagedQuasiMapper

    rng = np.random.default_rng(45)
    idx, txps = _repetitive_index(tmp_path, rng)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 20, read_len=L, error_rate=0.02)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=L - idx.k + 1)
    ad = StagedQuasiMapper(idx, cfg, batch=16, read_len=L, n_shards=2)
    h1 = ad.map_se_async(codes[:16], lens[:16], n_valid=16)
    h2 = ad.map_se_async(codes[16:], lens[16:], n_valid=4)  # short batch pads
    r1 = ad.fetch(h1)
    r2 = ad.fetch(h2)  # computed in the same sweep
    off = 0
    for i in range(16):
        want = qm.map_read(idx, codes[i][: lens[i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        got = [tuple(r) for r in r1.recs[off : off + r1.counts[i]]]
        assert got == exp
        assert bool(r1.flags[i] & FLAG_MAPPED) == bool(exp)
        off += r1.counts[i]
    assert r1.counters["reads_total"] == 16
    assert r1.counters["records"] == int(r1.counts.sum())
    assert r2.counters["reads_total"] == 4
    off = 0
    for i in range(4):
        want = qm.map_read(idx, codes[16 + i][: lens[16 + i]], cfg)
        exp = [(m.txp, m.pos, 0 if m.fwd else 1, m.score) for m in want]
        got = [tuple(r) for r in r2.recs[off : off + r2.counts[i]]]
        assert got == exp
        off += r2.counts[i]


def test_staged_chunked_upload_parity(tmp_path, monkeypatch):
    """Row-sliced shard uploads (relay-friendly multi-part transfers) are
    result-identical to whole-array uploads: force a tiny per-transfer cap
    so every shard array goes up in many pieces."""
    import rapmap_tpu.parallel.staged as stg

    rng = np.random.default_rng(33)
    txps = random_transcriptome(rng, n_txps=5, min_len=150, max_len=240)
    fa = write_fasta(str(tmp_path / "c.fa"), txps)
    idx = build_quasi_index(fa, k=11)
    L = 40
    reads = [r[1] for r in sample_reads(rng, txps, 24, read_len=L, error_rate=0.02)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=16, expand_budget=256, max_out=64)
    whole, _ = StagedMapper(idx, cfg, n_shards=2, read_len=L, batch=len(reads)).map_batches([codes])
    monkeypatch.setattr(stg, "_MAX_XFER", 4096)
    parts, _ = StagedMapper(idx, cfg, n_shards=2, read_len=L, batch=len(reads)).map_batches([codes])
    assert whole == parts
