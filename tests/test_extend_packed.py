"""Packed-word extension == per-depth-char extension == oracle."""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.models.quasi import QuasiMapper
from rapmap_tpu.oracle import quasimap as qm
from tests.util import sample_reads, toy_index
from tests.test_device_parity import batch_of, parity_cfg


def test_packed_scan_equals_charwise(tmp_path):
    rng = np.random.default_rng(77)
    idx, txps = toy_index(tmp_path, rng, n_txps=8, min_len=120, max_len=300, k=11, shared_prefix=30)
    reads = sample_reads(rng, txps, 48, read_len=52, error_rate=0.04, n_frac=0.02)
    from tests.util import BASES

    seqs = [r[1] for r in reads] + [BASES[rng.integers(0, 4, 52)].tobytes() for _ in range(6)]
    L = 52
    codes, lens = batch_of(seqs, L)
    import dataclasses

    cfg_p = parity_cfg(idx, L)
    cfg_c = dataclasses.replace(cfg_p, packed_extension=False)
    out_p, ctr_p = QuasiMapper(idx, cfg_p).map_se(codes, lens)
    out_c, ctr_c = QuasiMapper(idx, cfg_c).map_se(codes, lens)
    for f in ("t", "pos", "strand", "score", "n_mappings"):
        assert np.array_equal(getattr(out_p, f), getattr(out_c, f)), f
    # and against the oracle
    for i in range(len(seqs)):
        want = [(m.txp, m.pos, m.fwd, m.score) for m in qm.map_read(idx, codes[i][: lens[i]], cfg_p)]
        got = [
            (int(out_p.t[i, j]), int(out_p.pos[i, j]), out_p.strand[i, j] == 0, int(out_p.score[i, j]))
            for j in range(out_p.t.shape[1]) if out_p.t[i, j] != -1
        ]
        assert got == want, i


def test_packed_long_reads_cross_word_boundaries(tmp_path):
    # reads longer than 2 words beyond k stress the W-word compare loop
    rng = np.random.default_rng(78)
    idx, txps = toy_index(tmp_path, rng, n_txps=4, min_len=260, max_len=400, k=11)
    reads = sample_reads(rng, txps, 24, read_len=100, error_rate=0.01)
    L = 100
    codes, lens = batch_of([r[1] for r in reads], L)
    cfg = parity_cfg(idx, L)
    out, _ = QuasiMapper(idx, cfg).map_se(codes, lens)
    assert not out.over_budget.any()
    for i, (name, seq, t, p, was_rc) in enumerate(reads):
        want = [(m.txp, m.pos, m.fwd, m.score) for m in qm.map_read(idx, codes[i][: lens[i]], cfg)]
        got = [
            (int(out.t[i, j]), int(out.pos[i, j]), out.strand[i, j] == 0, int(out.score[i, j]))
            for j in range(out.t.shape[1]) if out.t[i, j] != -1
        ]
        assert got == want, name
