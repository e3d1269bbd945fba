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


def test_fused_sa_cmp_equals_legacy_two_gather(tmp_path):
    """suffix_cmp via the fused sa_cmp row == the (sa_ext + text2q) path,
    including reads long enough to spill past the row's SA_CMP_WORDS."""
    import jax

    from rapmap_tpu.ops.device_index import upload_index
    from rapmap_tpu.ops import encode as denc
    from rapmap_tpu.ops.extend_packed import extend_packed, pack_reads

    rng = np.random.default_rng(79)
    idx, txps = toy_index(tmp_path, rng, n_txps=6, min_len=200, max_len=420, k=11)
    reads = sample_reads(rng, txps, 32, read_len=90, error_rate=0.02, n_frac=0.01)
    L = 90
    codes, lens = batch_of([r[1] for r in reads], L)
    didx, st = upload_index(idx)
    assert didx.sa_cmp is not None
    import jax.numpy as jnp

    rj = jnp.asarray(codes)
    preads = pack_reads(rj)
    nb = denc.next_bad_batch(rj, L)
    n_sa = didx.sa_ext.shape[0]
    R = len(reads)
    pos = jnp.asarray(rng.integers(0, L - idx.k, R).astype(np.int32))
    b0 = jnp.zeros(R, np.int32)
    e0 = jnp.full(R, n_sa, np.int32)
    act = jnp.asarray(rng.random(R) < 0.9)
    args = (preads, nb, jnp.asarray(lens), b0, e0, pos, act, idx.k, 24, L)
    out_f = jax.tree.map(np.asarray, extend_packed(didx, *args))
    out_l = jax.tree.map(np.asarray, extend_packed(didx._replace(sa_cmp=None), *args))
    for a, b, name in zip(out_f, out_l, ("b", "e", "mlen")):
        assert np.array_equal(a, b), name


@pytest.mark.parametrize("k", [5, 11, 16, 17, 31, 32])
def test_keys_from_packed_equal_charwise(k):
    """kmer_keys_from_packed (rolling-word fast path) == kmer_keys_batch."""
    import jax.numpy as jnp

    from rapmap_tpu.ops import encode as denc
    from rapmap_tpu.ops.extend_packed import pack_reads

    rng = np.random.default_rng(k)
    R, L = 16, max(2 * k + 3, 48)
    codes = rng.integers(1, 5, (R, L)).astype(np.int8)
    codes[rng.random((R, L)) < 0.05] = 5  # sprinkle Ns
    S = L - k + 1
    reads = jnp.asarray(codes)
    hi0, lo0, v0 = denc.kmer_keys_batch(reads, k)
    preads = pack_reads(reads)
    nb = denc.next_bad_batch(reads, L)
    hi1, lo1, v1 = denc.kmer_keys_from_packed(preads, nb, k, S)
    assert np.array_equal(np.asarray(v0), np.asarray(v1))
    m = np.asarray(v0)
    assert np.array_equal(np.asarray(hi0)[m], np.asarray(hi1)[m])
    assert np.array_equal(np.asarray(lo0)[m], np.asarray(lo1)[m])


def test_staged_bound_search_matches_unstaged(tmp_path, monkeypatch):
    """The width-compacted (staged) bound search is bit-identical to the
    plain early-exit loop: force the staged path onto a small repetitive
    world (wide intervals keep lanes unconverged past PRE trips so the
    quarter-width tail actually runs) and compare whole scan outputs."""
    import rapmap_tpu.ops.extend_packed as ep

    rng = np.random.default_rng(79)
    idx, txps = toy_index(
        tmp_path, rng, n_txps=12, min_len=150, max_len=320, k=11,
        shared_prefix=60,
    )
    reads = sample_reads(rng, txps, 64, read_len=52, error_rate=0.03, n_frac=0.02)
    L = 52
    codes, lens = batch_of([r[1] for r in reads], L)
    cfg = parity_cfg(idx, L)

    out_plain, _ = QuasiMapper(idx, cfg).map_se(codes, lens)
    monkeypatch.setattr(ep, "_STAGE_MIN_WIDTH", 1)
    out_staged, _ = QuasiMapper(idx, cfg).map_se(codes, lens)
    for f in ("t", "pos", "strand", "score", "n_mappings", "mapped"):
        assert np.array_equal(getattr(out_plain, f), getattr(out_staged, f)), f
