"""CHD perfect-hash lookup (the reference's BooPHF role,
upstream:include/BooPHF.hpp, SURVEY.md §2.2).

Checks: native build places every key injectively, the numpy query model
returns each key's own row, the device 2-gather probe agrees bit-exactly
with the binary-search path on present AND absent keys, and the index
round-trips the CHD section through disk.
"""

import numpy as np
import pytest

from rapmap_tpu.index.chd import chd_query_np
from rapmap_tpu.native import bindings as nat
from tests.util import toy_index

requires_native = pytest.mark.skipif(
    not nat.available(), reason="native library unavailable"
)


def _key_space(idx, rng, n):
    """Random keys in [0, 4^k) split (hi, lo), excluding keys in the table."""
    k = idx.k
    present = set(
        zip(np.asarray(idx.kmer_hi).tolist(), np.asarray(idx.kmer_lo).tolist())
    )
    vals = rng.integers(0, 1 << (2 * k), size=4 * n, dtype=np.uint64)
    hi = (vals >> np.uint64(32)).astype(np.uint32)
    lo = (vals & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    keep = [i for i in range(len(vals)) if (int(hi[i]), int(lo[i])) not in present]
    keep = np.asarray(keep[:n], dtype=np.int64)
    return hi[keep], lo[keep]


@requires_native
def test_chd_build_is_perfect(tmp_path, rng):
    """Canonical-class CHD: every table k-mer's canonical key resolves to a
    class whose (fwd_row, rc_row) points back at that k-mer's row."""
    from rapmap_tpu.index.chd import key64_of, rc_key64_np

    idx, _ = toy_index(tmp_path / "i", rng, n_txps=16, min_len=120, max_len=500)
    assert idx.chd_dir is not None, "builder should attach a CHD section"
    chd = idx.meta["chd"]
    assert chd.get("canonical")
    key64 = key64_of(idx.kmer_hi, idx.kmer_lo)
    can64 = np.minimum(key64, rc_key64_np(key64, idx.k))
    cls_ids = chd_query_np(
        (can64 >> np.uint64(32)).astype(np.uint32),
        (can64 & np.uint64(0xFFFFFFFF)).astype(np.uint32),
        np.asarray(idx.chd_dir), np.asarray(idx.chd_perm),
        chd["seed"], chd["m_bits"], chd["t_bits"],
    )
    assert (cls_ids >= 0).all()
    cls = np.asarray(idx.chd_cls)
    is_can = key64 == can64
    back = np.where(is_can, cls[cls_ids, 0], cls[cls_ids, 1])
    assert np.array_equal(back, np.arange(len(key64)))
    # perm is injective over occupied slots and covers every class
    occ = np.asarray(idx.chd_perm)
    occ = occ[occ >= 0]
    assert len(np.unique(occ)) == len(occ) == len(cls)


@requires_native
def test_chd_device_lookup_matches_binary_search(tmp_path, rng):
    from rapmap_tpu.ops.device_index import EngineStatic, upload_index
    from rapmap_tpu.ops.lookup import kmer_lookup

    idx, _ = toy_index(tmp_path / "i", rng, n_txps=12, min_len=100, max_len=400)
    didx, st = upload_index(idx)
    assert st.use_chd
    st_bs = EngineStatic.for_index(idx, use_chd=False)

    khi = np.asarray(idx.kmer_hi, np.uint32)
    klo = np.asarray(idx.kmer_lo, np.uint32)
    ahi, alo = _key_space(idx, rng, 256)
    qhi = np.concatenate([khi, ahi])
    qlo = np.concatenate([klo, alo])

    f_chd, b_chd, e_chd = (
        np.asarray(x) for x in kmer_lookup(didx, st, qhi, qlo)
    )
    f_bs, b_bs, e_bs = (
        np.asarray(x) for x in kmer_lookup(didx, st_bs, qhi, qlo)
    )
    assert np.array_equal(f_chd, f_bs)
    assert np.array_equal(b_chd, b_bs)
    assert np.array_equal(e_chd, e_bs)
    # every present key found, intervals = the table's
    n = len(khi)
    assert f_chd[:n].all()
    assert np.array_equal(b_chd[:n], np.asarray(idx.kmer_b))
    assert np.array_equal(e_chd[:n], np.asarray(idx.kmer_e))
    assert not f_chd[n:].any()


@requires_native
def test_chd_survives_disk_roundtrip(tmp_path, rng):
    from rapmap_tpu.index.format import load_index, save_index

    idx, _ = toy_index(tmp_path / "i", rng, n_txps=6, min_len=90, max_len=200)
    out = str(tmp_path / "saved")
    save_index(idx, out)
    idx2 = load_index(out)
    assert idx2.chd_dir is not None and idx2.chd_perm is not None
    assert np.array_equal(np.asarray(idx.chd_dir), np.asarray(idx2.chd_dir))
    assert np.array_equal(np.asarray(idx.chd_perm), np.asarray(idx2.chd_perm))
    assert idx2.meta["chd"] == idx.meta["chd"]
