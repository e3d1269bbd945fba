"""SA-sharded 2-D mesh mapping == single-device mapping (BASELINE config 5)."""

import jax
import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.models.quasi import QuasiMapper
from rapmap_tpu.parallel import sharded
from tests.util import BASES, sample_reads, toy_index
from tests.test_device_parity import batch_of


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize(
    "n_data,n_idx,mode",
    [(4, 2, "canonical"), (2, 4, "canonical"), (4, 2, "strand"), (4, 2, "bsearch")],
)
def test_sharded_matches_single_device(tmp_path, n_data, n_idx, mode):
    rng = np.random.default_rng(91)
    idx, txps = toy_index(
        tmp_path / f"m{n_idx}{mode}", rng, n_txps=6, min_len=150, max_len=300, k=11,
        shared_prefix=30,
    )
    reads = sample_reads(rng, txps, 40, read_len=44, error_rate=0.03, n_frac=0.01)
    from tests.util import BASES

    seqs = [r[1] for r in reads] + [BASES[rng.integers(0, 4, 44)].tobytes() for _ in range(4)]
    L = 44
    per = -(-len(seqs) // n_data) + 1  # a little pad on every data shard
    B = n_data * per
    codes, lens = batch_of(seqs + [b""] * (B - len(seqs)), L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=34, expand_budget=128, max_out=32)

    mapper = QuasiMapper(idx, cfg)
    out1, ctr1 = mapper.map_se(codes, lens, n_valid=len(seqs))

    sharr_np, st = sharded.shard_quasi_index(
        idx, n_idx, use_chd=mode != "bsearch", canonical=mode == "canonical"
    )
    from rapmap_tpu.native import bindings as nat

    if mode == "canonical":
        if nat.available():  # the class-sharded CHD must engage, not fall back
            assert st.use_chd and st.chd_canonical and sharr_np.chd_rows.shape[-1] == 6
    elif mode == "strand":
        if nat.available():
            assert st.use_chd and not st.chd_canonical and sharr_np.chd_rows.shape[-1] == 4
    else:
        assert not st.use_chd and sharr_np.chd_dir is None
    mesh = sharded.make_mesh_2d(n_data, n_idx)
    nv = np.zeros(n_data, dtype=np.int32)
    rem = len(seqs)
    for i in range(n_data):
        nv[i] = min(per, max(rem, 0))
        rem -= nv[i]
    import jax.numpy as jnp

    sharr = jax.tree.map(jnp.asarray, sharr_np)
    out2, ctr2 = sharded.map_batch_se_sharded(
        sharr, st, jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(nv), cfg, mesh
    )
    out2 = jax.tree.map(np.asarray, out2)
    for field in ("t", "pos", "strand", "score", "n_mappings"):
        assert np.array_equal(getattr(out1, field), getattr(out2, field)), field
    for field in ctr1._fields:
        assert int(getattr(ctr1, field)) == int(np.asarray(getattr(ctr2, field))), field


def test_shard_cut_points(tmp_path):
    rng = np.random.default_rng(92)
    idx, _ = toy_index(tmp_path, rng, n_txps=5, min_len=120, max_len=250, k=9)
    arr, st = sharded.shard_quasi_index(idx, 3)
    # every kmer interval must be wholly inside one shard
    kb = np.asarray(idx.kmer_b)
    ke = np.asarray(idx.kmer_e)
    bases = arr.slot_base[:, 0]
    sizes = [(arr.sa_meta[p, :, 0] != 0).sum() for p in range(3)]  # loose
    cuts = list(bases) + [len(idx.sa)]
    for b, e in zip(kb, ke):
        owner = np.searchsorted(cuts, b, side="right") - 1
        assert cuts[owner] <= b and e <= cuts[owner + 1], (b, e, cuts)


@pytest.mark.skipif(len(jax.devices()) < 6, reason="needs 6 virtual devices")
def test_sharded_slot_ownership_past_cuts(tmp_path):
    """Regression: a shard shorter than S_pad must NOT claim the next shard's
    first (S_pad - ns) slots via its zero-padded sa_meta rows (double-claim
    makes the psum return t_true + 1). Reads are exact substrings starting at
    text positions of SA slots just past every shard cut, which expand
    precisely the slots inside the potential double-claim windows."""
    rng = np.random.default_rng(94)
    idx, _ = toy_index(tmp_path, rng, n_txps=7, min_len=120, max_len=400, k=11)
    n_idx, n_data = 3, 2
    arr, st = sharded.shard_quasi_index(idx, n_idx)
    S_pad = arr.sa_meta.shape[1]
    ns = arr.slot_base[:, 1]
    assert (ns < S_pad).any(), "test needs at least one short shard"

    sa = np.asarray(idx.sa, dtype=np.int64)
    text = np.asarray(idx.text)
    rl = 24
    seqs = []
    for p in range(1, n_idx):
        cut = int(arr.slot_base[p, 0])
        # slots of shard p that sit inside shard p-1's padded claim window
        hi = min(int(arr.slot_base[p - 1, 0]) + S_pad, cut + int(ns[p]))
        for s in range(cut, hi):
            g = sa[s]
            w = text[g : g + rl]
            if len(w) == rl and (w >= 1).all():  # sentinel-free window
                seqs.append(bytes(BASES[w - 1]))
    assert seqs, "no sentinel-free reads in the double-claim windows"
    seqs = seqs[:40]
    per = -(-len(seqs) // n_data)
    B = n_data * per
    codes, lens = batch_of(seqs + [b""] * (B - len(seqs)), rl)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=16, expand_budget=128, max_out=32)

    mapper = QuasiMapper(idx, cfg)
    out1, _ = mapper.map_se(codes, lens, n_valid=len(seqs))

    import jax.numpy as jnp

    sharr = jax.tree.map(jnp.asarray, arr)
    mesh = sharded.make_mesh_2d(n_data, n_idx)
    nv = np.zeros(n_data, np.int32)
    rem = len(seqs)
    for i in range(n_data):
        nv[i] = min(per, max(rem, 0)); rem -= nv[i]
    out2, _ = sharded.map_batch_se_sharded(
        sharr, st, jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(nv), cfg, mesh
    )
    out2 = jax.tree.map(np.asarray, out2)
    for field in ("t", "pos", "strand", "score", "n_mappings"):
        assert np.array_equal(getattr(out1, field), getattr(out2, field)), field


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_pe_matches_single_device(tmp_path):
    rng = np.random.default_rng(93)
    idx, txps = toy_index(tmp_path, rng, n_txps=5, min_len=250, max_len=400, k=11)
    comp = bytes.maketrans(b"ACGT", b"TGCA")
    L = 36
    lefts, rights = [], []
    for _ in range(22):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        a = int(rng.integers(0, len(seq) - 130))
        lefts.append(seq[a : a + L])
        rights.append(seq[a + 100 - L : a + 100].translate(comp)[::-1])
    n_data, n_idx = 4, 2
    per = -(-len(lefts) // n_data) + 1
    B = n_data * per
    c1, l1 = batch_of(lefts + [b""] * (B - len(lefts)), L)
    c2, l2 = batch_of(rights + [b""] * (B - len(rights)), L)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=26, expand_budget=64, max_out=32)
    mapper = QuasiMapper(idx, cfg)
    _, _, po1, ctr1 = mapper.map_pe(c1, l1, c2, l2, n_valid=len(lefts))

    import jax.numpy as jnp

    sharr_np, st = sharded.shard_quasi_index(idx, n_idx)
    sharr = jax.tree.map(jnp.asarray, sharr_np)
    mesh = sharded.make_mesh_2d(n_data, n_idx)
    nv = np.zeros(n_data, np.int32)
    rem = len(lefts)
    for i in range(n_data):
        nv[i] = min(per, max(rem, 0)); rem -= nv[i]
    _, _, po2, ctr2 = sharded.map_batch_pe_sharded(
        sharr, st, jnp.asarray(c1), jnp.asarray(l1), jnp.asarray(c2), jnp.asarray(l2),
        jnp.asarray(nv), cfg, mesh,
    )
    po2 = jax.tree.map(np.asarray, po2)
    for field in ("t", "p1", "s1", "has1", "p2", "s2", "has2", "concordant"):
        assert np.array_equal(getattr(po1, field), getattr(po2, field)), field
    assert int(ctr1.reads_mapped) == int(np.asarray(ctr2.reads_mapped))


@pytest.fixture
def x64():
    """64-bit JAX for the slot64 regime; restored so other tests stay 32-bit."""
    old = jax.config.jax_enable_x64
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", old)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_slot64_matches_single_device(tmp_path, x64):
    """Genome-scale slot layout (int64 GLOBAL slot ids, upstream divsufsort64
    regime past 2^31 SA slots) forced small: bit-identical SE output vs the
    single-device int32 path, and vs the int32 sharded path."""
    rng = np.random.default_rng(95)
    idx, txps = toy_index(
        tmp_path, rng, n_txps=6, min_len=150, max_len=300, k=11, shared_prefix=30
    )
    reads = sample_reads(rng, txps, 40, read_len=44, error_rate=0.03, n_frac=0.01)
    seqs = [r[1] for r in reads]
    n_data, n_idx = 4, 2
    per = -(-len(seqs) // n_data) + 1
    B = n_data * per
    codes, lens = batch_of(seqs + [b""] * (B - len(seqs)), 44)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=34, expand_budget=128, max_out=32)

    mapper = QuasiMapper(idx, cfg)
    out1, ctr1 = mapper.map_se(codes, lens, n_valid=len(seqs))

    import jax.numpy as jnp

    mesh = sharded.make_mesh_2d(n_data, n_idx)
    nv = np.zeros(n_data, np.int32)
    rem = len(seqs)
    for i in range(n_data):
        nv[i] = min(per, max(rem, 0)); rem -= nv[i]
    outs = {}
    for slot64 in (False, True):
        arr, st = sharded.shard_quasi_index(idx, n_idx, slot64=slot64)
        assert arr.slot_base.dtype == (np.int64 if slot64 else np.int32)
        sharr = jax.tree.map(jnp.asarray, arr)
        if slot64:
            assert sharr.slot_base.dtype == jnp.int64  # x64 actually on
        out2, ctr2 = sharded.map_batch_se_sharded(
            sharr, st, jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(nv),
            cfg, mesh,
        )
        outs[slot64] = jax.tree.map(np.asarray, out2)
        for field in ("t", "pos", "strand", "score", "n_mappings"):
            assert np.array_equal(getattr(out1, field), getattr(outs[slot64], field)), (
                slot64, field,
            )
        assert int(ctr1.reads_mapped) == int(np.asarray(ctr2.reads_mapped))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("seed", [811, 822, 833])
def test_sharded_parity_fuzz(tmp_path, seed):
    """Randomized regime fuzz through the sharded engine: txome shape, k,
    read mix, config knobs, mesh shape, and probe mode all drawn from the
    seed — sharded == single-device bit-for-bit (which the deterministic
    suites pin to the oracle). Net for the canonical class-sharded CHD."""
    rng = np.random.default_rng(seed)
    k = int(rng.integers(9, 16))
    idx, txps = toy_index(
        tmp_path, rng,
        n_txps=int(rng.integers(3, 9)),
        min_len=int(rng.integers(80, 150)),
        max_len=int(rng.integers(200, 500)),
        k=k,
        shared_prefix=int(rng.integers(0, 50)),
    )
    rl = int(rng.integers(k + 10, 70))
    reads = sample_reads(
        rng, txps, int(rng.integers(12, 30)), read_len=rl,
        error_rate=float(rng.uniform(0, 0.08)),
        n_frac=float(rng.uniform(0, 0.04)),
    )
    seqs = [r[1] for r in reads] + [
        BASES[rng.integers(0, 4, rl)].tobytes() for _ in range(3)
    ]
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
    cfg = MapConfig(
        k=idx.k, max_hits_per_strand=34, expand_budget=128, max_out=32, **kw
    )
    n_data, n_idx = [(2, 2), (4, 2), (2, 4), (2, 3)][int(rng.integers(0, 4))]
    mode = ["canonical", "strand", "bsearch"][int(rng.integers(0, 3))]

    per = -(-len(seqs) // n_data) + 1
    B = n_data * per
    codes, lens = batch_of(seqs + [b""] * (B - len(seqs)), rl)
    mapper = QuasiMapper(idx, cfg)
    out1, ctr1 = mapper.map_se(codes, lens, n_valid=len(seqs))

    import jax.numpy as jnp

    sharr_np, st = sharded.shard_quasi_index(
        idx, n_idx, use_chd=mode != "bsearch", canonical=mode == "canonical"
    )
    sharr = jax.tree.map(jnp.asarray, sharr_np)
    mesh = sharded.make_mesh_2d(n_data, n_idx)
    nv = np.zeros(n_data, np.int32)
    rem = len(seqs)
    for i in range(n_data):
        nv[i] = min(per, max(rem, 0)); rem -= nv[i]
    out2, ctr2 = sharded.map_batch_se_sharded(
        sharr, st, jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(nv), cfg, mesh
    )
    out2 = jax.tree.map(np.asarray, out2)
    for field in ("t", "pos", "strand", "score", "n_mappings"):
        assert np.array_equal(getattr(out1, field), getattr(out2, field)), (
            mode, n_data, n_idx, field,
        )
    for field in ctr1._fields:
        assert int(getattr(ctr1, field)) == int(np.asarray(getattr(ctr2, field))), field


def test_slot64_requires_x64(tmp_path):
    rng = np.random.default_rng(96)
    idx, _ = toy_index(tmp_path, rng, n_txps=3, min_len=100, max_len=200, k=9)
    assert not jax.config.jax_enable_x64
    with pytest.raises(ValueError, match="slot64"):
        sharded.shard_quasi_index(idx, 2, slot64=True)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_slot64_genome_geometry_shift(tmp_path, x64):
    """Genome-GEOMETRY rehearsal (VERDICT r4 item 4): global slot coordinates
    ABOVE 2^31 flow through the whole slot64 device path. A uniform +B0 shift
    of every global carrier (slot_base col 0; canonical class rows' global
    [bf,ef,br,er]) preserves all differences and ownership tests, so outputs
    must be bit-identical — any int32 truncation of a global wraps the
    shifted run and breaks parity. The r2 slot64 demo kept globals < 2^31;
    this drives the 2.2 Gbase coordinate regime at toy size."""
    rng = np.random.default_rng(97)
    idx, txps = toy_index(
        tmp_path, rng, n_txps=6, min_len=150, max_len=300, k=11, shared_prefix=30
    )
    reads = sample_reads(rng, txps, 40, read_len=44, error_rate=0.03, n_frac=0.01)
    seqs = [r[1] for r in reads]
    n_data, n_idx = 4, 2
    per = -(-len(seqs) // n_data) + 1
    B = n_data * per
    codes, lens = batch_of(seqs + [b""] * (B - len(seqs)), 44)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=34, expand_budget=128, max_out=32)

    import jax.numpy as jnp

    mesh = sharded.make_mesh_2d(n_data, n_idx)
    nv = np.zeros(n_data, np.int32)
    rem = len(seqs)
    for i in range(n_data):
        nv[i] = min(per, max(rem, 0)); rem -= nv[i]

    arr, st = sharded.shard_quasi_index(idx, n_idx, slot64=True)
    assert arr.slot_base.dtype == np.int64

    B0 = np.int64(2**31 + 12345)
    slot_base2 = arr.slot_base.copy()
    slot_base2[:, 0] += B0  # col 1 is the shard's slot COUNT — not shifted
    chd_rows2 = arr.chd_rows
    if chd_rows2 is not None and chd_rows2.shape[-1] == 6:
        chd_rows2 = chd_rows2.copy()
        real = chd_rows2[..., 0] != -1  # sentinel rows carry no intervals
        for c in range(2, 6):
            chd_rows2[..., c] = np.where(real, chd_rows2[..., c] + B0,
                                         chd_rows2[..., c])
        assert int(chd_rows2[..., 2:6].max()) > 2**31  # the regime is real
    arr2 = arr._replace(slot_base=slot_base2, chd_rows=chd_rows2)
    assert int(slot_base2[:, 0].max()) > 2**31

    outs = []
    for a in (arr, arr2):
        sharr = jax.tree.map(jnp.asarray, a)
        out, ctr = sharded.map_batch_se_sharded(
            sharr, st, jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(nv),
            cfg, mesh,
        )
        outs.append((jax.tree.map(np.asarray, out),
                     int(np.asarray(ctr.reads_mapped))))
    for field in ("t", "pos", "strand", "score", "n_mappings"):
        assert np.array_equal(getattr(outs[0][0], field),
                              getattr(outs[1][0], field)), field
    assert outs[0][1] == outs[1][1] and outs[0][1] > 0
