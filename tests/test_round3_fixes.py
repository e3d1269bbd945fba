"""Round-3 hygiene/advice fixes, each pinned by a test:

* CHD empty-slot sentinel vs the poly-T k-mer at k=32 (ADVICE r2 #1)
* --minScoreFraction threshold clamped to the 12-bit wire max (ADVICE r2 #2)
* --minScoreFraction without --mappingScore is rejected (ADVICE r2 #3)
* primary/MAPQ promotion when score suppression removes a read's first
  record (ADVICE r2 #4, SEMANTICS.md §9)
* quasi_coverage threshold: device integer table == oracle f64 boundary
  (VERDICT r2 weak #6)
"""

import io

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig


# ---------------------------------------------------------------------------
# CHD sentinel: a probe for the absent all-T k-mer (key == all ones == the
# empty-slot sentinel when k == 32) must NOT report found on a sentinel row.
def test_chd_sentinel_poly_t_k32():
    import jax.numpy as jnp

    from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic
    from rapmap_tpu.ops.lookup import _chd_lookup

    m_bits, t_bits = 4, 4
    sentinel_row = np.array([-1, -1, 0, 0], dtype=np.int32)
    didx = DeviceQuasiIndex(
        text2q=jnp.zeros((4, 4), jnp.uint32),
        sa_meta=jnp.zeros((4, 2), jnp.int32),
        chd_dir=jnp.zeros(1 << m_bits, jnp.int32),
        chd_rows=jnp.asarray(np.tile(sentinel_row, (1 << t_bits, 1))),
    )
    st = EngineStatic(
        k=32, prefix_bases=4, lookup_steps=1, pad_tail=64,
        use_chd=True, chd_seed=7, chd_m_bits=m_bits, chd_t_bits=t_bits,
        chd_canonical=False,
    )
    ones = jnp.full((8,), 0xFFFFFFFF, jnp.uint32)  # T^32 2-bit key
    found, b, e = _chd_lookup(didx, st, ones, ones)
    assert not bool(np.asarray(found).any()), (
        "poly-T probe false-hit an empty sentinel slot"
    )
    # a real row with a non-empty interval still hits
    real = np.tile(np.array([-1, -1, 3, 9], dtype=np.int32), (1 << t_bits, 1))
    didx2 = didx.replace(chd_rows=jnp.asarray(real)) if hasattr(didx, "replace") else (
        DeviceQuasiIndex(
            text2q=didx.text2q, sa_meta=didx.sa_meta,
            chd_dir=didx.chd_dir, chd_rows=jnp.asarray(real),
        )
    )
    found2, b2, e2 = _chd_lookup(didx2, st, ones, ones)
    assert bool(np.asarray(found2).all())
    assert np.asarray(b2).tolist() == [3] * 8 and np.asarray(e2).tolist() == [9] * 8


# ---------------------------------------------------------------------------
# Score threshold clamp (wire scores ride 12 bits)
def test_min_score_threshold_clamped():
    from rapmap_tpu.models.scorefilter import _SCORE_MAX, filter_se, min_score_of
    from rapmap_tpu.ops.wire import FLAG_MAPPED, WireResult

    cfg = MapConfig(k=31, mapping_score=True, min_score_fraction=1.0, align_ma=2)
    # ma * readLen = 6000 > 4095: unclamped threshold would suppress even a
    # perfect (wire-clamped) alignment
    assert min_score_of(cfg, 3000) == _SCORE_MAX == 4095
    recs = np.array([[0, 10, 0, 4095]], dtype=np.int32)  # perfect, clamped
    wr = WireResult(
        recs=recs, counts=np.array([1], np.int32),
        flags=np.array([FLAG_MAPPED], np.int32), total=1, overflowed=False,
        counters={"reads_mapped": 1, "records": 1},
    )
    out = filter_se(wr, np.array([3000], np.int32), cfg)
    assert out.total == 1 and out.counts[0] == 1, (
        "perfect long-read alignment must survive --minScoreFraction 1.0"
    )


def test_cli_rejects_min_score_fraction_without_mapping_score(tmp_path):
    from rapmap_tpu.cli import _cfg_from_args, build_parser

    args = build_parser().parse_args([
        "quasimap", "-i", "x", "-r", "y", "-o", "z", "--minScoreFraction", "0.5",
    ])
    with pytest.raises(SystemExit):
        _cfg_from_args(args, k=31)


# ---------------------------------------------------------------------------
# Primary promotion: suppressing the first record promotes the next survivor
# to primary (no 0x100, MAPQ 1) — SEMANTICS.md §9
def test_primary_promotion_after_suppression():
    from rapmap_tpu.io.sam import write_se_records_dense
    from rapmap_tpu.models.scorefilter import filter_se
    from rapmap_tpu.ops.wire import FLAG_MAPPED, WireResult

    cfg = MapConfig(k=31, mapping_score=True, min_score_fraction=0.9, align_ma=2)
    # read of length 60: threshold = ceil(0.9 * 2 * 60) = 108
    recs = np.array(
        [[0, 5, 0, 84],    # first record: low score -> suppressed
         [1, 9, 1, 120]],  # second: survives, must become primary
        dtype=np.int32,
    )
    wr = WireResult(
        recs=recs, counts=np.array([2], np.int32),
        flags=np.array([FLAG_MAPPED], np.int32), total=2, overflowed=False,
        counters={"reads_mapped": 1, "records": 2},
    )
    out = filter_se(wr, np.array([60], np.int32), cfg)
    assert out.total == 1 and int(out.counts[0]) == 1
    assert int(out.flags[0]) & FLAG_MAPPED, "read still has a surviving record"
    buf = io.StringIO()
    n = write_se_records_dense(
        buf, ["r0"], [b"A" * 60], [b"I" * 60], np.asarray(out.recs),
        np.asarray(out.counts), ["t0", "t1"], with_score=True,
    )
    assert n == 1
    fields = buf.getvalue().strip().split("\t")
    flag, rname, mapq = int(fields[1]), fields[2], int(fields[4])
    assert not flag & 0x100, "surviving record must be primary"
    assert mapq == 1 and rname == "t1"
    assert "AS:i:120" in buf.getvalue()


# ---------------------------------------------------------------------------
# quasi_coverage boundary: the device's integer ceil-table must agree with
# the oracle's f64 threshold exactly where f32 rounding used to flip it.
@pytest.mark.parametrize(
    "qc,L,ncov",
    [
        # f64 thr exactly 15.0 -> cov 15 passes; f32 thr 15.0000010 failed it
        (0.15, 100, 15),
        # f64 thr 21.000000000000004 -> cov 21 fails; f32 thr 21.0 passed it
        (0.28, 75, 21),
    ],
)
def test_quasi_coverage_boundary_parity(tmp_path, qc, L, ncov):
    from rapmap_tpu.index.builder import build_quasi_index
    from rapmap_tpu.models.quasi import QuasiMapper
    from rapmap_tpu.oracle import quasimap as qm
    from tests.util import random_transcriptome, write_fasta

    rng = np.random.default_rng(42)
    txps = random_transcriptome(rng, n_txps=4, min_len=200, max_len=300)
    fa = write_fasta(str(tmp_path / "t.fa"), txps)
    idx = build_quasi_index(fa, str(tmp_path / "idx"), k=11)
    # read: ncov matching bases then Ns -> exactly one MMP of length ncov
    prefix = txps[0][1][20 : 20 + ncov]
    read = prefix + b"N" * (L - ncov)
    from rapmap_tpu.index.encode import encode_reads

    codes = np.full((1, L), 5, dtype=np.int8)
    codes[0] = encode_reads(np.frombuffer(read, dtype=np.uint8))
    lens = np.array([L], np.int32)
    cfg = MapConfig(k=11, quasi_coverage=qc, max_hits_per_strand=L,
                    expand_budget=512, max_out=64)
    want = qm.map_read(idx, codes[0][:L], cfg)
    # sanity: the coverage really sits on the boundary
    assert sum(
        h.length for h in qm.scan_read(idx, codes[0][:L], cfg)
    ) == ncov if hasattr(qm, "scan_read") else True
    mapper = QuasiMapper(idx, cfg)
    out, ctr = mapper.map_se(codes, lens)
    got = [
        (int(out.t[0, j]), int(out.pos[0, j]), out.strand[0, j] == 0)
        for j in range(out.t.shape[1]) if out.t[0, j] != -1
    ]
    exp = [(m.txp, m.pos, m.fwd) for m in want]
    assert got == exp, f"device {got} != oracle {exp} at qc={qc} L={L}"
    # the two cases bracket the boundary: one maps, one does not
    if (qc, L) == (0.15, 100):
        assert exp, "oracle should keep cov==15 at qc=0.15 (thr 15.0 exactly)"
    else:
        assert not exp, "oracle should drop cov==21 at qc=0.28 (thr 21.000…4)"
