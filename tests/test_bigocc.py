"""Big-occ pseudo layout (occ pair rows + uint32-in-int32 slot ids): the
device path that replaces the former >= 2^31 NotImplementedError gate
(upstream:src/RapMapIndexer.cpp bigSA-era regime, SURVEY.md §3.1 analog).

At test scale ids stay below 2^31, so these pin the LAYOUT (pair rows,
parity select, width-form found compares) bit-exactly against the narrow
path and the oracle; the wrap arithmetic itself is exercised by
scripts/genome_scale.py on a real >= 2^31 build.
"""

import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.builder import build_pseudo_index
from rapmap_tpu.models.pseudo import PseudoMapper, upload_pseudo_index
from tests.test_device_parity import batch_of
from tests.util import random_transcriptome, sample_reads, write_fasta


@pytest.fixture(scope="module")
def world(tmp_path_factory):
    rng = np.random.default_rng(21)
    base = random_transcriptome(rng, n_txps=5, min_len=150, max_len=250)
    shared = base[0][1][20:100]
    txps = [(f"t{i}", s[:25] + shared + s[25:]) for i, (_, s) in enumerate(base)]
    fa = write_fasta(str(tmp_path_factory.mktemp("bigocc") / "t.fa"), txps)
    idx = build_pseudo_index(fa, k=11)
    reads = [r[1] for r in sample_reads(rng, txps, 32, read_len=40, error_rate=0.02)]
    return idx, reads


def test_bigocc_layout_bitexact(world):
    idx, reads = world
    codes, lens = batch_of(reads, 40)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8, expand_budget=64, max_out=32)
    m1 = PseudoMapper(idx, cfg)
    m2 = PseudoMapper(idx, cfg, force_big_occ=True)
    assert not m1.st.occ_pairs and m2.st.occ_pairs
    o1, c1 = m1.map_se(codes, lens)
    o2, c2 = m2.map_se(codes, lens)
    for f, a, b in zip(o1._fields, o1, o2):
        assert np.array_equal(a, b), f"MapOut.{f} differs under big-occ layout"
    for f, a, b in zip(c1._fields, c1, c2):
        assert np.array_equal(a, b), f"Counters.{f} differs under big-occ layout"


def test_bigocc_wire_bitexact(world):
    idx, reads = world
    codes, lens = batch_of(reads, 40)
    cfg = MapConfig(k=idx.k, max_hits_per_strand=8, expand_budget=64,
                    max_out=16, rec_slots=8, chunk=16)
    m1 = PseudoMapper(idx, cfg)
    m2 = PseudoMapper(idx, cfg, force_big_occ=True)
    a = m1.fetch(m1.map_se_async(codes, lens))
    b = m2.fetch(m2.map_se_async(codes, lens))
    assert np.array_equal(a.recs, b.recs)
    assert np.array_equal(a.counts, b.counts)
    assert a.counters == b.counters


def test_no_2pow31_gate_left():
    """The former hard NotImplementedError is gone; only the 2^32 single-
    device ceiling remains (with a sharding pointer)."""
    import inspect

    import rapmap_tpu.models.pseudo as pm

    src = inspect.getsource(pm)
    assert "NotImplementedError" not in src
    assert "2**32" in src
