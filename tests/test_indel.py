"""Indel behavior of the MMP chain (VERDICT r2 item 5; RapMap paper §2-3:
quasi-mapping emits no gapped alignment, so an indel splits the MMP chain
and the voted position may shift by the indel length).

Pins: (1) device == oracle bit-exactly on indel reads (the property that
matters for parity), (2) the mapped locus stays the true transcript within
the indel-length position window, (3) the MMP chain actually breaks at the
indel (two hits, not one)."""

import numpy as np

from rapmap_tpu.config import MapConfig
from rapmap_tpu.oracle import quasimap as qm
from tests.test_device_parity import assert_se_parity, codes_of, parity_cfg
from tests.util import random_transcriptome, toy_index


def _mk(tmp_path, rng):
    return toy_index(tmp_path, rng, n_txps=4, min_len=220, max_len=300, k=11)


def test_insertion_splits_chain_maps_true_locus(tmp_path):
    rng = np.random.default_rng(41)
    idx, txps = _mk(tmp_path, rng)
    seq = txps[0][1]
    p = 40
    read = seq[p : p + 30] + b"A" + seq[p + 30 : p + 59]  # 60 bp, 1 bp ins
    cfg = parity_cfg(idx, 60)
    assert_se_parity(idx, [read], cfg)  # device == oracle on the indel read
    codes, L = codes_of(read, 60)
    ms = qm.map_read(idx, codes[:L], cfg)
    assert ms, "1 bp insertion must not unmap a 60 bp read (both sides > k)"
    best = ms[0]
    assert best.txp == 0 and best.fwd and abs(best.pos - p) <= 1
    # the chain broke: support comes from two MMPs voting different offsets,
    # so no single (t, pos) gets both votes
    assert best.score == 1


def test_deletion_splits_chain_maps_true_locus(tmp_path):
    rng = np.random.default_rng(42)
    idx, txps = _mk(tmp_path, rng)
    seq = txps[1][1]
    p = 50
    read = seq[p : p + 30] + seq[p + 32 : p + 62]  # 60 bp, 2 bp deletion
    cfg = parity_cfg(idx, 60)
    assert_se_parity(idx, [read], cfg)
    codes, L = codes_of(read, 60)
    ms = qm.map_read(idx, codes[:L], cfg)
    assert ms
    best = ms[0]
    assert best.txp == 1 and best.fwd and abs(best.pos - p) <= 2


def test_indel_mid_kmer_only_breaks_locally(tmp_path):
    """An indel inside the first k bases removes the left anchor entirely;
    the right side alone still places the read (shifted by the indel)."""
    rng = np.random.default_rng(43)
    idx, txps = _mk(tmp_path, rng)
    seq = txps[2][1]
    p = 60
    read = seq[p : p + 5] + b"C" + seq[p + 5 : p + 54]  # ins at base 5 < k
    cfg = parity_cfg(idx, 60)
    assert_se_parity(idx, [read], cfg)
    codes, L = codes_of(read, 60)
    ms = qm.map_read(idx, codes[:L], cfg)
    assert ms
    assert ms[0].txp == 2 and abs(ms[0].pos - p) <= 1


def test_indel_fuzz_device_oracle_parity(tmp_path):
    """Randomized indel reads (1-3 bp ins/del at random offsets): the device
    engine matches the oracle on every one."""
    rng = np.random.default_rng(44)
    idx, txps = _mk(tmp_path, rng)
    reads = []
    for i in range(24):
        t = int(rng.integers(0, len(txps)))
        seq = txps[t][1]
        p = int(rng.integers(0, len(seq) - 70))
        cut = int(rng.integers(8, 48))
        ilen = int(rng.integers(1, 4))
        if rng.random() < 0.5:  # insertion
            ins = bytes(rng.choice(list(b"ACGT"), ilen))
            r = seq[p : p + cut] + ins + seq[p + cut : p + 56 - ilen]
        else:  # deletion
            r = seq[p : p + cut] + seq[p + cut + ilen : p + 56 + ilen]
        reads.append(r[:56])
    assert_se_parity(idx, reads, parity_cfg(idx, 56))
