"""--mappingScore in the SA-sharded engine (SEMANTICS.md §9): sharded
records carry the same banded alignment scores (SAM AS) as the replicated
wire engine — text2q/txp_align are replicated across idx shards, so the
band DP runs shard-locally with no collective."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rapmap_tpu.config import MapConfig
from rapmap_tpu.models.quasi import QuasiMapper
from rapmap_tpu.parallel import sharded
from tests.test_device_parity import batch_of
from tests.util import sample_reads, toy_index


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_sharded_mapping_score_matches_replicated(tmp_path):
    rng = np.random.default_rng(77)
    idx, txps = toy_index(
        tmp_path, rng, n_txps=6, min_len=150, max_len=300, k=11, shared_prefix=40
    )
    L = 44
    reads = sample_reads(rng, txps, 36, read_len=L, error_rate=0.04)
    seqs = [r[1] for r in reads]
    n_data, n_idx = 4, 2
    per = -(-len(seqs) // n_data)
    B = n_data * per
    codes, lens = batch_of(seqs + [b""] * (B - len(seqs)), L)
    cfg = MapConfig(
        k=idx.k, max_hits_per_strand=34, expand_budget=128, max_out=16,
        rec_slots=24, mapping_score=True,
    )

    # replicated wire path: records carry AS in field 3 (ts-ordered per read)
    mapper = QuasiMapper(idx, cfg)
    wr = mapper.fetch(mapper.map_se_async(codes, lens, n_valid=len(seqs)))

    sharr_np, st = sharded.shard_quasi_index(idx, n_idx)
    mesh = sharded.make_mesh_2d(n_data, n_idx)
    nv = np.full(n_data, per, np.int32)
    nv[-1] = len(seqs) - per * (n_data - 1)
    sharr = jax.tree.map(jnp.asarray, sharr_np)
    out2, _ = sharded.map_batch_se_sharded(
        sharr, st, jnp.asarray(codes), jnp.asarray(lens), jnp.asarray(nv), cfg, mesh
    )
    out2 = jax.tree.map(np.asarray, out2)

    # align wire records (dense, per-read counts) to MapOut slots (ts order)
    base = 0
    n_checked = 0
    for i in range(len(seqs)):
        cnt = int(wr.counts[i])
        for j in range(cnt):
            t, pos, strand, score = (int(x) for x in wr.recs[base + j])
            assert out2.t[i, j] == t and out2.pos[i, j] == pos
            assert out2.strand[i, j] == strand
            assert out2.score[i, j] == score, (
                f"read {i} rec {j}: sharded AS {out2.score[i, j]} != wire {score}"
            )
            n_checked += 1
        base += cnt
    assert n_checked > 10, "test world produced too few scored records"
