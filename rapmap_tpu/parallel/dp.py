"""Data-parallel mapping over a device mesh (SURVEY.md §2.3, §5.8).

The index is replicated per device (the default design: a transcriptome index
is a few GB and fits in HBM); read batches shard over the "data" mesh axis;
HitCounters reduce with psum inside shard_map so every host sees global stats.
SAM emission stays host-local per shard (no heavy cross-host traffic).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from rapmap_tpu.config import MapConfig
from rapmap_tpu.models.quasi import Counters
from rapmap_tpu.ops.collate import collate_batch
from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic
from rapmap_tpu.ops.mmp import scan_dispatch
from rapmap_tpu.ops.pairs import merge_pairs_batch


def make_mesh(n_data: int | None = None, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = n_data or len(devices)
    return Mesh(np.asarray(devices[:n]).reshape(n), ("data",))


def _se_shard(didx, st, reads, lens, n_valid_local, cfg):
    hits = scan_dispatch(didx, st, reads, lens, cfg)
    out = collate_batch(didx, st, hits, lens, cfg)
    B = reads.shape[0]
    real = np.arange(B, dtype=np.int32) < n_valid_local
    ctr = Counters(
        reads_total=jax.lax.psum(n_valid_local.astype(jnp.int32), "data"),
        reads_mapped=jax.lax.psum(jnp.sum(out.mapped & real, dtype=jnp.int32), "data"),
        too_ambiguous=jax.lax.psum(jnp.sum(out.too_ambiguous & real, dtype=jnp.int32), "data"),
        over_budget=jax.lax.psum(jnp.sum(out.over_budget & real, dtype=jnp.int32), "data"),
        records=jax.lax.psum(
            jnp.sum(jnp.where(real[:, None], out.t != -1, False), dtype=jnp.int32), "data"
        ),
        out_truncated=jax.lax.psum(
            jnp.sum(out.out_truncated & real, dtype=jnp.int32), "data"
        ),
    )
    return out, ctr


@partial(jax.jit, static_argnames=("st", "cfg", "mesh"))
def map_batch_se_dp(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    reads: jnp.ndarray,    # (B_total, L); B_total % mesh size == 0
    lens: jnp.ndarray,
    n_valid_local: jnp.ndarray,  # (n_dev,) int32 valid rows per shard
    cfg: MapConfig,
    mesh: Mesh,
):
    fn = jax.shard_map(
        lambda didx, reads, lens, nv: _se_shard(didx, st, reads, lens, nv[0], cfg),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P()),
        check_vma=False,
    )
    return fn(didx, reads, lens, n_valid_local)


def _pe_shard(didx, st, r1, l1, r2, l2, nv, cfg):
    o1, _ = _se_shard(didx, st, r1, l1, nv, cfg)
    o2, _ = _se_shard(didx, st, r2, l2, nv, cfg)
    pairs = merge_pairs_batch(o1, o2, cfg)
    B = r1.shape[0]
    real = np.arange(B, dtype=np.int32) < nv
    ctr = Counters(
        reads_total=jax.lax.psum(nv.astype(jnp.int32), "data"),
        reads_mapped=jax.lax.psum(jnp.sum(pairs.any_record & real, dtype=jnp.int32), "data"),
        too_ambiguous=jax.lax.psum(jnp.sum(pairs.too_ambiguous & real, dtype=jnp.int32), "data"),
        over_budget=jax.lax.psum(
            jnp.sum((o1.over_budget | o2.over_budget) & real, dtype=jnp.int32), "data"
        ),
        records=jax.lax.psum(
            jnp.sum(jnp.where(real[:, None], pairs.t != -1, False), dtype=jnp.int32), "data"
        ),
        out_truncated=jax.lax.psum(
            jnp.sum(
                (o1.out_truncated | o2.out_truncated | pairs.out_truncated) & real,
                dtype=jnp.int32,
            ),
            "data",
        ),
    )
    return o1, o2, pairs, ctr


@partial(jax.jit, static_argnames=("st", "cfg", "mesh"))
def map_batch_pe_dp(
    didx: DeviceQuasiIndex, st: EngineStatic,
    reads1, lens1, reads2, lens2, n_valid_local, cfg: MapConfig, mesh: Mesh,
):
    fn = jax.shard_map(
        lambda didx, r1, l1, r2, l2, nv: _pe_shard(didx, st, r1, l1, r2, l2, nv[0], cfg),
        mesh=mesh,
        in_specs=(P(), P("data"), P("data"), P("data"), P("data"), P("data")),
        out_specs=(P("data"), P("data"), P("data"), P()),
        check_vma=False,
    )
    return fn(didx, reads1, lens1, reads2, lens2, n_valid_local)


def split_valid(n_valid_total: int, n_dev: int, per_shard: int) -> np.ndarray:
    """Valid-row counts per shard when a host batch is split contiguously."""
    out = np.zeros(n_dev, dtype=np.int32)
    rem = n_valid_total
    for i in range(n_dev):
        out[i] = min(per_shard, max(rem, 0))
        rem -= out[i]
    return out
