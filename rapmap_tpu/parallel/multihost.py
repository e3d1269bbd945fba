"""Multi-process distribution: per-process read shards, psum'd global
counters, per-process SAM shards (SURVEY.md §5.8).

The reference scales with threads in one process
(upstream:include/FastxParser.hpp producer/consumer pools); the TPU-native
analog is one process per host, each driving its local chip(s):

  * work split: batch i belongs to process (i % world) — no coordination,
    deterministic, and resume-safe per process;
  * output: each process writes a complete, independently-valid SAM shard
    (<out>.<rank>); record-level union equals the single-process run;
  * counters: summed across processes with one psum over the global device
    mesh (Gloo on CPU, ICI/DCN collectives on real TPU pods), so every
    process logs the GLOBAL mapping rate.

jax.distributed.initialize must run before any device use; the CLI calls
init_distributed() right after arg parsing.
"""

from __future__ import annotations

import logging

import numpy as np

log = logging.getLogger("tqm.dist")

_COUNTER_DTYPE = np.int64


def init_distributed(coordinator: str, num_processes: int, process_id: int) -> None:
    import os

    import jax

    # shutdown/init barrier timeouts are env-tunable: under heavy host load a
    # straggler rank can exceed the 300 s default shutdown barrier (observed
    # once beside a genome-scale sweep, r4) — the default here doubles it,
    # and a loaded CI can raise it further without code changes
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        initialization_timeout=int(os.environ.get("TQM_DIST_INIT_TIMEOUT_S", "300")),
        shutdown_timeout_seconds=int(
            os.environ.get("TQM_DIST_SHUTDOWN_TIMEOUT_S", "600")
        ),
    )
    log.info(
        "distributed init: process %d/%d, %d local / %d global devices",
        process_id, num_processes, jax.local_device_count(), jax.device_count(),
    )


def global_counter_sum(totals: dict[str, int | float]) -> dict[str, int | float]:
    """Sum integer counters across all processes (float fields take the max —
    wall time reports the straggler). Synchronizes all processes."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    keys = sorted(totals)
    ints = [k for k in keys if isinstance(totals[k], (int, np.integer))]
    floats = [k for k in keys if k not in ints]
    vec = np.array([totals[k] for k in ints] + [totals[k] for k in floats],
                   dtype=np.float64)
    n_int = len(ints)

    devs = jax.devices()
    mesh = Mesh(np.asarray(devs), ("d",))
    nloc = jax.local_device_count()
    # each process contributes its vector on its first local device, zeros on
    # the rest; psum over "d" then yields the cross-process sum exactly once
    local = np.zeros((nloc, len(vec), 2), dtype=np.float64)
    local[0, :, 0] = vec
    local[:, :, 1] = vec  # max lane: replicating is fine for max
    arr = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("d")), local
    )

    def red(x):
        return jnp.stack(
            [jax.lax.psum(x[:, :, 0], "d").sum(axis=0),
             jax.lax.pmax(x[:, :, 1], "d").max(axis=0)],
            axis=-1,
        )

    fn = jax.jit(
        jax.shard_map(red, mesh=mesh, in_specs=P("d"), out_specs=P())
    )
    out = np.asarray(fn(arr))
    merged: dict[str, int | float] = {}
    for i, k in enumerate(ints):
        merged[k] = int(out[i, 0])
    for j, k in enumerate(floats):
        merged[k] = float(out[n_int + j, 1])
    return merged
