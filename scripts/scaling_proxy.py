"""Virtual-mesh scaling-efficiency proxy (VERDICT r2 item 3; BASELINE.json
">= 80% scaling efficiency at N >= 2 hosts" target rehearsal).

Real multi-chip hardware is unavailable here (one chip), so this measures
the two things that determine scaling on a real pod, on an 8-device virtual
CPU mesh:

  1. WEAK-SCALING WORK INVARIANCE: per-device read shard fixed, mesh grown
     1 -> 8. All virtual devices share the same host CPUs, so ideal scaling
     shows as wall time growing ~linearly with n (total work ~ n x const,
     constant-width machine); the proxy efficiency is t(1) * n / t(n) — a
     sub-linear t(n) means per-device work is NOT constant (hidden
     replication or collective blowup) and real hardware would scale badly.
  2. COLLECTIVE FOOTPRINT: the only cross-device traffic in the DP design
     is the counters psum — 6 int32 scalars per batch, independent of B.
     Anything else appearing in the compiled HLO is a red flag. The compiled
     module is grepped for collective ops and their operand shapes.

Run with: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
)

import numpy as np  # noqa: E402


def main():
    import jax

    # the axon sitecustomize pins JAX_PLATFORMS; config.update before
    # backend init reliably selects CPU (same trick as tests/conftest.py)
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.index.builder import build_quasi_index
    from rapmap_tpu.models.quasi import QuasiMapper
    from rapmap_tpu.parallel import dp
    from tests.util import random_transcriptome, sample_reads, write_fasta

    assert len(jax.devices()) >= 8, "need 8 virtual devices (see module docstring)"
    rng = np.random.default_rng(71)
    txps = random_transcriptome(rng, n_txps=40, min_len=500, max_len=2000)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        fa = write_fasta(os.path.join(td, "t.fa"), txps)
        idx = build_quasi_index(fa, k=21)
    L = 60
    PER_DEV = 512
    reads = sample_reads(rng, txps, PER_DEV * 8, read_len=L, error_rate=0.01)
    codes = np.zeros((PER_DEV * 8, L), np.int8)
    lut = np.zeros(256, np.int8)
    lut[ord("A")], lut[ord("C")], lut[ord("G")], lut[ord("T")], lut[ord("N")] = 1, 2, 3, 4, 5
    for i, r in enumerate(reads):
        codes[i] = lut[np.frombuffer(r[1], np.uint8)]
    lens = np.full(PER_DEV * 8, L, np.int32)

    cfg = MapConfig(k=idx.k, max_hits_per_strand=8, expand_budget=16, max_out=16)
    mapper = QuasiMapper(idx, cfg)
    didx, st = mapper.didx, mapper.st

    rows = []
    t1 = None
    for n in (1, 2, 4, 8):
        mesh = dp.make_mesh(n)
        B = PER_DEV * n
        c = jnp.asarray(codes[:B])
        ln = jnp.asarray(lens[:B])
        nv = jnp.full((n,), PER_DEV, jnp.int32)
        out, ctr = dp.map_batch_se_dp(didx, st, c, ln, nv, cfg, mesh)
        jax.block_until_ready(out)
        t0 = time.time()
        REP = 4
        for _ in range(REP):
            out, ctr = dp.map_batch_se_dp(didx, st, c, ln, nv, cfg, mesh)
            jax.block_until_ready(out)
        dt = (time.time() - t0) / REP
        if n == 1:
            t1 = dt
        eff = t1 * n / dt
        rows.append((n, dt, eff, int(ctr.reads_mapped)))
        print(f"n_data={n}: {dt*1e3:7.1f} ms/step  weak-scaling proxy eff "
              f"{100*eff:5.1f}%  mapped={int(ctr.reads_mapped)}")

    # collective footprint of the compiled step at n=8
    mesh = dp.make_mesh(8)
    lowered = jax.jit(
        dp.map_batch_se_dp, static_argnames=("st", "cfg", "mesh")
    ).lower(didx, st, jnp.asarray(codes), jnp.asarray(lens),
            jnp.full((8,), PER_DEV, jnp.int32), cfg, mesh)
    hlo = lowered.compile().as_text()
    colls = [ln.strip() for ln in hlo.splitlines()
             if re.search(r"all-reduce|all-gather|collective-permute|all-to-all", ln)
             and "f32[" not in ln or re.search(r"all-reduce", ln) and "s32" in ln]
    colls = [ln.strip() for ln in hlo.splitlines()
             if re.search(r"(all-reduce|all-gather|collective-permute|all-to-all)\(", ln)]
    print(f"# collectives in compiled step: {len(colls)}")
    for ln in colls[:12]:
        m = re.search(r"\b([a-z0-9-]+)\(", ln)
        shape = re.search(r"(s32|u32|f32|pred)\[[0-9,]*\]", ln)
        print(f"#   {m.group(1) if m else '?'} {shape.group(0) if shape else ''}")
    big = [ln for ln in colls if re.search(r"\[[0-9]{4,}", ln)]
    assert not big, f"large collective operands found: {big[:2]}"
    print("# PASS: only scalar-counter collectives cross the mesh")


if __name__ == "__main__":
    main()
