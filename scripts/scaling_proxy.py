"""Virtual-mesh scaling rehearsal (VERDICT r3 item 8; BASELINE.json
">= 80% scaling efficiency at N >= 2 hosts" target rehearsal).

Round-3's weak-scaling wall-time proxy reported 89-140% "efficiency" — >100%
means the methodology measured host-CPU utilization headroom, not scaling,
and a gate that can't fail gates nothing. Real multi-chip hardware is still
unavailable (one chip), so this version measures the three things that ARE
falsifiable on an 8-device virtual CPU mesh, each with an asserted bound:

  1. PER-DEVICE COMPILED-COST INVARIANCE (the real weak-scaling invariant):
     XLA cost analysis of the per-device SPMD program at n = 1/2/4/8. If
     per-device flops or bytes grow with the mesh, work is being replicated
     and real hardware would scale badly. Asserted: cost(n)/cost(1) <= 1.02.
     Reported as `invariance_eff` = cost(1)/cost(n) — <= ~100% by
     construction, < 98% fails.
  2. COLLECTIVE COST (psum ablation A/B): the DP step's ONLY collective is
     the 6-scalar counters psum. Per-step wall time with vs without it,
     mean +/- stdev over REP reps; asserted: the psum adds < 5% or less
     than 2 sigma (the virtual mesh's collectives are memcpys; on hardware
     the same scalars ride one ICI round).
  3. COLLECTIVE FOOTPRINT: the compiled HLO is grepped for collective ops;
     any operand past scalar-counter size fails.

Wall times per mesh size are still printed (mean +/- stdev) as context, but
carry no pass/fail weight on shared host cores.

HARDWARE PASS THRESHOLD (for the day N >= 2 hosts exist): run bench.py's
uniform-SE regime per host count; PASS iff
    reads_per_s(N) / reads_per_s(N/2) >= 1.6   (>= 80% incremental efficiency)
at matched per-host batch/chunk config, median-of-5 each, canary-healthy day.

Run with: JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8
"""

import os
import re
import statistics
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
    from jax.sharding import PartitionSpec as P

    from rapmap_tpu.config import MapConfig
    from rapmap_tpu.index.builder import build_quasi_index
    from rapmap_tpu.models.quasi import QuasiMapper, map_batch_se
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

    def nopsum_step(mesh):
        """Same per-device program, counters local (no collective at all);
        scalar counters ride as (1,) rows so they concatenate over the mesh."""

        def body(didx, reads, lens, nv):
            out, ctr = map_batch_se(didx, st, reads, lens, nv[0], cfg)
            return out, jax.tree.map(lambda x: x[None], ctr)

        return jax.jit(
            jax.shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P("data"), P("data"), P("data")),
                out_specs=(P("data"), P("data")),
                check_vma=False,
            )
        )

    REP = 12

    def timed(fn, *args):
        out = fn(*args)
        jax.block_until_ready(out)  # compile + warm
        ts = []
        for _ in range(REP):
            t0 = time.time()
            out = fn(*args)
            jax.block_until_ready(out)
            ts.append(time.time() - t0)
        return statistics.mean(ts), statistics.stdev(ts)

    # ---- 1. per-device compiled-cost invariance -----------------------------
    costs = {}
    walls = {}
    psum_delta = {}
    for n in (1, 2, 4, 8):
        mesh = dp.make_mesh(n)
        B = PER_DEV * n
        c = jnp.asarray(codes[:B])
        ln = jnp.asarray(lens[:B])
        nv = jnp.full((n,), PER_DEV, jnp.int32)

        lowered = jax.jit(
            dp.map_batch_se_dp, static_argnames=("st", "cfg", "mesh")
        ).lower(didx, st, c, ln, nv, cfg, mesh)
        compiled = lowered.compile()
        ca = compiled.cost_analysis() or {}
        costs[n] = (float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0)))

        m_with, s_with = timed(
            lambda c=c, ln=ln, nv=nv, mesh=mesh: dp.map_batch_se_dp(
                didx, st, c, ln, nv, cfg, mesh
            )
        )
        walls[n] = (m_with, s_with)
        step_np = nopsum_step(mesh)
        m_wo, s_wo = timed(lambda c=c, ln=ln, nv=nv: step_np(didx, c, ln, nv))
        psum_delta[n] = (m_with - m_wo, (s_with**2 + s_wo**2) ** 0.5)
        print(
            f"n_data={n}: step {m_with*1e3:7.1f} +/- {s_with*1e3:5.1f} ms | "
            f"no-psum {m_wo*1e3:7.1f} +/- {s_wo*1e3:5.1f} ms | "
            f"per-dev flops {costs[n][0]:.3e} bytes {costs[n][1]:.3e}"
        )

    f1, b1 = costs[1]
    ok = True
    for n in (2, 4, 8):
        fn_, bn = costs[n]
        if f1 > 0:
            ratio_f = fn_ / f1
            eff = 100.0 * f1 / max(fn_, 1e-9)
            print(f"# n={n}: per-device flops ratio {ratio_f:.4f} "
                  f"(invariance_eff {eff:.1f}%)")
            assert ratio_f <= 1.02, (
                f"per-device compiled flops grew {ratio_f:.3f}x at n={n}: "
                "work is replicating across the mesh"
            )
        if b1 > 0:
            ratio_b = bn / b1
            assert ratio_b <= 1.05, (
                f"per-device bytes grew {ratio_b:.3f}x at n={n}"
            )
    if f1 == 0:
        print("# cost_analysis unavailable on this backend; invariance check skipped")
        ok = False

    # ---- 2. psum ablation bound ---------------------------------------------
    for n in (2, 4, 8):
        d, sd = psum_delta[n]
        m, _ = walls[n]
        rel = d / m
        print(f"# n={n}: counters-psum cost {d*1e3:+.2f} +/- {2*sd*1e3:.2f} ms "
              f"({100*rel:+.1f}% of step)")
        assert rel < 0.05 or d < 2 * sd, (
            f"counters psum costs {100*rel:.1f}% of the step at n={n} "
            f"(delta {d*1e3:.2f} ms > 2 sigma {2*sd*1e3:.2f} ms)"
        )

    # ---- 3. collective footprint of the compiled step at n=8 ----------------
    mesh = dp.make_mesh(8)
    lowered = jax.jit(
        dp.map_batch_se_dp, static_argnames=("st", "cfg", "mesh")
    ).lower(didx, st, jnp.asarray(codes), jnp.asarray(lens),
            jnp.full((8,), PER_DEV, jnp.int32), cfg, mesh)
    hlo = lowered.compile().as_text()
    colls = [ln.strip() for ln in hlo.splitlines()
             if re.search(r"(all-reduce|all-gather|collective-permute|all-to-all)\(", ln)]
    print(f"# collectives in compiled step: {len(colls)}")
    for ln in colls[:12]:
        m = re.search(r"\b([a-z0-9-]+)\(", ln)
        shape = re.search(r"(s32|u32|f32|pred)\[[0-9,]*\]", ln)
        print(f"#   {m.group(1) if m else '?'} {shape.group(0) if shape else ''}")
    big = [ln for ln in colls if re.search(r"\[[0-9]{4,}", ln)]
    assert not big, f"large collective operands found: {big[:2]}"
    print("# PASS: per-device cost invariant, psum within bound, only "
          "scalar-counter collectives cross the mesh"
          + ("" if ok else " (cost invariance skipped)"))
    print("# hardware gate (N>=2 hosts): reads/s(N) / reads/s(N/2) >= 1.6 "
          "at matched per-host config, median-of-5, canary-healthy day")


if __name__ == "__main__":
    main()
