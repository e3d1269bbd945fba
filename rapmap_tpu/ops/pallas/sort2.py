"""Bitonic sorters for the collate voting sort's packed 2-word keys.

The collate stage (ops/collate.py, HitManager role — upstream:src/HitManager.cpp)
sorts the global expansion pool once by a 64-bit key packed into two uint32
words. XLA's `lax.sort` is a generic variadic comparator sort; these are
specialized fixed-shape bitonic networks for the (hi, lo) pair:

* `bitonic_sort_pairs`   — pure JAX/XLA: 136 compare-exchange steps on HBM
  round trips, each a fused elementwise kernel.
* `bitonic_sort_pairs_pallas` — ONE Pallas kernel holding both words VMEM-
  resident (N=65536 -> 512 KB) for the whole network: lane-level strides
  (j < 128) exchange via pltpu.roll, row-level strides via sublane reshapes.

Both sort ascending by the 64-bit value (hi, lo) and are exact drop-ins for
`lax.sort([hi, lo], num_keys=2)` when N is a power of two. Measured A/B lives
in scripts/microbench_sort.py; adoption is gated on that measurement
(SURVEY.md §7.1 planned Pallas for the irregular hot paths — this is the
experiment resolving that plan).

MEASURED VERDICT (2026-08-17, v5e via axon — see BASELINE.md): lax.sort wins.
At N=65536: lax.sort 1.60 ms, jax bitonic 8.25 ms; the Pallas kernel OOM-kills
the axon remote-compile helper (136-step unrolled Mosaic program). The
cfg.bitonic_sort flag therefore stays off by default; this module is kept as
the documented experiment + its parity/unit tests.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def _cmp_exchange(hi_a, lo_a, hi_b, lo_b):
    """Return ((min), (max)) of two (hi, lo) u32 pairs by 64-bit value."""
    a_le = (hi_a < hi_b) | ((hi_a == hi_b) & (lo_a <= lo_b))
    min_hi = jnp.where(a_le, hi_a, hi_b)
    min_lo = jnp.where(a_le, lo_a, lo_b)
    max_hi = jnp.where(a_le, hi_b, hi_a)
    max_lo = jnp.where(a_le, lo_b, lo_a)
    return (min_hi, min_lo), (max_hi, max_lo)


def bitonic_sort_pairs(hi: jnp.ndarray, lo: jnp.ndarray):
    """Pure-JAX bitonic sort of (hi, lo) uint32 pairs, ascending by the 64-bit
    concatenation. N must be a power of two. ~log2(N)*(log2(N)+1)/2 fused
    elementwise steps; no gathers, no generic comparator machinery."""
    N = hi.shape[0]
    assert N & (N - 1) == 0, "bitonic sort needs a power-of-two length"
    logn = N.bit_length() - 1

    def step(hi, lo, k, j):
        # partner(i) = i ^ j via reshape (N/2j, 2, j); direction from the
        # k-block parity of the low-half element's global index
        m = N // (2 * j)
        h3 = hi.reshape(m, 2, j)
        l3 = lo.reshape(m, 2, j)
        base = np.arange(m, dtype=np.uint32) * np.uint32(2 * j)
        asc = ((base & np.uint32(k)) == 0)[:, None]  # (m, 1)
        (mn_h, mn_l), (mx_h, mx_l) = _cmp_exchange(
            h3[:, 0, :], l3[:, 0, :], h3[:, 1, :], l3[:, 1, :]
        )
        new_lo_h = jnp.where(asc, mn_h, mx_h)
        new_lo_l = jnp.where(asc, mn_l, mx_l)
        new_hi_h = jnp.where(asc, mx_h, mn_h)
        new_hi_l = jnp.where(asc, mx_l, mn_l)
        hi2 = jnp.stack([new_lo_h, new_hi_h], axis=1).reshape(N)
        lo2 = jnp.stack([new_lo_l, new_hi_l], axis=1).reshape(N)
        return hi2, lo2

    for kk in range(1, logn + 1):
        k = 1 << kk
        j = k >> 1
        while j >= 1:
            hi, lo = step(hi, lo, k, j)
            j >>= 1
    return hi, lo


# ---- Pallas kernel ----------------------------------------------------------

LANES = 128


def _kernel(hi_ref, lo_ref, out_hi_ref, out_lo_ref):
    from jax.experimental.pallas import tpu as pltpu

    R, C = hi_ref.shape  # (N/128, 128)
    N = R * C
    logn = N.bit_length() - 1
    hi = hi_ref[:]
    lo = lo_ref[:]

    lane = jax.lax.broadcasted_iota(jnp.uint32, (R, C), 1)
    rowi = jax.lax.broadcasted_iota(jnp.uint32, (R, C), 0)
    gidx = rowi * np.uint32(C) + lane  # global element index

    def lane_step(hi, lo, k, j):
        # partner = i ^ j, j < C: both halves via circular lane rolls
        # (2j divides C, so rolls never cross a 2j block boundary wrongly)
        up_h = pltpu.roll(hi, C - j, 1)   # x[i + j] (roll needs shift >= 0)
        up_l = pltpu.roll(lo, C - j, 1)
        dn_h = pltpu.roll(hi, j, 1)       # x[i - j]
        dn_l = pltpu.roll(lo, j, 1)
        has_bit = (lane & np.uint32(j)) != 0
        p_h = jnp.where(has_bit, dn_h, up_h)
        p_l = jnp.where(has_bit, dn_l, up_l)
        asc = (gidx & np.uint32(k)) == 0
        # slot i keeps the min iff it is the low partner of an ascending
        # block or the high partner of a descending one: want_min = bit ^ asc
        want_min = has_bit ^ asc
        self_le = (hi < p_h) | ((hi == p_h) & (lo <= p_l))
        keep_self = self_le == want_min
        return (
            jnp.where(keep_self, hi, p_h),
            jnp.where(keep_self, lo, p_l),
        )

    def row_step(hi, lo, k, j):
        # partner row = r ^ (j / C): sublane-axis reshape exchange
        jr = j // C
        m = R // (2 * jr)
        h4 = hi.reshape(m, 2, jr, C)
        l4 = lo.reshape(m, 2, jr, C)
        base = jax.lax.broadcasted_iota(jnp.uint32, (m, 1, 1), 0) * np.uint32(2 * j)
        asc = (base & np.uint32(k)) == 0
        (mn_h, mn_l), (mx_h, mx_l) = _cmp_exchange(
            h4[:, 0], l4[:, 0], h4[:, 1], l4[:, 1]
        )
        lo_h = jnp.where(asc, mn_h, mx_h)
        lo_l = jnp.where(asc, mn_l, mx_l)
        hi_h = jnp.where(asc, mx_h, mn_h)
        hi_l = jnp.where(asc, mx_l, mn_l)
        hi2 = jnp.stack([lo_h, hi_h], axis=1).reshape(R, C)
        lo2 = jnp.stack([lo_l, hi_l], axis=1).reshape(R, C)
        return hi2, lo2

    for kk in range(1, logn + 1):
        k = 1 << kk
        j = k >> 1
        while j >= 1:
            if j >= C:
                hi, lo = row_step(hi, lo, k, j)
            else:
                hi, lo = lane_step(hi, lo, k, j)
            j >>= 1

    out_hi_ref[:] = hi
    out_lo_ref[:] = lo


def bitonic_sort_pairs_pallas(hi: jnp.ndarray, lo: jnp.ndarray, interpret=False):
    """VMEM-resident bitonic sort: the whole network runs inside one Pallas
    kernel with zero HBM round trips between steps. N must be a power of two
    and a multiple of 128; VMEM needs 4 * N * 4 bytes (in+out both words)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = hi.shape[0]
    assert N % LANES == 0 and N & (N - 1) == 0
    R = N // LANES
    h2 = hi.reshape(R, LANES)
    l2 = lo.reshape(R, LANES)
    out_hi, out_lo = pl.pallas_call(
        _kernel,
        out_shape=(
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
            jax.ShapeDtypeStruct((R, LANES), jnp.uint32),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(h2, l2)
    return out_hi.reshape(N), out_lo.reshape(N)
