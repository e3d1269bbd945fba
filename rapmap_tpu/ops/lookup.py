"""Vectorized k-mer -> SA-interval lookup (sparsepp/BooPHF replacement).

Two device probe strategies over the same sorted k-mer table:

* CHD perfect hash (the reference's BooPHF role, upstream:include/BooPHF.hpp):
  displacement-directory gather + table-row gather — 2 gathers flat per key,
  independent of table shape. Used whenever the index carries a CHD section.
* Binary search narrowed to a prefix-LUT bucket: 1 + steps row-gathers per
  key (steps tracks the worst LUT bucket). Fallback when no CHD was built.

Gather economics on this chip are per-index (row width <= 16 B free), so both
paths pack (hi, lo, b, e) into one 4-column row per probe.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic
from rapmap_tpu.ops.gather import flat_gather, row_gather_nd


def _prefix_of(hi: jnp.ndarray, lo: jnp.ndarray, k: int, p: int) -> jnp.ndarray:
    """First-p-bases value from the (hi, lo) split key; static shift tree."""
    shift = 2 * k - 2 * p
    if shift == 0:
        pref = lo
    elif shift >= 32:
        pref = hi >> np.uint32(shift - 32)
    else:
        pref = (hi << np.uint32(32 - shift)) | (lo >> np.uint32(shift))
    return pref.astype(jnp.int32)


def _as_u32(x: jnp.ndarray) -> jnp.ndarray:
    return lax.bitcast_convert_type(x, jnp.uint32)


def _mix32(x: jnp.ndarray) -> jnp.ndarray:
    """murmur3 fmix32; must match native/chd.cpp and index/chd.py exactly."""
    x = x ^ (x >> np.uint32(16))
    x = x * np.uint32(0x85EBCA6B)
    x = x ^ (x >> np.uint32(13))
    x = x * np.uint32(0xC2B2AE35)
    x = x ^ (x >> np.uint32(16))
    return x


def chd_slot(st, g: jnp.ndarray, hb: jnp.ndarray, d: jnp.ndarray) -> jnp.ndarray:
    """Displacement -> table slot; must match native/chd.cpp exactly.

    Partitioned tables (st.chd_p_bits > 0) prefix the slot with the bucket's
    partition stripe — the build then threads its displacement search over
    independent stripes. p_bits == 0 is the legacy single-stripe formula."""
    s = _mix32(hb + d)
    pb = getattr(st, "chd_p_bits", 0)
    if pb:
        stb = st.chd_t_bits - pb
        stripe = (_as_u32(g) >> np.uint32(st.chd_m_bits - pb)) << np.uint32(stb)
        return (stripe | (s & np.uint32((1 << stb) - 1))).astype(jnp.int32)
    return (s & np.uint32((1 << st.chd_t_bits) - 1)).astype(jnp.int32)


def _chd_lookup(
    didx: DeviceQuasiIndex, st: EngineStatic, key_hi: jnp.ndarray, key_lo: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """2-gather perfect-hash probe. Alien keys land on an arbitrary (or
    sentinel) slot and simply fail the key compare."""
    sa_ = np.uint32((st.chd_seed * 0x9E3779B9 + 1) & 0xFFFFFFFF)
    sb_ = np.uint32((st.chd_seed * 0x85EBCA6B + 2) & 0xFFFFFFFF)
    g = (_mix32(key_hi ^ _mix32(key_lo ^ sa_)) & np.uint32((1 << st.chd_m_bits) - 1)).astype(jnp.int32)
    hb = _mix32(key_hi ^ _mix32(key_lo ^ sb_))
    d = _as_u32(flat_gather(didx.chd_dir, g))
    slot = chd_slot(st, g, hb, d)
    row = row_gather_nd(didx.chd_rows, slot)
    # The empty-slot sentinel key (-1, -1) equals the poly-T k-mer when k == 32;
    # requiring a non-empty interval (sentinel rows carry b == e == 0) keeps an
    # absent T^32 probe from false-hitting (and, sharded, from psum-shifting the
    # global interval by a slot base).
    found = (
        (_as_u32(row[..., 0]) == key_hi)
        & (_as_u32(row[..., 1]) == key_lo)
        # width form, not e > b: big-occ pseudo tables carry uint32 bit
        # patterns in int32, where a signed compare misorders across 2^31
        & (row[..., 3] - row[..., 2] > 0)
    )
    b = jnp.where(found, row[..., 2], 0)
    e = jnp.where(found, row[..., 3], 0)
    return found, b, e


def _chd_probe_canonical(
    didx: DeviceQuasiIndex, st: EngineStatic, can_hi: jnp.ndarray, can_lo: jnp.ndarray
) -> jnp.ndarray:
    """Canonical-key probe -> the 6-column class row (unverified)."""
    sa_ = np.uint32((st.chd_seed * 0x9E3779B9 + 1) & 0xFFFFFFFF)
    sb_ = np.uint32((st.chd_seed * 0x85EBCA6B + 2) & 0xFFFFFFFF)
    g = (_mix32(can_hi ^ _mix32(can_lo ^ sa_)) & np.uint32((1 << st.chd_m_bits) - 1)).astype(jnp.int32)
    hb = _mix32(can_hi ^ _mix32(can_lo ^ sb_))
    d = _as_u32(flat_gather(didx.chd_dir, g))
    slot = chd_slot(st, g, hb, d)
    return row_gather_nd(didx.chd_rows, slot)


def kmer_lookup_2str(
    didx: DeviceQuasiIndex, st: EngineStatic, key_hi: jnp.ndarray, key_lo: jnp.ndarray
):
    """One canonical probe -> BOTH strands of each window.

    key arrays are the FORWARD window keys; returns
    (found_f, b_f, e_f, found_r, b_r, e_r) where the *_r triple describes the
    reverse-complement k-mer of the same window. Requires st.chd_canonical.
    Halves lookup gathers vs probing each strand separately — the single
    hottest saving in the engine (lookup was 67% of device time)."""
    from rapmap_tpu.ops.encode import rc_keys_batch

    rhi, rlo = rc_keys_batch(key_hi, key_lo, st.k)
    is_can = (key_hi < rhi) | ((key_hi == rhi) & (key_lo <= rlo))
    can_hi = jnp.where(is_can, key_hi, rhi)
    can_lo = jnp.where(is_can, key_lo, rlo)
    row = _chd_probe_canonical(didx, st, can_hi, can_lo)
    hit = (_as_u32(row[..., 0]) == can_hi) & (_as_u32(row[..., 1]) == can_lo)
    # row cols 2,3 = canonical orientation's interval; 4,5 = its rc
    b_can, e_can = row[..., 2], row[..., 3]
    b_alt, e_alt = row[..., 4], row[..., 5]
    b_f = jnp.where(is_can, b_can, b_alt)
    e_f = jnp.where(is_can, e_can, e_alt)
    b_r = jnp.where(is_can, b_alt, b_can)
    e_r = jnp.where(is_can, e_alt, e_can)
    # width form (wrap-safe for big-occ uint32-in-int32 slot ids)
    found_f = hit & (e_f - b_f > 0)
    found_r = hit & (e_r - b_r > 0)
    z = b_f * 0
    return (
        found_f, jnp.where(found_f, b_f, z), jnp.where(found_f, e_f, z),
        found_r, jnp.where(found_r, b_r, z), jnp.where(found_r, e_r, z),
    )


def kmer_lookup(
    didx: DeviceQuasiIndex, st: EngineStatic, key_hi: jnp.ndarray, key_lo: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Any-shaped uint32 key arrays -> (found, b, e) int32/bool of same shape."""
    if (
        getattr(st, "use_chd", False)
        and getattr(didx, "chd_dir", None) is not None
        and getattr(st, "chd_canonical", False)
    ):
        f, b, e, _, _, _ = kmer_lookup_2str(didx, st, key_hi, key_lo)
        return f, b, e
    if getattr(st, "use_chd", False) and getattr(didx, "chd_dir", None) is not None:
        return _chd_lookup(didx, st, key_hi, key_lo)
    K = didx.kmer_rows.shape[0]
    Kc = max(K - 1, 0)
    pref = _prefix_of(key_hi, key_lo, st.k, st.prefix_bases)
    bounds = row_gather_nd(didx.lut_rows, pref)  # (..., 2)
    lo_i = bounds[..., 0]
    hi_i = bounds[..., 1]

    def step(_, iv):
        lo, hi = iv
        mid = (lo + hi) >> 1
        row = row_gather_nd(didx.kmer_rows, jnp.clip(mid, 0, Kc))
        vh = _as_u32(row[..., 0])
        vl = _as_u32(row[..., 1])
        less = (vh < key_hi) | ((vh == key_hi) & (vl < key_lo))
        cont = lo < hi
        lo2 = jnp.where(less, mid + 1, lo)
        hi2 = jnp.where(less, hi, mid)
        return (jnp.where(cont, lo2, lo), jnp.where(cont, hi2, hi))

    lo_f, _ = lax.fori_loop(0, st.lookup_steps, step, (lo_i, hi_i))
    row = row_gather_nd(didx.kmer_rows, jnp.clip(lo_f, 0, Kc))
    found = (
        (lo_f < hi_i)
        & (_as_u32(row[..., 0]) == key_hi)
        & (_as_u32(row[..., 1]) == key_lo)
    )
    b = jnp.where(found, row[..., 2], 0)
    e = jnp.where(found, row[..., 3], 0)
    return found, b, e
