"""Vectorized k-mer -> SA-interval lookup (sparsepp/BooPHF replacement).

Branchless binary search over the sorted (hi, lo) k-mer table, narrowed by a
first-p-bases prefix LUT; every step is a batched HBM gather, so thousands of
lanes probe in lockstep (SURVEY.md §7.1 kernel 1).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic


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


def kmer_lookup(
    didx: DeviceQuasiIndex, st: EngineStatic, key_hi: jnp.ndarray, key_lo: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Any-shaped uint32 key arrays -> (found, b, e) int32/bool of same shape."""
    K = didx.kmer_hi.shape[0]
    pref = _prefix_of(key_hi, key_lo, st.k, st.prefix_bases)
    lo_i = didx.prefix_lut[pref]
    hi_i = didx.prefix_lut[pref + 1]

    def step(_, iv):
        lo, hi = iv
        mid = (lo + hi) >> 1
        m = jnp.clip(mid, 0, max(K - 1, 0))
        vh = didx.kmer_hi[m]
        vl = didx.kmer_lo[m]
        less = (vh < key_hi) | ((vh == key_hi) & (vl < key_lo))
        cont = lo < hi
        lo2 = jnp.where(less, mid + 1, lo)
        hi2 = jnp.where(less, hi, mid)
        return (jnp.where(cont, lo2, lo), jnp.where(cont, hi2, hi))

    lo_f, _ = lax.fori_loop(0, st.lookup_steps, step, (lo_i, hi_i))
    idx = jnp.clip(lo_f, 0, max(K - 1, 0))
    found = (lo_f < hi_i) & (didx.kmer_hi[idx] == key_hi) & (didx.kmer_lo[idx] == key_lo)
    b = jnp.where(found, didx.kmer_b[idx], 0)
    e = jnp.where(found, didx.kmer_e[idx], 0)
    return found, b, e
