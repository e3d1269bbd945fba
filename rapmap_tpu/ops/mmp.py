"""MMP search with NIP skipping — the compute core (SACollector rebuild).

Design (SURVEY.md §7.1 kernel 2-3): the serial per-read scan is kept (it is
work-optimal) but run in lockstep across all lanes of the batch as one batched
`lax.while_loop`; every binary-search step becomes a batched HBM gather, which
is the TPU-friendly shape of this pointer-chasing workload. All shapes static.

A lane is one (read, strand) row. State per lane: scan position, hit count,
and a fixed-capacity hit buffer (q, len, b, e).
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax.numpy as jnp
from jax import lax

from rapmap_tpu.config import MapConfig
from rapmap_tpu.ops.device_index import DeviceQuasiIndex, EngineStatic
from rapmap_tpu.ops.lookup import kmer_lookup
from rapmap_tpu.ops import encode as denc


class ScanHits(NamedTuple):
    q: jnp.ndarray      # (R, H) int32 query positions
    l: jnp.ndarray      # (R, H) int32 MMP lengths
    b: jnp.ndarray      # (R, H) int32 interval begins
    e: jnp.ndarray      # (R, H) int32 interval ends
    n: jnp.ndarray      # (R,)  int32 hit counts
    truncated: jnp.ndarray  # (R,) bool — hit buffer overflowed (over_budget)


def _col_lower_bound(
    didx: DeviceQuasiIndex, b, e, d, c, steps: int
):
    """Per-lane lower bound of char c in the depth-d text column over SA[b:e).

    Within [b,e) all suffixes share their first d chars, so text[SA[p]+d] is
    non-decreasing over p; `steps` must cover log2(max interval width).
    """
    n_sa = didx.sa.shape[0]

    def step(_, iv):
        lo, hi = iv
        mid = (lo + hi) >> 1
        g = didx.sa[jnp.clip(mid, 0, n_sa - 1)]
        v = didx.text[g + d].astype(jnp.int32)
        less = v < c
        cont = lo < hi
        lo2 = jnp.where(less, mid + 1, lo)
        hi2 = jnp.where(less, hi, mid)
        return (jnp.where(cont, lo2, lo), jnp.where(cont, hi2, hi))

    lo_f, _ = lax.fori_loop(0, steps, step, (b, e))
    return lo_f


def _extend(
    didx: DeviceQuasiIndex,
    reads: jnp.ndarray,   # (R, L)
    lens: jnp.ndarray,    # (R,)
    b0, e0, pos, active, k: int, ext_steps: int,
):
    """extendSearchNaive rebuild: per-depth interval narrowing until mismatch.

    Returns (b, e, mlen) per lane; inactive lanes pass through (b0, e0, k).
    """
    R, L = reads.shape

    def cond(s):
        return jnp.any(s[3])

    def body(s):
        b, e, d, alive = s
        ic = pos + d
        c = jnp.take_along_axis(reads, jnp.clip(ic, 0, L - 1)[:, None], axis=1)[:, 0]
        c = c.astype(jnp.int32)
        ok = alive & (ic < lens) & (c >= 1) & (c <= 4)
        lb = _col_lower_bound(didx, b, e, d, c, ext_steps)
        ub = _col_lower_bound(didx, b, e, d, c + 1, ext_steps)
        adv = ok & (lb < ub)
        return (
            jnp.where(adv, lb, b),
            jnp.where(adv, ub, e),
            jnp.where(adv, d + 1, d),
            adv,
        )

    d0 = jnp.full_like(b0, k)
    b, e, d, _ = lax.while_loop(cond, body, (b0, e0, d0, active))
    return b, e, d


def scan_batch(
    didx: DeviceQuasiIndex,
    st: EngineStatic,
    reads: jnp.ndarray,  # (R, L) int8 — rows are (read, strand) lanes
    lens: jnp.ndarray,   # (R,) int32
    cfg: MapConfig,
) -> ScanHits:
    """SEMANTICS.md §3 scan over every lane in lockstep."""
    R, L = reads.shape
    k = st.k
    H = cfg.max_hits_per_strand
    S = L - k + 1
    assert L < st.pad_tail, "read length must stay below the text tail pad"
    ext_steps = max(1, math.ceil(math.log2(cfg.max_interval + 1)) + 1)

    key_hi, key_lo, _ = denc.kmer_keys_batch(reads, k)
    next_bad = denc.next_bad_batch(reads, L)

    def at_pos(arr2d, pos, fill):
        v = jnp.take_along_axis(arr2d, jnp.clip(pos, 0, arr2d.shape[1] - 1)[:, None], axis=1)[:, 0]
        return jnp.where(pos < arr2d.shape[1], v, fill)

    hits0 = ScanHits(
        q=jnp.zeros((R, H), jnp.int32),
        l=jnp.zeros((R, H), jnp.int32),
        b=jnp.zeros((R, H), jnp.int32),
        e=jnp.zeros((R, H), jnp.int32),
        n=jnp.zeros((R,), jnp.int32),
        truncated=jnp.zeros((R,), bool),
    )
    pos0 = jnp.zeros((R,), jnp.int32)

    def running(pos, hits):
        return (pos + k <= lens) & ~hits.truncated

    def cond(state):
        pos, hits = state
        return jnp.any(running(pos, hits))

    def body(state):
        pos, hits = state
        act = running(pos, hits)
        nb = at_pos(next_bad, pos, jnp.int32(L))
        window_ok = nb >= pos + k
        khi = at_pos(key_hi, pos, jnp.uint32(0))
        klo = at_pos(key_lo, pos, jnp.uint32(0))
        found, b0, e0 = kmer_lookup(didx, st, khi, klo)
        found = found & window_ok & act
        wide = found & ((e0 - b0) > cfg.max_interval)
        do_ext = found & ~wide
        b1, e1, mlen = _extend(didx, reads, lens, b0, e0, pos, do_ext, k, ext_steps)

        # record hit
        slot = jnp.clip(hits.n, 0, H - 1)
        overflow = do_ext & (hits.n >= H)
        write = do_ext & ~overflow
        rows = jnp.arange(R, dtype=jnp.int32)

        def put(buf, val):
            old = buf[rows, slot]
            return buf.at[rows, slot].set(jnp.where(write, val, old))

        hits = ScanHits(
            q=put(hits.q, pos),
            l=put(hits.l, mlen),
            b=put(hits.b, b1),
            e=put(hits.e, e1),
            n=hits.n + write.astype(jnp.int32),
            truncated=hits.truncated | overflow,
        )
        # NIP skip / advance (SEMANTICS.md §3)
        skip = jnp.maximum(1, mlen - k + 1)
        pos_next = jnp.where(
            ~window_ok,
            nb + 1,
            jnp.where(do_ext, pos + skip, pos + 1),
        )
        pos = jnp.where(act, pos_next, pos)
        return pos, hits

    _, hits = lax.while_loop(cond, body, (pos0, hits0))
    return hits
