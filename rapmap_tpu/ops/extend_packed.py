"""Packed-word MMP extension: binary search on the full read suffix.

Replaces the per-depth-char narrowing of ops.mmp._extend with a fixed-cost
scheme (SURVEY.md §7.3 "gather-bound kernel"):

  1. lower_bound of the remaining read suffix Q in [b, e) comparing 16 bases
     per uint32 word against the 2-bit packed text (big-endian packing makes
     numeric compare == lexicographic compare);
  2. MMP length = k + max(lcp with the two neighbours of the insertion point)
     — sorted order guarantees the max lcp is achieved there;
  3. final interval = equal_range of Q truncated to the MMP length (two more
     word-compare binary searches).

Cost per anchor: 3 binary searches x ceil(log2 max_interval) steps + 2 lcp
compares, each step ~4 HBM gathers — uniform across lanes (no straggler
depths), ~10x fewer serial steps than per-depth narrowing on 76 bp reads.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.ops.device_index import DeviceQuasiIndex
from rapmap_tpu.ops.gather import flat_gather

U32 = np.uint32
FULL = np.uint32(0xFFFFFFFF)


def pack_reads(reads: jnp.ndarray) -> jnp.ndarray:
    """(R, L) int8 codes -> (R, L) uint32: word of 16 bases starting at each
    position (big-endian 2-bit; non-ACGT bases contribute arbitrary bits and
    must be masked out by the caller via its valid-length logic)."""
    R, L = reads.shape
    c = reads.astype(jnp.int32)
    bits = jnp.where((c >= 1) & (c <= 4), (c - 1) & 3, 0).astype(U32)  # (R, L)
    b = jnp.concatenate([bits, np.zeros((R, 16), dtype=np.uint32)], axis=1)
    w = b[:, 0:L] << U32(30)
    for i in range(1, 16):
        w = w | (b[:, i : i + L] << U32(30 - 2 * i))
    return w


def _text_window(didx: DeviceQuasiIndex, gp: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """16-base packed text window starting at global position gp, plus the
    in-window offset (chars) of the first sentinel (16 if none)."""
    nw = didx.text2b.shape[0]
    wi = jnp.clip(gp >> 4, 0, nw - 2)
    sh = ((gp & 15) << 1).astype(U32)
    w0 = flat_gather(didx.text2b, wi)
    w1 = flat_gather(didx.text2b, wi + 1)
    s0 = flat_gather(didx.sentbits, wi)
    s1 = flat_gather(didx.sentbits, wi + 1)
    lo_shift = U32(32) - sh  # sh in [0,30]; guard sh==0 via where
    tw = jnp.where(sh == 0, w0, (w0 << sh) | (w1 >> lo_shift))
    ts = jnp.where(sh == 0, s0, (s0 << sh) | (s1 >> lo_shift))
    sent_pos = (lax.clz(ts) >> 1).astype(jnp.int32)  # 16 if ts == 0 (clz=32)
    return tw, sent_pos


def _prefix_mask(n: jnp.ndarray) -> jnp.ndarray:
    """Mask selecting the first n (0..16) chars (2n MSBs) of a word."""
    n2 = jnp.clip(n, 0, 16) * 2
    # FULL << (32 - n2), with n2 == 0 -> 0
    return jnp.where(n2 == 0, U32(0), FULL << (U32(32) - n2.astype(U32)))


def suffix_cmp(
    didx: DeviceQuasiIndex,
    qwords: tuple[jnp.ndarray, ...],  # per-lane query words, len W
    qlen: jnp.ndarray,                # (R,) valid query chars (beyond depth k)
    gp: jnp.ndarray,                  # (R,) text position of suffix + k
    W: int,
):
    """Compare text suffix (at gp) against the query suffix, both depth-k based.

    Returns (cmp, lcp): cmp < 0 iff suffix < query, 0 iff equal on the first
    qlen chars (query is a prefix), > 0 iff suffix > query; lcp in chars.
    """
    cmp = qlen * 0
    lcp = qlen * 0
    decided = qlen < 0
    for j in range(W):
        tw, tsent = _text_window(didx, gp + 16 * j)
        qn = jnp.clip(qlen - 16 * j, 0, 16)
        n = jnp.minimum(qn, tsent)
        mask = _prefix_mask(n)
        qv = qwords[j] & mask
        tv = tw & mask
        x = qv ^ tv
        diffpos = (lax.clz(x) >> 1).astype(jnp.int32)  # chars; 16 if equal
        has_diff = diffpos < n
        # outcome for this word when not yet decided:
        word_cmp = jnp.where(
            has_diff,
            jnp.where(tv < qv, -1, 1),
            # no diff within n chars: text sentinel before query end -> suffix
            # shorter -> less; query exhausted (qn <= tsent, qn < 16) -> equal
            jnp.where((tsent < qn), -1, jnp.where(qn < 16, 0, 0)),
        ).astype(jnp.int32)
        word_final = has_diff | (tsent < qn) | (qn < 16)
        word_lcp = jnp.where(has_diff, diffpos, n)
        lcp = jnp.where(decided, lcp, lcp + word_lcp)
        cmp = jnp.where(decided, cmp, jnp.where(word_final, word_cmp, 0))
        decided = decided | word_final
    return cmp, lcp


def _bound(didx, qwords, qlen, b, e, k: int, W: int, steps: int, upper: bool):
    """Lower bound (upper=False: first p with S_p >= Q) or upper bound
    (first p with S_p > Q) over SA[b:e) by word-compare binary search."""

    def step(_, iv):
        lo, hi = iv
        mid = (lo + hi) >> 1
        g = flat_gather(didx.sa, jnp.clip(mid, 0, didx.sa.shape[0] - 1))
        cmp, _ = suffix_cmp(didx, qwords, qlen, g + k, W)
        less = (cmp < 0) | (upper & (cmp == 0))
        cont = lo < hi
        lo2 = jnp.where(less, mid + 1, lo)
        hi2 = jnp.where(less, hi, mid)
        return (jnp.where(cont, lo2, lo), jnp.where(cont, hi2, hi))

    lo_f, _ = lax.fori_loop(0, steps, step, (b, e))
    return lo_f


def extend_packed(
    didx: DeviceQuasiIndex,
    preads: jnp.ndarray,    # (R, L) packed read words (pack_reads)
    next_bad: jnp.ndarray,  # (R, L) from denc.next_bad_batch
    lens: jnp.ndarray,
    b0, e0, pos, active, k: int, ext_steps: int, L: int,
):
    """Drop-in for ops.mmp._extend. Returns (b, e, mlen)."""
    R = pos.shape[0]
    W = max(1, -(-(L - k) // 16))
    base = pos + k
    base_c = jnp.clip(base, 0, L - 1)
    # valid query chars beyond depth k: up to the next N and the read end
    from rapmap_tpu.ops.gather import row_gather

    nb = jnp.where(base < L, row_gather(next_bad, base_c[:, None])[:, 0], base)
    qlen = jnp.clip(jnp.minimum(nb, lens) - base, 0, L - k)
    qwords = tuple(
        jnp.where(
            base + 16 * j < L,
            row_gather(preads, jnp.clip(base + 16 * j, 0, L - 1)[:, None])[:, 0],
            U32(0),
        )
        for j in range(W)
    )

    lb = _bound(didx, qwords, qlen, b0, e0, k, W, ext_steps, upper=False)
    n_sa = didx.sa.shape[0]

    def lcp_at(p, valid):
        g = flat_gather(didx.sa, jnp.clip(p, 0, n_sa - 1))
        _, l = suffix_cmp(didx, qwords, qlen, g + k, W)
        return jnp.where(valid, l, 0)

    l_left = lcp_at(lb - 1, lb - 1 >= b0)
    l_right = lcp_at(lb, lb < e0)
    ext = jnp.minimum(jnp.maximum(l_left, l_right), qlen)
    mlen = k + ext

    # equal_range of Q truncated to ext chars
    lb2 = _bound(didx, qwords, ext, b0, e0, k, W, ext_steps, upper=False)
    ub2 = _bound(didx, qwords, ext, b0, e0, k, W, ext_steps, upper=True)
    ok = active & (ub2 > lb2)
    b = jnp.where(ok, lb2, b0)
    e = jnp.where(ok, ub2, e0)
    mlen = jnp.where(ok, mlen, k)
    return b, e, mlen
