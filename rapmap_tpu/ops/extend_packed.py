"""Packed-word MMP extension: binary search on the full read suffix.

Replaces the per-depth-char narrowing of ops.mmp._extend with a fixed-cost
scheme (SURVEY.md §7.3 "gather-bound kernel"):

  1. lower_bound of the remaining read suffix Q in [b, e) comparing 16 bases
     per uint32 word against the 2-bit packed text (big-endian packing makes
     numeric compare == lexicographic compare);
  2. MMP length = k + max(lcp with the two neighbours of the insertion point)
     — sorted order guarantees the max lcp is achieved there;
  3. final interval = equal_range of Q truncated to the MMP length.

Op-count engineering (this runtime charges a high fixed cost per device op):
  - the two equal_range searches and the two lcp probes each run as ONE
    stacked (2R,) lane computation instead of two (R,) ones;
  - suffix end-of-transcript limits ride in the sa_ext row itself (tleft
    column) instead of sentinel-mask gathers per word, so a W-word compare
    costs ~W/4+1 row-gathers total — and the row stores (word, sub, tleft)
    so no global text position ever exists on device (bigSA-safe).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax import lax

from rapmap_tpu.ops.device_index import DeviceQuasiIndex
from rapmap_tpu.ops.gather import flat_gather, row_gather

U32 = np.uint32
FULL = np.uint32(0xFFFFFFFF)

# minimum lane-stack width for the staged (compact-the-unconverged) bound
# search; below this the bookkeeping costs more than the tail trips save.
# Tests monkeypatch this down to force the staged path on small worlds.
_STAGE_MIN_WIDTH = 1024


def pack_reads(reads: jnp.ndarray) -> jnp.ndarray:
    """(R, L) int8 codes -> (R, L) uint32: word of 16 bases starting at each
    position (big-endian 2-bit; non-ACGT bases contribute arbitrary bits and
    must be masked out by the caller via its valid-length logic).

    Log-step sliding-window combine: v_k[p] packs bases p..p+2^k-1 into the
    TOP 2^(k+1) bits, and v_{k+1}[p] = v_k[p] | v_k[p+2^k] >> 2^(k+1) — four
    doubling passes over (R, L) instead of the naive 16 shifted-column ORs.
    Bit-identical to the 16-OR form (verified across an L sweep incl. L<16
    and non-ACGT codes); end-to-end engine time is unchanged (prep is a
    minor stage — the profile_fine.py "pack" cut that flagged it bundles
    revcomp_batch, which the engine does not use), kept for the 4x fewer
    materialized (R, L) passes."""
    R, L = reads.shape
    c = reads.astype(jnp.int32)
    bits = jnp.where((c >= 1) & (c <= 4), (c - 1) & 3, 0).astype(jnp.uint32)  # (R, L)
    v = jnp.concatenate([bits << U32(30), np.zeros((R, 16), dtype=np.uint32)], axis=1)
    for k in (1, 2, 4, 8):
        shifted = jnp.concatenate(
            [v[:, k:], np.zeros((R, k), dtype=np.uint32)], axis=1
        )
        v = v | (shifted >> U32(2 * k))
    return v[:, :L]


def _text_words(
    didx: DeviceQuasiIndex, wi: jnp.ndarray, sub: jnp.ndarray, W: int
) -> list[jnp.ndarray]:
    """Packed 16-base text windows at word index wi + sub chars, advancing by
    16 chars per output word.

    text2q rows hold words i..i+3, so ceil((W+1)/4) row-gathers cover all
    W+1 raw words needed after the sub-word shift. Taking (wi, sub) instead of
    a flat char position keeps all device arithmetic int32 even for bigSA
    texts (word indices fit int32 up to 2^35 chars)."""
    from rapmap_tpu.ops.gather import row_gather_nd

    nw = didx.text2q.shape[0]
    sh = (sub << 1).astype(jnp.uint32)
    lo_shift = U32(32) - sh
    n_quads = -(-(W + 1) // 4)
    raw: list[jnp.ndarray] = []
    for m in range(n_quads):
        quad = row_gather_nd(didx.text2q, jnp.clip(wi + 4 * m, 0, nw - 1))
        for c in range(4):
            raw.append(lax.bitcast_convert_type(quad[..., c], jnp.uint32))
    out = []
    for j in range(W):
        w0, w1 = raw[j], raw[j + 1]
        out.append(jnp.where(sh == 0, w0, (w0 << sh) | (w1 >> lo_shift)))
    return out


def suffix_cmp(
    didx: DeviceQuasiIndex,
    qwords: list[jnp.ndarray],  # W arrays, per-lane query words
    qlen: jnp.ndarray,          # valid query chars beyond depth k
    slot: jnp.ndarray,          # SA slot of the candidate suffix (pre-clipped)
    W: int,
):
    """Compare the suffix at SA[slot] (depth-k based) against the query suffix.

    Returns (cmp, lcp): cmp < 0 iff suffix < query, 0 iff prefix-equal over
    qlen chars, > 0 iff suffix > query; lcp in chars.
    """
    from rapmap_tpu.ops.gather import row_gather_nd

    if didx.sa_cmp is not None:
        # fused row [wi, sub, tleft, w0..w_{F-1}]: the first F suffix words
        # are pre-shifted into the row at upload, so a whole compare of up
        # to 16F chars is ONE 24 B gather; longer reads continue into
        # text2q starting F words past (wi, sub).
        row = row_gather_nd(didx.sa_cmp, slot)
        tleft = row[..., 2]
        F = didx.sa_cmp.shape[1] - 3
        twords = [
            lax.bitcast_convert_type(row[..., 3 + j], jnp.uint32)
            for j in range(min(W, F))
        ]
        if W > F:
            twords += _text_words(didx, row[..., 0] + F, row[..., 1], W - F)
    else:
        row = row_gather_nd(didx.sa_ext, slot)  # [(SA+k)>>4, (SA+k)&15, tleft]
        tleft = row[..., 2]  # chars before the transcript-terminating '$'
        twords = _text_words(didx, row[..., 0], row[..., 1], W)
    cmp = qlen * 0
    lcp = qlen * 0
    decided = qlen < 0
    for j in range(W):
        qn = jnp.clip(qlen - 16 * j, 0, 16)
        tn = jnp.clip(tleft - 16 * j, 0, 16)
        n = jnp.minimum(qn, tn)
        n2 = (n * 2).astype(jnp.uint32)
        mask = jnp.where(n2 == 0, U32(0), FULL << (U32(32) - n2))
        qv = qwords[j] & mask
        tv = twords[j] & mask
        x = qv ^ tv
        diffpos = (lax.clz(x) >> 1).astype(jnp.int32)  # chars; 16 if equal
        has_diff = diffpos < n
        word_cmp = jnp.where(
            has_diff,
            jnp.where(tv < qv, -1, 1),
            # no diff within n: transcript ends first -> suffix smaller;
            # query exhausted -> prefix-equal
            jnp.where(tn < qn, -1, 0),
        ).astype(jnp.int32)
        word_final = has_diff | (tn < qn) | (qn < 16)
        word_lcp = jnp.where(has_diff, diffpos, n)
        lcp = jnp.where(decided, lcp, lcp + word_lcp)
        cmp = jnp.where(decided, cmp, jnp.where(word_final, word_cmp, 0))
        decided = decided | word_final
    return cmp, lcp


def _bound_stacked(didx, qwords, qlen, b, e, upper, W: int, steps: int):
    """Batched binary search; `upper` is a per-lane bool vector (False: first
    S_p >= Q; True: first S_p > Q). Works for any lane count (used stacked).
    Returns (lo, lcp_less, lcp_geq) — see "fused neighbour lcps" below.

    Runs as a while_loop that exits once EVERY lane has converged (lo == hi):
    trip count tracks the widest interval realized in this batch, not the
    static worst case `steps` (which only bounds it) — on indexes where most
    k-mers are near-unique the loop ends after 1-2 trips instead of
    log2(max_interval).

    Fused neighbour lcps: suffix_cmp computes the lcp of every compare
    anyway, and the search's own structure pins the neighbours of the
    insertion point: lo only ever moves via lo = mid+1 on a "less" compare,
    so the chronologically-LAST less-compare has mid == lo_final - 1 (a later
    one would push lo past its final value); symmetrically the last not-less
    compare has mid == lo_final. Tracking the lcp of the most recent compare
    per branch therefore yields lcp(Q, S[lo-1]) (valid iff lo moved, i.e.
    lo > b) and lcp(Q, S[lo]) (valid iff hi moved, i.e. lo < e) for FREE —
    eliminating the separate 2-gather neighbour probe the MMP-length step
    used to pay per extension (two pure-ALU selects per trip instead).

    Repetitive-regime staging: the lockstep loop pays batch-MAX trips at FULL
    gather width, but on an isoform-class index most lanes converge in ~3
    trips (interval widths p50 ~4) while the p99 tail (width <= ~18) holds
    the loop open for ~6. After PRE trips the unconverged lanes — measured
    ~a few % — compact to width/4 and finish there, cutting the tail trips'
    gather width 4x. Per-lane searches are independent, so compaction is
    bit-identical; if unconverged lanes exceed the quarter-width budget the
    loop continues at full width, identically to the unstaged form."""
    n_sa = (didx.sa_cmp if didx.sa_cmp is not None else didx.sa_ext).shape[0]

    def mk_step(qw, ql, up):
        def step2(lo, hi, ll, lg):
            mid = (lo + hi) >> 1
            cmp, lcp = suffix_cmp(didx, qw, ql, jnp.clip(mid, 0, n_sa - 1), W)
            less = (cmp < 0) | (up & (cmp == 0))
            cont = lo < hi
            lo2 = jnp.where(less, mid + 1, lo)
            hi2 = jnp.where(less, hi, mid)
            return (
                jnp.where(cont, lo2, lo),
                jnp.where(cont, hi2, hi),
                jnp.where(cont & less, lcp, ll),
                jnp.where(cont & ~less, lcp, lg),
            )

        return step2

    step_full = mk_step(qwords, qlen, upper)
    Rw = int(b.shape[0])
    lcp0 = qlen * 0

    def cond4(iv):
        return jnp.any(iv[0] < iv[1])

    if Rw < _STAGE_MIN_WIDTH:
        # small widths (tests, host staging): plain early-exit loop — the
        # compaction bookkeeping would cost more than the tail trips save
        def body(iv):
            return step_full(*iv)

        lo_f, _, ll_f, lg_f = lax.while_loop(cond4, body, (b, e, lcp0, lcp0))
        return lo_f, ll_f, lg_f

    PRE = 3                      # resolves interval widths <= 4 (p50 regime)
    WC = max(1, Rw // 4)
    z = qlen[0] * 0              # traced int32 zero (no device constants)

    def condA(iv):
        lo, hi, ll, lg, t = iv
        return jnp.any(lo < hi) & (t < PRE)

    def bodyA(iv):
        lo, hi, ll, lg, t = iv
        lo2, hi2, ll2, lg2 = step_full(lo, hi, ll, lg)
        return lo2, hi2, ll2, lg2, t + 1

    lo1, hi1, ll1, lg1, _ = lax.while_loop(condA, bodyA, (b, e, lcp0, lcp0, z))
    un = lo1 < hi1
    nu = jnp.sum(un.astype(jnp.int32))

    def full_tail():
        def body(iv):
            return step_full(*iv)

        lo_f, _, ll_f, lg_f = lax.while_loop(cond4, body, (lo1, hi1, ll1, lg1))
        return lo_f, ll_f, lg_f

    def narrow_tail():
        ia = jnp.cumsum(un.astype(jnp.int32)) - 1
        dest = jnp.where(un, ia, Rw)
        sel = (
            jnp.broadcast_to(z, (Rw + 1,))
            .at[dest].set(np.arange(Rw, dtype=np.int32) + z)[:WC]
        )
        live = (np.arange(WC, dtype=np.int32) + z) < nu
        selc = jnp.where(live, sel, 0)
        qw_c = [flat_gather(q, selc) for q in qwords]
        ql_c = flat_gather(qlen, selc)
        up_c = flat_gather(upper.astype(jnp.int32), selc) > 0
        lo_c = jnp.where(live, flat_gather(lo1, selc), 0)
        hi_c = jnp.where(live, flat_gather(hi1, selc), 0)
        ll_c = flat_gather(ll1, selc)
        lg_c = flat_gather(lg1, selc)
        stepC = mk_step(qw_c, ql_c, up_c)

        def body(iv):
            return stepC(*iv)

        lo_cf, _, ll_cf, lg_cf = lax.while_loop(
            cond4, body, (lo_c, hi_c, ll_c, lg_c)
        )
        selw = jnp.where(live, selc, np.int32(Rw))

        def back(full, tail_vals):
            return (
                jnp.concatenate([full, z[None]])
                .at[selw].set(jnp.where(live, tail_vals, 0), mode="drop")[:Rw]
            )

        return back(lo1, lo_cf), back(ll1, ll_cf), back(lg1, lg_cf)

    # near-unique regimes converge entirely within PRE trips — skip the
    # compaction bookkeeping outright there
    return lax.cond(
        nu == 0,
        lambda: (lo1, ll1, lg1),
        lambda: lax.cond(nu <= np.int32(WC), narrow_tail, full_tail),
    )


def extend_packed(
    didx: DeviceQuasiIndex,
    preads: jnp.ndarray,    # (R, L) packed read words (pack_reads)
    next_bad: jnp.ndarray,  # (R, L) from denc.next_bad_batch
    lens: jnp.ndarray,      # (R,)
    b0, e0, pos, active, k: int, ext_steps: int, L: int,
    lane=None,              # per-anchor read-row indices; default: one per row
    col_off=None,           # (R,) per-LANE column offset for right-aligned
    #                         rows (ops.encode.comp_flip_batch rc lanes)
):
    """Drop-in for ops.mmp._extend. Returns (b, e, mlen).

    With `lane` given, anchors may outnumber read rows (anchor-parallel
    mode): anchor i reads lane[i]'s data at pos[i]. With `col_off`, lane r's
    data starts at column col_off[r] (position p -> column p + col_off[r])
    and ends at column col_off[r] + lens[r].
    """
    W = max(1, -(-(L - k) // 16))
    if lane is None:
        lane = np.arange(pos.shape[0], dtype=np.int32)
    off = flat_gather(col_off, lane) if col_off is not None else np.int32(0)
    base = pos + k + off
    base_c = jnp.clip(base, 0, L - 1)
    pre_f = preads.reshape(-1)
    nb_f = next_bad.reshape(-1)
    # valid query chars beyond depth k: up to the next N and the read end
    nb = jnp.where(base < L, flat_gather(nb_f, lane * L + base_c), base)
    qlen = jnp.clip(jnp.minimum(nb, flat_gather(lens, lane) + off) - base, 0, L - k)
    qwords = [
        jnp.where(
            base + 16 * j < L,
            flat_gather(pre_f, lane * L + jnp.clip(base + 16 * j, 0, L - 1)),
            U32(0),
        )
        for j in range(W)
    ]

    no_up = qlen < 0  # all-False
    # inactive lanes get empty search ranges so they never hold the
    # early-exit while_loops open
    b0a = jnp.where(active, b0, 0)
    e0a = jnp.where(active, e0, 0)
    lb, ll, lg = _bound_stacked(didx, qwords, qlen, b0a, e0a, no_up, W, ext_steps)

    # neighbour lcps fall out of the search itself (see _bound_stacked):
    # lcp(Q, S[lb-1]) = ll iff lo moved (lb > b0), lcp(Q, S[lb]) = lg iff hi
    # moved (lb < e0) — the 2-gather stacked neighbour probe is gone.
    R = lb.shape[0]
    l_left = jnp.where(lb > b0a, ll, 0)
    l_right = jnp.where(lb < e0a, lg, 0)
    ext = jnp.minimum(jnp.maximum(l_left, l_right), qlen)
    mlen = k + ext

    # equal_range of Q truncated to ext chars, both bounds in one stacked call
    # over NARROWED spans: lower_bound(Q[:ext]) <= lb (prefix sorts <= full Q)
    # so it lies in [b0, lb]; upper_bound(Q[:ext]) >= lb (suffixes below lb are
    # < Q and any sharing Q[:ext] still sort before its run's end) so it lies
    # in [lb, e0). The tracked lcps close one side outright in the common
    # case: if lcp(S[lb-1]) < ext, S[lb-1]'s diff vs Q occurs within ext
    # chars, so every suffix below lb is < Q[:ext] and lower_bound == lb;
    # if lcp(S[lb]) < ext, S[lb] > Q with the diff within ext chars, so
    # S[lb][:ext] > Q[:ext] and upper_bound == lb. (ext is always achieved
    # by at least one neighbour, so at most one search has real width unless
    # both neighbours tie at ext.) Zero-width lanes exit the early-exit loop
    # immediately and compact away in the staged path.
    ext2 = jnp.concatenate([ext, ext])
    b_st = jnp.concatenate([jnp.where(l_left < ext, lb, b0a), lb])
    e_st = jnp.concatenate([lb, jnp.where(l_right < ext, lb, e0a)])
    upper = jnp.concatenate([ext < 0, ext >= 0])  # [False..., True...]
    q2 = [jnp.concatenate([q, q]) for q in qwords]
    bounds, _, _ = _bound_stacked(didx, q2, ext2, b_st, e_st, upper, W, ext_steps)
    lb2, ub2 = bounds[:R], bounds[R:]
    ok = active & (ub2 > lb2)
    b = jnp.where(ok, lb2, b0)
    e = jnp.where(ok, ub2, e0)
    mlen = jnp.where(ok, mlen, k)
    return b, e, mlen
