"""Banded affine-gap alignment scoring of mapping candidates (ksw2 analog).

Selective-alignment validation in the later-RapMap/salmon lineage
(upstream:src/ksw2_extz.c + include/ksw2pp wrapper role, SURVEY.md §2.2 —
presence in the reference v0 is unverified, so this is the documented
STRETCH component, off by default): each emitted quasi-mapping
(t, pos, strand) gets an alignment score `AS:i` from a banded, affine-gap,
read-global ("glocal") alignment of the oriented read against the transcript
window [pos - band, pos + L + band).

TPU-native formulation (no ksw2-style SSE striping, no per-cell branching):
the DP runs as ONE lax.scan over read positions, carrying the (N, 2b+1)
band of H/E scores for ALL candidate records in lockstep; the within-row
gap recurrence (Gotoh's F) collapses to an exclusive prefix-max over the
band — log2(band) shifted maxes — so each scan step is a handful of
(N, 2b+1) VPU ops. Reference text slices come from the same 2-bit packed
word stream the extension kernel uses (ops.device_index.text2q): two quad
row-gathers + a sub-word shift align the window, so the whole scorer adds
~3 gathers per record.

Semantics (normative; SEMANTICS.md §9):
  * scoring: match +ma, mismatch +mp (mp < 0), gap open -(go), gap extend
    -(ge) per additional base, go >= ge; read N bases and positions outside
    the transcript ([0, txp_len)) always mismatch.
  * the read aligns END-TO-END (no soft clipping — the emitted CIGAR stays
    `<len>M`); leading/trailing unused window bases are free.
  * score of a perfect hit = ma * readLen; scores are clamped to
    [0, 2^SCORE_BITS - 1] for the wire.
"""

from __future__ import annotations

import numpy as np

import jax.numpy as jnp
from jax import lax

NEG = np.int32(-(1 << 20))  # -inf stand-in; safe against int32 underflow
SCORE_BITS = 12             # wire clamp: scores ride 12 bits (reads to ~2 kb)


def make_txp_align(txp_offsets, txp_lens) -> np.ndarray:
    """(n_txps, 3) int32 rows [offset >> 4, offset & 15, txp_len].

    Device kernels never hold a global text position (bigSA rule,
    ops.device_index): a transcript's start rides as (word, sub-word) int32
    columns, valid for texts up to 2^35 chars."""
    off = np.asarray(txp_offsets, dtype=np.int64)
    return np.stack(
        [
            (off >> 4).astype(np.int32),
            (off & 15).astype(np.int32),
            np.asarray(txp_lens, dtype=np.int32),
        ],
        axis=1,
    )


def extract_ref_windows(didx, t, start, W: int):
    """Transcript-window codes for each record: (N, W) int32 in 0..3, with 5
    at positions outside [0, txp_len) (so they can never match a read base).

    Window char j is transcript position start + j of transcript t, read
    straight from the 2-bit packed text: quad rows of text2q supply
    ceil(W/16)+1 consecutive words, a sub-word shift aligns char 0 to the
    word boundary (same trick as device_index.sa_cmp_rows), and a static
    unpack fans the words out to chars. `start` may be negative (reads
    hanging off the transcript head): int32 >> is arithmetic and & is
    two's-complement, so (goff >> 4)*16 + (goff & 15) == goff holds."""
    ta = didx.txp_align
    assert ta is not None, "index uploaded without txp_align rows"
    N = t.shape[0]
    row = jnp.take(ta, jnp.clip(t, 0, ta.shape[0] - 1), axis=0)  # (N, 3)
    tw, tsub, tlen = row[:, 0], row[:, 1], row[:, 2]
    goff = tsub + start  # window char 0, as a char offset from word tw
    wi = tw + (goff >> 4)
    sub = (goff & 15).astype(jnp.uint32)

    nwords = (W + 15) // 16 + 1  # +1: the shift pulls bits from word m+1
    top = didx.text2q.shape[0] - 1
    # per-word clipped gathers: slot m must hold word wi+m EXACTLY when any
    # valid char reads it. Clipping a quad-row BASE index would shift every
    # slot when wi < 0 (windows hanging off transcript 0's head); clipping
    # each word individually only corrupts slots whose chars are outside
    # [0, txp_len) — and those are masked to 5 below.
    t2w = didx.text2q[:, 0]  # flat packed-word stream (row i col 0 = word i)
    words = [
        lax.bitcast_convert_type(
            jnp.take(t2w, jnp.clip(wi + m, 0, top), mode="clip"), jnp.uint32
        )
        for m in range(nwords)
    ]
    # sub-word shift: w'[m] = words[m] << 2*sub | words[m+1] >> (32 - 2*sub)
    sh = sub * np.uint32(2)
    sh2 = (np.uint32(32) - sh) % np.uint32(32)
    nw_out = (W + 15) // 16
    chars = []
    for m in range(nw_out):
        w = jnp.where(
            sub == 0, words[m], (words[m] << sh) | (words[m + 1] >> sh2)
        )
        for j in range(16):
            if m * 16 + j < W:
                chars.append(((w >> np.uint32(30 - 2 * j)) & np.uint32(3)).astype(jnp.int32))
    win = jnp.stack(chars, axis=1)  # (N, W)
    p = start[:, None] + np.arange(W, dtype=np.int32)[None, :]
    valid = (p >= 0) & (p < tlen[:, None])
    return jnp.where(valid, win, np.int32(5))


def banded_scores(
    rcodes: jnp.ndarray,  # (N, L) int32 read codes 0..3 (4 = N/pad)
    rlens: jnp.ndarray,   # (N,) int32
    wcodes: jnp.ndarray,  # (N, L + 2*band) int32 window codes 0..3 (5 = invalid)
    band: int,
    ma: int, mp: int, go: int, ge: int,
) -> jnp.ndarray:
    """Core banded DP -> (N,) int32 scores (may be negative; not clamped).

    Band coordinate d = (window index) - (read index) in [0, 2*band]; read
    position i consumes window chars [i-1, i-1 + 2*band]. H(i, d) = best
    score of read[0:i] ending with read char i at window char i-1+d; E =
    gap-in-read state (from d+1 of the previous row); F = gap-in-window
    state (within-row; exclusive prefix-max closed form, valid for
    go >= ge). Rows freeze once i reaches the lane's read length, so the
    final H is H(len) for every lane regardless of padding."""
    assert go >= ge, "gap-open penalty must be >= gap-extend (Gotoh closed form)"
    N, L = rcodes.shape
    Wb = 2 * band + 1
    assert wcodes.shape[1] == L + 2 * band
    dge = (np.arange(Wb, dtype=np.int32) * ge)[None, :]
    ma_, mp_, go_, ge_ = np.int32(ma), np.int32(mp), np.int32(go), np.int32(ge)

    H0 = jnp.zeros((N, Wb), jnp.int32)           # free leading window gap
    E0 = jnp.full((N, Wb), NEG, jnp.int32)

    def shift_left(x):  # value at d <- x[d+1]; NEG beyond the band
        return jnp.concatenate([x[:, 1:], jnp.full((N, 1), NEG, jnp.int32)], axis=1)

    def excl_prefix_max(a):
        p = jnp.concatenate([jnp.full((N, 1), NEG, jnp.int32), a[:, :-1]], axis=1)
        s = 1
        while s < Wb:
            p = jnp.maximum(
                p,
                jnp.concatenate(
                    [jnp.full((N, s), NEG, jnp.int32), p[:, :-s]], axis=1
                ),
            )
            s <<= 1
        return p

    def body(carry, i):
        H, E = carry
        r = lax.dynamic_slice_in_dim(rcodes, i, 1, axis=1)        # (N, 1)
        w = lax.dynamic_slice_in_dim(wcodes, i, Wb, axis=1)       # (N, Wb)
        sub = jnp.where((w == r) & (r <= 3), ma_, mp_)
        E2 = jnp.maximum(shift_left(H) - go_, shift_left(E) - ge_)
        Hnf = jnp.maximum(H + sub, E2)
        F = excl_prefix_max(Hnf + dge) - dge - (go_ - ge_)
        Hn = jnp.maximum(Hnf, F)
        act = (i < rlens)[:, None]
        return (jnp.where(act, Hn, H), jnp.where(act, E2, E)), None

    (H, _), _ = lax.scan(body, (H0, E0), np.arange(L, dtype=np.int32))
    return jnp.max(H, axis=1)


def score_records(
    didx,
    cfg,
    reads: jnp.ndarray,   # (B, L) int8 SEMANTICS codes (1..4, 5 = N)
    lens: jnp.ndarray,    # (B,) int32
    rid: jnp.ndarray,     # (N,) int32 read ids
    t: jnp.ndarray,       # (N,) int32 transcript ids
    pos: jnp.ndarray,     # (N,) int32 mapping positions (leftmost, 0-based)
    strand: jnp.ndarray,  # (N,) int32 0 = fwd, 1 = rc
    valid: jnp.ndarray,   # (N,) bool — live record rows
) -> jnp.ndarray:
    """Mapping scores for a compacted record buffer -> (N,) int32 in
    [0, 2^SCORE_BITS - 1]; dead rows score 0."""
    from rapmap_tpu.ops import encode as denc

    B, L = reads.shape
    band = cfg.align_band
    lanes = jnp.concatenate([reads, denc.revcomp_batch(reads, lens)], axis=0)
    ridc = jnp.clip(rid, 0, B - 1)
    rrow = jnp.take(lanes, ridc + strand * np.int32(B), axis=0).astype(jnp.int32)
    rcodes = jnp.where((rrow >= 1) & (rrow <= 4), rrow - 1, np.int32(4))
    rlens = jnp.take(lens, ridc)
    tc = jnp.where(valid, t, 0)
    wcodes = extract_ref_windows(didx, tc, jnp.where(valid, pos, 0) - np.int32(band), L + 2 * band)
    sc = banded_scores(
        rcodes, rlens, wcodes, band, cfg.align_ma, cfg.align_mp,
        cfg.align_go, cfg.align_ge,
    )
    sc = jnp.clip(sc, 0, np.int32((1 << SCORE_BITS) - 1))
    return jnp.where(valid, sc, 0)


def score_pe_rows(
    didx,
    cfg,
    reads1, lens1, reads2, lens2,   # (B, L) int8 / (B,) int32 per mate
    rid: jnp.ndarray,               # (N,) int32 read ids
    t: jnp.ndarray,                 # (N,) int32
    p1, s1, has1, p2, s2, has2,     # (N,) record mate fields
    live: jnp.ndarray,              # (N,) bool
):
    """Both mates of dense PE record rows in ONE banded-DP pass: the two
    mates' rows concatenate into a single 2N-lane scorer over the stacked
    [mate1; mate2] read batch. -> (sc1, sc2), zero where the mate is absent."""
    B = reads1.shape[0]
    reads = jnp.concatenate([reads1, reads2], axis=0)
    lens = jnp.concatenate([lens1, lens2])
    rid2 = jnp.concatenate([rid, rid + np.int32(B)])
    sc = score_records(
        didx, cfg, reads, lens, rid2,
        jnp.concatenate([t, t]),
        jnp.concatenate([p1, p2]),
        jnp.concatenate([s1, s2]),
        jnp.concatenate([live & (has1 != 0), live & (has2 != 0)]),
    )
    N = t.shape[0]
    return sc[:N], sc[N:]
