"""Device-resident quasi index: HBM flat arrays + static engine metadata.

Layout is engineered around the chip's gather economics (measured: cost is
per-INDEX, ~13 ns, while row width up to 16 B is free), so every hot probe
reads one multi-column row:

  kmer_rows (K, 4)  [hi, lo, b, e]          one row per table probe
  lut_rows  (4^p,2) [start_v, start_v+1]    one row per prefix-bucket lookup
  sa_ext    (n, 2)  [SA[i], txp_end]        one row per extension probe
  sa_meta   (n, 2)  [sa_txp, sa_tpos]       one row per expansion slot
  text2q    (nw, 4) packed words w..w+3     one row covers a 49+ char window

All derived at upload from the on-disk arrays (disk format unchanged).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from rapmap_tpu.index.format import QuasiIndex


class DeviceQuasiIndex(NamedTuple):
    """Pytree of HBM arrays (everything the mapping kernels touch).

    bigSA design (upstream:src/RapMapSAIndexer.cpp divsufsort64 dispatch,
    SURVEY.md §3.1): device kernels never hold a global text position. The
    extension probe needs only (word index, sub-word offset, transcript
    chars remaining) of SA[i]+k — all int32 for texts up to 2^35 chars —
    precomputed into sa_ext at upload from the (possibly int64) SA; collate
    resolves occurrences via the int32 (txp, tpos) sa_meta rows. `sa`/`text`
    exist only for the charwise debug path and are dropped in bigSA mode.
    """

    text2q: jnp.ndarray     # uint32 (nw, 4): packed words i..i+3
    sa_meta: jnp.ndarray    # int32 (n, 2): [sa_txp, sa_tpos]
    # None under lean upload (sa_cmp carries the same 3 leading columns):
    sa_ext: jnp.ndarray | None = None  # int32 (n, 3): [(SA[i]+k) >> 4,
    #                                    (SA[i]+k) & 15, txp_end - (SA[i]+k)]
    # binary-search fallback tables; None under lean upload (CHD only)
    kmer_rows: jnp.ndarray | None = None  # int32 (K, 4): [hi, lo, b, e]
    lut_rows: jnp.ndarray | None = None   # int32 (4^p, 2): [lut[v], lut[v+1]]
    # charwise-fallback arrays; None in bigSA mode (packed path only)
    text: jnp.ndarray | None = None  # int8 codes
    sa: jnp.ndarray | None = None    # int32
    # CHD perfect hash (2-gather k-mer probe); None = binary-search path.
    # Canonical tables (st.chd_canonical) widen rows to 6 columns
    # [chi, clo, b_fwd, e_fwd, b_rc, e_rc]: ONE probe answers both strands
    # (gather cost is per-index; width <= 32 B measured free on this chip)
    chd_dir: jnp.ndarray | None = None   # int32 (2^m_bits,)
    chd_rows: jnp.ndarray | None = None  # int32 (2^t_bits, 4 or 6)
    # fused extension rows [wi, sub, tleft, w0..w_{F-1}]: the first 16F text
    # chars of suffix SA[i]+k PRE-SHIFTED into the row, so one 24 B gather
    # answers a whole suffix compare (reads up to k+16F bases); (wi, sub)
    # continue into text2q for longer reads. None = 2-gather legacy path.
    sa_cmp: jnp.ndarray | None = None    # int32 (n, 3 + SA_CMP_WORDS)
    # per-transcript [start >> 4, start & 15, txp_len] rows for the mapping-
    # score kernel's window extraction (ops.align); tiny, always uploaded
    txp_align: jnp.ndarray | None = None  # int32 (n_txps, 3)


@dataclass(frozen=True)
class EngineStatic:
    """Hashable static facts about the index needed at trace time."""

    k: int
    prefix_bases: int
    lookup_steps: int   # binary-search trips covering the largest LUT bucket
    pad_tail: int       # trailing text zero-pad (bounds max read length)
    max_interval_idx: int = 1 << 30  # widest k-mer interval in the table
    # collate sort-key packing stats (0 = unknown -> unpacked multi-key sorts)
    n_txps: int = 0
    max_tpos: int = 0   # longest transcript (bounds any mapping position)
    # CHD perfect-hash probe (2 gathers) when the index carries one
    use_chd: bool = False
    chd_seed: int = 0
    chd_m_bits: int = 0
    chd_t_bits: int = 0
    chd_p_bits: int = 0  # partitioned slot formula (0 = legacy, pre-partition)
    chd_canonical: bool = False  # rows carry both strands' intervals

    @staticmethod
    def for_index(idx: QuasiIndex, use_chd: bool | None = None) -> "EngineStatic":
        lut = np.asarray(idx.prefix_lut)
        max_bucket = int(np.max(np.diff(lut))) if len(lut) > 1 else 1
        steps = max(1, int(np.ceil(np.log2(max_bucket + 1))) + 1)
        pad_tail = len(idx.text) - idx.n_text
        widths = np.asarray(idx.kmer_e) - np.asarray(idx.kmer_b)
        max_w = int(widths.max()) if len(widths) else 1
        chd = idx.meta.get("chd") if getattr(idx, "chd_dir", None) is not None else None
        if use_chd is None:
            use_chd = chd is not None
        tl = np.asarray(idx.txp_lens)
        return EngineStatic(
            k=idx.k, prefix_bases=idx.prefix_bases, lookup_steps=steps,
            pad_tail=pad_tail, max_interval_idx=max_w,
            n_txps=int(idx.n_txps),
            max_tpos=int(tl.max()) if len(tl) else 0,
            use_chd=bool(use_chd and chd is not None),
            chd_seed=int(chd["seed"]) if chd else 0,
            chd_m_bits=int(chd["m_bits"]) if chd else 0,
            chd_t_bits=int(chd["t_bits"]) if chd else 0,
            chd_p_bits=int(chd.get("p_bits", 0)) if chd else 0,
            chd_canonical=bool(chd.get("canonical")) if chd else False,
        )


def sa_ext_cols(sa, tend, k: int) -> np.ndarray:
    """(n, 3) int32 [(SA+k) >> 4, (SA+k) & 15, tend - (SA+k)]; int64-safe."""
    gpk = np.asarray(sa, dtype=np.int64) + k
    return np.stack(
        [
            (gpk >> 4).astype(np.int32),
            (gpk & 15).astype(np.int32),
            (np.asarray(tend, dtype=np.int64) - gpk).astype(np.int32),
        ],
        axis=1,
    )


SA_CMP_WORDS = 3  # fused text words per sa_cmp row (reads to k + 48 bases)


def sa_cmp_rows(sa, tend, k: int, t2b: np.ndarray) -> np.ndarray:
    """(n, 3 + SA_CMP_WORDS) int32 [wi, sub, tleft, w0..]: sa_ext_cols plus
    the suffix's first SA_CMP_WORDS 16-char packed text windows pre-shifted
    to start exactly at SA[i]+k — suffix_cmp then needs ONE row gather
    instead of (sa_ext row + text2q quad); int64-safe."""
    base = sa_ext_cols(sa, tend, k)
    gpk = np.asarray(sa, dtype=np.int64) + k
    wi = gpk >> 4
    sub = (gpk & 15).astype(np.uint32)
    t2p = np.concatenate(
        [np.asarray(t2b, dtype=np.uint32), np.zeros(SA_CMP_WORDS + 2, np.uint32)]
    )
    sh = sub << 1
    sh2 = (np.uint32(32) - sh) % np.uint32(32)
    cols = [base[:, 0], base[:, 1], base[:, 2]]
    top = len(t2p) - 1
    for j in range(SA_CMP_WORDS):
        w0 = t2p[np.clip(wi + j, 0, top)]
        w1 = t2p[np.clip(wi + j + 1, 0, top)]
        w = np.where(sub == 0, w0, (w0 << sh) | (w1 >> sh2))
        cols.append(w.view(np.int32))
    return np.stack(cols, axis=1)


def device_bytes_estimate(idx: QuasiIndex) -> int:
    """HBM footprint the replicated engine's upload_index would need,
    computed from array SHAPES only (safe on mmap'd genome-scale indexes —
    no data is read). Drives the CLI's replicated-vs-staged engine dispatch
    (the reference's invisible bigSA template branch,
    upstream:src/RapMapSAMapper.cpp load-time dispatch, SURVEY.md §3.2)."""
    n = len(idx.sa)
    nw = len(idx.text2b)
    has_chd = getattr(idx, "chd_dir", None) is not None
    b = n * (3 + SA_CMP_WORDS) * 4   # sa_cmp fused rows
    b += n * 16                      # sa_meta (pair rows worst case)
    b += nw * 16                     # text2q quad rows
    if has_chd:
        b += len(idx.chd_dir) * 4 + len(idx.chd_cls) * 24
    if not has_chd:  # full upload: binary-search tables + sa_ext
        b += len(idx.kmer_b) * 16 + max(0, len(idx.prefix_lut) - 1) * 8 + n * 12
    return int(b)


def upload_index(
    idx: QuasiIndex, lean: bool = False, meta_pairs: bool = False
) -> tuple[DeviceQuasiIndex, EngineStatic]:
    """lean=True drops every HBM array the CHD + packed-extension hot path
    never gathers (charwise text/sa, the binary-search kmer/lut tables, and
    sa_ext whose 3 columns lead each sa_cmp row) — roughly halves device
    memory, which is what lets human-transcriptome-scale indexes fit one
    chip. Requires a CHD-bearing index; engines needing the dropped arrays
    (cfg.packed_extension=False, non-CHD lookup) must use the full upload."""
    big_sa = np.asarray(idx.sa).dtype == np.int64
    if len(np.asarray(idx.sa)) >= 2**31:
        raise ValueError(
            "single-device upload caps at 2^31 SA slots (int32 slot ids on "
            "device); genome-scale indexes must use the SA-sharded mode "
            "(rapmap_tpu.parallel.sharded), whose per-shard tables stay local"
        )
    sa_txp = np.asarray(idx.sa_txp, dtype=np.int32)
    sa_tpos = np.asarray(idx.sa_tpos, dtype=np.int32)
    off = np.asarray(idx.txp_offsets, dtype=np.int64)
    tl = np.asarray(idx.txp_lens, dtype=np.int32)
    tend = off[sa_txp] + tl[sa_txp]
    if lean and getattr(idx, "chd_dir", None) is None:
        raise ValueError("lean upload requires a CHD-bearing index")
    sa_ext = None if lean else sa_ext_cols(idx.sa, tend, idx.k)
    if meta_pairs:
        # pair rows [t_i, p_i, t_{i+1}, p_{i+1}]: one 16 B gather resolves
        # TWO adjacent SA positions of an expansion interval (ops.collate
        # cfg.expand_pairs path); the first two columns still serve any
        # single-position gather. Last row duplicates itself as its pair.
        nxt = np.minimum(np.arange(1, len(sa_txp) + 1), len(sa_txp) - 1)
        sa_meta = np.stack(
            [sa_txp, sa_tpos, sa_txp[nxt], sa_tpos[nxt]], axis=1
        )
    else:
        sa_meta = np.stack([sa_txp, sa_tpos], axis=1)
    kmer_rows = np.stack(
        [
            np.asarray(idx.kmer_hi, dtype=np.uint32).view(np.int32),
            np.asarray(idx.kmer_lo, dtype=np.uint32).view(np.int32),
            np.asarray(idx.kmer_b, dtype=np.int32),
            np.asarray(idx.kmer_e, dtype=np.int32),
        ],
        axis=1,
    ) if len(idx.kmer_b) else np.zeros((1, 4), np.int32)
    lut = np.asarray(idx.prefix_lut, dtype=np.int32)
    lut_rows = np.stack([lut[:-1], lut[1:]], axis=1)
    t2b = np.asarray(idx.text2b, dtype=np.uint32)
    nw = len(t2b)
    t2p = np.concatenate([t2b, np.zeros(4, np.uint32)])
    text2q = np.stack([t2p[i : i + nw] for i in range(4)], axis=1)
    sa_cmp = sa_cmp_rows(idx.sa, tend, idx.k, t2b)
    st = EngineStatic.for_index(idx)
    chd_dir = chd_rows = None
    if st.use_chd:
        perm = np.asarray(idx.chd_perm, dtype=np.int64)
        pc = np.clip(perm, 0, None)
        if st.chd_canonical:
            # class rows [chi, clo, b_fwd, e_fwd, b_rc, e_rc]; the class key
            # is the canonical (min of kmer, rc) orientation. An orientation
            # absent from the text gets b=e=0 (empty interval -> not found).
            from rapmap_tpu.index.chd import key64_of, rc_key64_np

            cls = np.asarray(idx.chd_cls, dtype=np.int64)  # (n_cls, 2)
            fwd_r, rc_r = cls[:, 0], cls[:, 1]
            key64 = key64_of(idx.kmer_hi, idx.kmer_lo)
            ck = np.where(
                fwd_r >= 0,
                key64[np.clip(fwd_r, 0, None)],
                rc_key64_np(key64[np.clip(rc_r, 0, None)], idx.k),
            )
            kb = np.asarray(idx.kmer_b, dtype=np.int32)
            ke = np.asarray(idx.kmer_e, dtype=np.int32)

            def iv(rowsel):
                ok = rowsel >= 0
                r = np.clip(rowsel, 0, None)
                return (
                    np.where(ok, kb[r], 0).astype(np.int32),
                    np.where(ok, ke[r], 0).astype(np.int32),
                )

            bf, ef = iv(fwd_r)
            br, er = iv(rc_r)
            cls_rows = np.stack(
                [
                    (ck >> np.uint64(32)).astype(np.uint32).view(np.int32),
                    (ck & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32),
                    bf, ef, br, er,
                ],
                axis=1,
            )
            sentinel = np.array([-1, -1, 0, 0, 0, 0], dtype=np.int32)
            rows = np.where(
                (perm >= 0)[:, None],
                cls_rows[np.clip(pc, 0, len(cls_rows) - 1)],
                sentinel[None, :],
            ).astype(np.int32)
        else:
            # legacy per-strand rows: empty slots -> a row no query matches
            sentinel = np.array([-1, -1, 0, 0], dtype=np.int32)
            rows = np.where(
                (perm >= 0)[:, None], kmer_rows[np.clip(pc, 0, len(kmer_rows) - 1)],
                sentinel[None, :],
            ).astype(np.int32)
        chd_dir = jnp.asarray(np.asarray(idx.chd_dir, dtype=np.int32))
        chd_rows = jnp.asarray(rows)
    dev = DeviceQuasiIndex(
        text2q=jnp.asarray(text2q),
        sa_ext=None if sa_ext is None else jnp.asarray(sa_ext),
        sa_meta=jnp.asarray(sa_meta),
        kmer_rows=None if lean else jnp.asarray(kmer_rows),
        lut_rows=None if lean else jnp.asarray(lut_rows),
        text=None if (big_sa or lean) else jnp.asarray(np.asarray(idx.text), dtype=jnp.int8),
        sa=None if (big_sa or lean) else jnp.asarray(np.asarray(idx.sa, dtype=np.int32)),
        chd_dir=chd_dir,
        chd_rows=chd_rows,
        sa_cmp=jnp.asarray(sa_cmp),
        txp_align=jnp.asarray(_txp_align_rows(off, tl)),
    )
    return dev, st


def _txp_align_rows(off: np.ndarray, tl: np.ndarray) -> np.ndarray:
    from rapmap_tpu.ops.align import make_txp_align

    return make_txp_align(off, tl)
