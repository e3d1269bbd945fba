"""Run configuration mirroring the reference's quasimap/pseudomap flags
(SURVEY.md §3.2, §5.6) so the CLI is drop-in comparable."""

from __future__ import annotations

from dataclasses import dataclass


@dataclass(frozen=True)
class MapConfig:
    """Static mapping parameters. Frozen/hashable: used as a jit static arg."""

    k: int = 31
    max_num_hits: int = 200        # -m: reads with more mappings are discarded
    max_interval: int = 1000       # SA intervals wider than this are skipped
    consistent_hits: bool = False  # -c: consensus intersection across MMPs
    fuzzy: bool = False            # -f: tolerate one missing hit in consensus
    strict_check: bool = False     # -s: orientation-bias curb (ops.collate +
    # oracle implement it; covered by the config-sweep parity tests)
    quasi_coverage: float = 0.0    # -z: min fraction of read covered by MMPs
    no_orphans: bool = False       # suppress orphan output for pairs
    # [REF-VERIFY] PE-merge fidelity constraints (upstream:src/RapMapUtils.cpp
    # mergeLeftRightHits applies orientation + fragment-length checks, SURVEY
    # §2.1 #8). Defaults OFF to preserve SEMANTICS.md §5 (join on same-txp +
    # opposite-strand only); flip once the reference mount pins the behavior.
    max_frag_len: int = 0          # >0: require |pos1 - pos2| <= this
    pair_order: bool = False       # require fwd mate to start at/before rc mate
    # selective-alignment scoring (SEMANTICS.md §9; ksw2-analog STRETCH —
    # upstream presence in v0 unverified, SURVEY §2.2). Off by default so the
    # v0 parity surface is untouched. When on, every emitted record carries a
    # banded affine-gap alignment score (SAM AS:i); records scoring below
    # ceil(min_score_fraction * align_ma * readLen) are suppressed at output.
    mapping_score: bool = False
    min_score_fraction: float = 0.0
    align_ma: int = 2              # match bonus        (salmon-era --ma)
    align_mp: int = -4             # mismatch penalty   (--mp, negative)
    align_go: int = 5              # gap open           (--go, >= align_ge)
    align_ge: int = 3              # gap extend         (--ge)
    align_band: int = 7            # DP band half-width (--bandwidth)
    # device-engine static shape knobs (no effect on semantics when not exceeded;
    # exceeding them sets the over_budget counter)
    max_hits_per_strand: int = 16  # MMP hits recorded per read-strand
    rec_slots: int = 4             # dense record-buffer rows per read in the
    # wire output (cap = rec_slots * batch); exceeding it sets `overflowed`
    # and drops tail records — typical data uses ~1 row/read, so benches can
    # shrink it to cut device->host bytes
    expand_budget: int = 8         # AVERAGE SA-expansion slots per read: the
    # global pool holds expand_budget * batch slots (ops.collate); typical
    # reads use 2-6, so 8 leaves ample headroom before over_budget flags.
    # 0 = auto-size from index stats at mapper init (auto_expand_budget)
    expand_pairs: bool = False     # expansion pool slots cover TWO adjacent
    # SA positions each (sa_meta pair rows, 16 B gathers): halves the
    # per-slot gather count on repetitive indexes where intervals are wide
    # (mean width >= ~2); pure overhead on near-unique indexes (odd widths
    # round up). Auto-set by QuasiMapper when expand_budget auto-sizes.
    max_out: int = 0               # mapping records retained per read on device;
    # 0 (default) derives max_num_hits so -m's full record count is never
    # silently truncated; explicit smaller values trip the out_truncated counter
    packed_extension: bool = True  # word-compare extension (ops.extend_packed)
    bitonic_sort: bool = False     # voting sort via the specialized bitonic
    # network (ops.pallas.sort2) instead of lax.sort; identical output order
    # (used only when the pool size is a power of two and keys pack to 2 words)
    chunk: int = 0                 # wire-path inner chunk size: the jitted
    # program processes the batch as a lax.scan over fixed (chunk)-read chunks,
    # so compile time is batch-size-independent and huge batches amortize the
    # per-dispatch tunnel cost. 0 = single program over the whole batch.
    # Semantics note: the expansion pool (expand_budget) is per chunk.

    @property
    def out_slots(self) -> int:
        """Per-read device output slots (MAX_OUT); derived from -m unless set."""
        return self.max_out if self.max_out > 0 else self.max_num_hits


def sampled_width(widths) -> float:
    """Expected SA-interval width of a k-mer DRAWN FROM THE TEXT: reads
    sample k-mers weighted by occurrence count, so the expectation is
    E[w^2]/E[w] over the table, not the table mean. (Isoform bench index:
    table mean 3.44 but sampled 4.40, matching the measured 4.39 expansion
    slots per 1.06-hit read.)"""
    import numpy as np

    w = np.asarray(widths, dtype=np.float64)
    if len(w) == 0 or w.sum() == 0:
        return 1.0
    return float((w * w).mean() / w.mean())


def auto_expand_budget(widths) -> int:
    """expand_budget sized from the index's interval-width distribution:
    average slots/read ~ (MMP hits/read, measured ~1-2) x sampled width,
    with 2x headroom. The pool averages over the whole chunk (8k+ reads), so
    per-read tails don't need covering — chunk-level demand concentrates at
    ~hits x sampled width within a few percent; overflow degrades to flagged
    reads + host fallback, never wrong output."""
    import math

    return int(min(64, max(4, math.ceil(2.0 * sampled_width(widths)))))
