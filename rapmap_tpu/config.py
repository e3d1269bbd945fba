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
    # device-engine static shape knobs (no effect on semantics when not exceeded;
    # exceeding them sets the over_budget counter)
    max_hits_per_strand: int = 16  # MMP hits recorded per read-strand
    expand_budget: int = 8         # AVERAGE SA-expansion slots per read: the
    # global pool holds expand_budget * batch slots (ops.collate); typical
    # reads use 2-6, so 8 leaves ample headroom before over_budget flags
    max_out: int = 0               # mapping records retained per read on device;
    # 0 (default) derives max_num_hits so -m's full record count is never
    # silently truncated; explicit smaller values trip the out_truncated counter
    packed_extension: bool = True  # word-compare extension (ops.extend_packed)
    chunk: int = 0                 # wire-path inner chunk size: the jitted
    # program processes the batch as a lax.scan over fixed (chunk)-read chunks,
    # so compile time is batch-size-independent and huge batches amortize the
    # per-dispatch tunnel cost. 0 = single program over the whole batch.
    # Semantics note: the expansion pool (expand_budget) is per chunk.

    @property
    def out_slots(self) -> int:
        """Per-read device output slots (MAX_OUT); derived from -m unless set."""
        return self.max_out if self.max_out > 0 else self.max_num_hits
