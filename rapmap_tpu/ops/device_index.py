"""Device-resident quasi index: HBM flat arrays + static engine metadata.

The index lives in HBM as plain jnp arrays (int32 fast path; bigSA/int64 texts
are rejected for now — SURVEY.md §7.3). Static shape/config data rides in a
hashable EngineStatic so jit traces once per (index, config, batch-shape).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from rapmap_tpu.index.format import QuasiIndex


class DeviceQuasiIndex(NamedTuple):
    """Pytree of HBM arrays (everything the mapping kernels touch)."""

    text: jnp.ndarray       # int8 codes, padded tail of zeros
    text2b: jnp.ndarray     # uint32, 16 bases/word (packed-word extension)
    sentbits: jnp.ndarray   # uint32, 2 bits/base sentinel mask
    sa: jnp.ndarray         # int32
    sa_txp: jnp.ndarray     # int32
    kmer_hi: jnp.ndarray    # uint32
    kmer_lo: jnp.ndarray    # uint32
    kmer_b: jnp.ndarray     # int32
    kmer_e: jnp.ndarray     # int32
    prefix_lut: jnp.ndarray # int32, len 4^p + 1
    txp_off: jnp.ndarray    # int32
    txp_len: jnp.ndarray    # int32


@dataclass(frozen=True)
class EngineStatic:
    """Hashable static facts about the index needed at trace time."""

    k: int
    prefix_bases: int
    lookup_steps: int  # binary-search trips covering the largest LUT bucket
    pad_tail: int      # trailing text zero-pad (bounds max read length)

    @staticmethod
    def for_index(idx: QuasiIndex) -> "EngineStatic":
        lut = np.asarray(idx.prefix_lut)
        max_bucket = int(np.max(np.diff(lut))) if len(lut) > 1 else 1
        steps = max(1, int(np.ceil(np.log2(max_bucket + 1))) + 1)
        pad_tail = len(idx.text) - idx.n_text
        return EngineStatic(
            k=idx.k, prefix_bases=idx.prefix_bases, lookup_steps=steps, pad_tail=pad_tail
        )


def upload_index(idx: QuasiIndex) -> tuple[DeviceQuasiIndex, EngineStatic]:
    if np.asarray(idx.sa).dtype == np.int64:
        raise NotImplementedError("bigSA (int64) device path not yet supported")
    dev = DeviceQuasiIndex(
        text=jnp.asarray(np.asarray(idx.text), dtype=jnp.int8),
        text2b=jnp.asarray(np.asarray(idx.text2b), dtype=jnp.uint32),
        sentbits=jnp.asarray(np.asarray(idx.sentbits), dtype=jnp.uint32),
        sa=jnp.asarray(np.asarray(idx.sa), dtype=jnp.int32),
        sa_txp=jnp.asarray(np.asarray(idx.sa_txp), dtype=jnp.int32),
        kmer_hi=jnp.asarray(np.asarray(idx.kmer_hi), dtype=jnp.uint32),
        kmer_lo=jnp.asarray(np.asarray(idx.kmer_lo), dtype=jnp.uint32),
        kmer_b=jnp.asarray(np.asarray(idx.kmer_b), dtype=jnp.int32),
        kmer_e=jnp.asarray(np.asarray(idx.kmer_e), dtype=jnp.int32),
        prefix_lut=jnp.asarray(np.asarray(idx.prefix_lut), dtype=jnp.int32),
        txp_off=jnp.asarray(np.asarray(idx.txp_offsets), dtype=jnp.int32),
        txp_len=jnp.asarray(np.asarray(idx.txp_lens), dtype=jnp.int32),
    )
    return dev, EngineStatic.for_index(idx)
