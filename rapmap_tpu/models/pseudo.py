"""PseudoMapper — kallisto-style k-mer-only mapping engine (SEMANTICS.md §7).

RapMapMapper rebuild (SURVEY.md §3.5): no suffix array; each k-mer hit yields
its CSR occurrence list directly, with jump-ahead of k on hit. Shares the
collation/voting/pair machinery with the quasi engine via collate_batch's
expand_fn hook.
"""

from __future__ import annotations

import math
from dataclasses import dataclass
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from rapmap_tpu.config import MapConfig
from rapmap_tpu.index.format import PseudoIndex
from rapmap_tpu.models.quasi import Counters
from rapmap_tpu.ops import encode as denc
from rapmap_tpu.ops.collate import MapOut, collate_batch
from rapmap_tpu.ops.mmp import ScanHits
from rapmap_tpu.ops.pairs import merge_pairs_batch


class DevicePseudoIndex(NamedTuple):
    kmer_hi: jnp.ndarray
    kmer_lo: jnp.ndarray
    kmer_off: jnp.ndarray  # int32 CSR offsets (n_kmers + 1)
    occ_txp: jnp.ndarray
    occ_pos: jnp.ndarray


@dataclass(frozen=True)
class PseudoStatic:
    k: int
    lookup_steps: int


def upload_pseudo_index(idx: PseudoIndex) -> tuple[DevicePseudoIndex, PseudoStatic]:
    if int(np.asarray(idx.kmer_off)[-1]) >= 2**31:
        raise NotImplementedError("pseudo index with >=2^31 occurrences unsupported")
    dev = DevicePseudoIndex(
        kmer_hi=jnp.asarray(np.asarray(idx.kmer_hi), jnp.uint32),
        kmer_lo=jnp.asarray(np.asarray(idx.kmer_lo), jnp.uint32),
        kmer_off=jnp.asarray(np.asarray(idx.kmer_off), jnp.int32),
        occ_txp=jnp.asarray(np.asarray(idx.occ_txp), jnp.int32),
        occ_pos=jnp.asarray(np.asarray(idx.occ_pos), jnp.int32),
    )
    steps = max(1, math.ceil(math.log2(len(idx.kmer_hi) + 1)) + 1)
    return dev, PseudoStatic(k=idx.k, lookup_steps=steps)


def _pseudo_lookup(didx: DevicePseudoIndex, st: PseudoStatic, key_hi, key_lo):
    """Plain binary search over the whole sorted k-mer list (no prefix LUT)."""
    from jax import lax

    K = didx.kmer_hi.shape[0]
    lo0 = jnp.zeros_like(key_hi, dtype=jnp.int32)
    hi0 = lo0 + K

    def step(_, iv):
        lo, hi = iv
        mid = (lo + hi) >> 1
        m = jnp.clip(mid, 0, max(K - 1, 0))
        vh = didx.kmer_hi[m]
        vl = didx.kmer_lo[m]
        less = (vh < key_hi) | ((vh == key_hi) & (vl < key_lo))
        cont = lo < hi
        return (jnp.where(less & cont, mid + 1, lo), jnp.where(cont & ~less, mid, hi))

    lo_f, _ = lax.fori_loop(0, st.lookup_steps, step, (lo0, hi0))
    idx = jnp.clip(lo_f, 0, max(K - 1, 0))
    found = (lo_f < K) & (didx.kmer_hi[idx] == key_hi) & (didx.kmer_lo[idx] == key_lo)
    b = jnp.where(found, didx.kmer_off[idx], 0)
    e = jnp.where(found, didx.kmer_off[jnp.minimum(idx + 1, K)], 0)
    return found, b, e


def pseudo_scan_batch(
    didx: DevicePseudoIndex, st: PseudoStatic, reads: jnp.ndarray, lens: jnp.ndarray, cfg: MapConfig
) -> ScanHits:
    """k-mer walk with jump-ahead k on hit (SEMANTICS.md §7); lockstep lanes."""
    from jax import lax

    R, L = reads.shape
    k = st.k
    H = cfg.max_hits_per_strand
    key_hi, key_lo, _ = denc.kmer_keys_batch(reads, k)
    next_bad = denc.next_bad_batch(reads, L)

    def at_pos(arr2d, pos, fill):
        v = jnp.take_along_axis(arr2d, jnp.clip(pos, 0, arr2d.shape[1] - 1)[:, None], axis=1)[:, 0]
        return jnp.where(pos < arr2d.shape[1], v, fill)

    zRH = np.zeros((R, H), np.int32)
    hits0 = ScanHits(
        q=zRH, l=zRH, b=zRH, e=zRH,
        n=lens * 0, truncated=lens < 0,
    )

    def running(pos, hits):
        return (pos + k <= lens) & ~hits.truncated

    def cond(state):
        pos, hits = state
        return jnp.any(running(pos, hits))

    def body(state):
        pos, hits = state
        act = running(pos, hits)
        nb = at_pos(next_bad, pos, np.int32(L))
        window_ok = nb >= pos + k
        khi = at_pos(key_hi, pos, np.uint32(0))
        klo = at_pos(key_lo, pos, np.uint32(0))
        found, b, e = _pseudo_lookup(didx, st, khi, klo)
        found = found & window_ok & act
        wide = found & ((e - b) > cfg.max_interval)
        do_hit = found & ~wide
        slot = jnp.clip(hits.n, 0, H - 1)
        overflow = do_hit & (hits.n >= H)
        write = do_hit & ~overflow
        rows = np.arange(R, dtype=np.int32)

        def put(buf, val):
            old = buf[rows, slot]
            return buf.at[rows, slot].set(jnp.where(write, val, old))

        hits = ScanHits(
            q=put(hits.q, pos), l=put(hits.l, pos * 0 + k),
            b=put(hits.b, b), e=put(hits.e, e),
            n=hits.n + write.astype(jnp.int32),
            truncated=hits.truncated | overflow,
        )
        pos_next = jnp.where(
            ~window_ok, nb + 1, jnp.where(do_hit, pos + k, pos + 1)
        )
        return jnp.where(act, pos_next, pos), hits

    _, hits = lax.while_loop(cond, body, (lens * 0, hits0))
    return hits


@partial(jax.jit, static_argnames=("st", "cfg"))
def pseudo_map_batch_se(
    didx: DevicePseudoIndex, st: PseudoStatic, reads, lens, n_valid, cfg: MapConfig
) -> tuple[MapOut, Counters]:
    lanes = jnp.concatenate([reads, denc.revcomp_batch(reads, lens)], axis=0)
    lens2 = jnp.concatenate([lens, lens])
    hits = pseudo_scan_batch(didx, st, lanes, lens2, cfg)

    def expand_fn(p, q):
        from rapmap_tpu.ops.gather import flat_gather

        pc = jnp.clip(p, 0, didx.occ_txp.shape[0] - 1)
        return flat_gather(didx.occ_txp, pc), flat_gather(didx.occ_pos, pc) - q

    out = collate_batch(None, None, hits, lens, cfg, expand_fn=expand_fn)
    B = reads.shape[0]
    real = np.arange(B, dtype=np.int32) < n_valid
    ctr = Counters(
        reads_total=n_valid.astype(jnp.int32),
        reads_mapped=jnp.sum(out.mapped & real, dtype=jnp.int32),
        too_ambiguous=jnp.sum(out.too_ambiguous & real, dtype=jnp.int32),
        over_budget=jnp.sum(out.over_budget & real, dtype=jnp.int32),
        records=jnp.sum(jnp.where(real[:, None], out.t != -1, False), dtype=jnp.int32),
    )
    return out, ctr


@partial(jax.jit, static_argnames=("st", "cfg"))
def pseudo_map_batch_pe(
    didx: DevicePseudoIndex, st: PseudoStatic, r1, l1, r2, l2, n_valid, cfg: MapConfig
):
    o1, _ = pseudo_map_batch_se(didx, st, r1, l1, n_valid, cfg)
    o2, _ = pseudo_map_batch_se(didx, st, r2, l2, n_valid, cfg)
    pairs = merge_pairs_batch(o1, o2, cfg)
    B = r1.shape[0]
    real = np.arange(B, dtype=np.int32) < n_valid
    ctr = Counters(
        reads_total=n_valid.astype(jnp.int32),
        reads_mapped=jnp.sum(pairs.any_record & real, dtype=jnp.int32),
        too_ambiguous=jnp.sum(pairs.too_ambiguous & real, dtype=jnp.int32),
        over_budget=jnp.sum((o1.over_budget | o2.over_budget) & real, dtype=jnp.int32),
        records=jnp.sum(jnp.where(real[:, None], pairs.t != -1, False), dtype=jnp.int32),
    )
    return o1, o2, pairs, ctr


@partial(jax.jit, static_argnames=("st", "cfg", "cap", "B", "L"))
def pseudo_map_batch_se_wire(didx, st, wire_in, cfg: MapConfig, cap: int, B: int, L: int):
    from rapmap_tpu.ops.compact import compact_se
    from rapmap_tpu.ops.wire import pack_out, unpack_in_se

    reads, lens, n_valid = unpack_in_se(wire_in, B, L)
    out, ctr = pseudo_map_batch_se(didx, st, reads, lens, n_valid, cfg)
    return pack_out(compact_se(out, cap), ctr)


@partial(jax.jit, static_argnames=("st", "cfg", "cap", "B", "L"))
def pseudo_map_batch_pe_wire(didx, st, wire_in, cfg: MapConfig, cap: int, B: int, L: int):
    from rapmap_tpu.ops.compact import compact_pe
    from rapmap_tpu.ops.wire import pack_out, unpack_in_pe

    r1, l1, r2, l2, n_valid = unpack_in_pe(wire_in, B, L)
    _, _, pairs, ctr = pseudo_map_batch_pe(didx, st, r1, l1, r2, l2, n_valid, cfg)
    return pack_out(compact_pe(pairs, cap), ctr)


class PseudoMapper:
    """Host-side driver for the pseudo path (same interface as QuasiMapper)."""

    def __init__(self, idx: PseudoIndex, cfg: MapConfig | None = None):
        if cfg is None:
            cfg = MapConfig(k=idx.k)
        if cfg.k != idx.k:
            raise ValueError(f"config k={cfg.k} != index k={idx.k}")
        self.cfg = cfg
        self.didx, self.st = upload_pseudo_index(idx)
        self.txp_names = idx.txp_names
        self.txp_lens = np.asarray(idx.txp_lens)

    def map_se(self, codes, lens, n_valid: int | None = None):
        out, ctr = pseudo_map_batch_se(
            self.didx, self.st, jnp.asarray(codes, jnp.int8), jnp.asarray(lens, jnp.int32),
            jnp.int32(n_valid if n_valid is not None else len(lens)), self.cfg,
        )
        return jax.tree.map(np.asarray, out), jax.tree.map(np.asarray, ctr)

    def map_pe(self, c1, l1, c2, l2, n_valid: int | None = None):
        res = pseudo_map_batch_pe(
            self.didx, self.st,
            jnp.asarray(c1, jnp.int8), jnp.asarray(l1, jnp.int32),
            jnp.asarray(c2, jnp.int8), jnp.asarray(l2, jnp.int32),
            jnp.int32(n_valid if n_valid is not None else len(l1)), self.cfg,
        )
        return tuple(jax.tree.map(np.asarray, x) for x in res)

    def _cap(self, B: int) -> int:
        return 4 * B

    def map_se_async(self, codes, lens, n_valid: int | None = None):
        from rapmap_tpu.ops.wire import pack_in_se

        B, L = codes.shape
        nv = n_valid if n_valid is not None else B
        win = pack_in_se(np.asarray(codes), np.asarray(lens), nv)
        fut = pseudo_map_batch_se_wire(
            self.didx, self.st, jnp.asarray(win), self.cfg, self._cap(B), B, L
        )
        return ("se", B, fut)

    def map_pe_async(self, c1, l1, c2, l2, n_valid: int | None = None):
        from rapmap_tpu.ops.wire import pack_in_pe

        B, L = c1.shape
        nv = n_valid if n_valid is not None else B
        win = pack_in_pe(np.asarray(c1), np.asarray(l1), np.asarray(c2), np.asarray(l2), nv)
        fut = pseudo_map_batch_pe_wire(
            self.didx, self.st, jnp.asarray(win), self.cfg, self._cap(B), B, L
        )
        return ("pe", B, fut)

    @staticmethod
    def fetch(result):
        from rapmap_tpu.ops.wire import unpack_out

        kind, B, fut = result
        return unpack_out(np.asarray(fut), B, 4 if kind == "se" else 7)
