"""PROTOTYPE (round-3 candidate): derive packed extension words straight
from the wire's 2-bit base bytes, skipping the int8-code round trip.

Today's chunked wire path (ops/wire.py + ops/mmp.scan_batch_paired) does:

    wire b2/bm bytes --_unpack_codes_dev--> (B, L) int8 codes
    codes --comp_flip_batch--> rc lanes
    [fwd; rc] --pack_reads--> (2B, L) uint32 16-base words

i.e. it unpacks 2-bit-packed bases to bytes and then re-packs them into
2-bit-packed words. This module produces the SAME (2B, L) words directly
from (b2, bm) with byte-narrow elementwise passes (arrays stay L/4 and
L/8 wide until the final per-position expansion):

  fwd word derivation: reverse the 2-bit groups within each wire byte
  (wire is little-endian per byte, words are big-endian), build
  byte-aligned 32-bit words, then expand to per-position words with a
  4-phase shift/interleave.

  rc word derivation: rc_word[p] packs comp_flip columns p..p+15, which
  is _rev2_32(complement of the fwd word at base q = L-16-p) — computed
  on a 16-base zero-extended position axis so tail windows fall out, with
  the complement masked by the validity word (N/pad bases must contribute
  0 bits, as pack_reads(comp_flip(...)) produces for NCODE).

VERDICT: measured ~NEUTRAL on the chip — 498.5 ns/read fused vs 523.2
unpack+comp_flip+pack_reads (B=65536, L=76, incl. dispatch + checksum
reductions). XLA already fuses the elementwise unpack->pack chain, so the
apparent round trip never materializes in HBM; the fused form saves ~5%,
within tunnel noise. Kept as a verified bit-level reference (and for any
future context where the int8 view is NOT otherwise needed), not wired
into the engine. See BASELINE.md "Wire-unpack/pack_reads fusion".

Bit-identity vs the production path is checked in __main__ across read
lengths, N bases, and short rows (run: python scripts/proto_wire_packed.py).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp
import numpy as np

from rapmap_tpu.ops.encode import _rev2_32

U8 = np.uint8
U32 = np.uint32


def _rev2_byte(b: jnp.ndarray) -> jnp.ndarray:
    """Reverse the four 2-bit groups within each uint8."""
    lo2 = (b & U8(0x03)) << U8(6)
    lo4 = (b & U8(0x0C)) << U8(2)
    hi4 = (b >> U8(2)) & U8(0x0C)
    hi2 = (b >> U8(6)) & U8(0x03)
    return lo2 | lo4 | hi4 | hi2


def _words_per_position(bytes_be: jnp.ndarray) -> jnp.ndarray:
    """(B, NB) big-endian-per-byte 2-bit groups -> (B, 4*NB) uint32 where
    word[p] packs the 16 bases starting at base position p (zeros beyond)."""
    Bn, NB = bytes_be.shape
    z = jnp.zeros((Bn, 7), dtype=bytes_be.dtype)
    eb = jnp.concatenate([bytes_be, z], axis=1).astype(jnp.uint32)
    # byte-aligned words: Wb[i] = bytes i..i+3 big-endian (positions 4i..4i+15)
    wb = (
        (eb[:, 0:NB + 4] << U32(24))
        | (eb[:, 1:NB + 5] << U32(16))
        | (eb[:, 2:NB + 6] << U32(8))
        | eb[:, 3:NB + 7]
    )  # (B, NB + 4)
    w0 = wb[:, :NB]
    # phase r borrows its r trailing bases from the word 16 BASES later
    w16 = wb[:, 4:NB + 4]
    phases = [w0]
    for r in (1, 2, 3):
        phases.append((w0 << U32(2 * r)) | (w16 >> U32(32 - 2 * r)))
    return jnp.stack(phases, axis=-1).reshape(Bn, 4 * NB)


def _valid2_bytes(bm: jnp.ndarray, nb2: int) -> jnp.ndarray:
    """N-mask bytes (bit j = base 8i+j INVALID) -> b2-layout bytes with the
    2-bit group = 3 where the base is valid, 0 where N/pad."""
    Bn, nbm = bm.shape
    x = ~bm
    lo = jnp.zeros((Bn, nbm), dtype=jnp.uint8)
    hi = jnp.zeros((Bn, nbm), dtype=jnp.uint8)
    for j in range(4):
        lo = lo | (((x >> U8(j)) & U8(1)) * U8(3)) << U8(2 * j)
        hi = hi | (((x >> U8(j + 4)) & U8(1)) * U8(3)) << U8(2 * j)
    both = jnp.stack([lo, hi], axis=-1).reshape(Bn, 2 * nbm)
    return both[:, :nb2]


def packed_words_from_wire(
    b2: jnp.ndarray, bm: jnp.ndarray, L: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Wire bytes -> (fwd_words, rc_words), each (B, L) uint32, bit-identical
    to pack_reads(codes) / pack_reads(comp_flip_batch(codes)) on the codes
    _unpack_codes_dev would produce."""
    Bn, nb2 = b2.shape
    be8 = _rev2_byte(b2)
    v8 = _rev2_byte(_valid2_bytes(bm, nb2))  # same big-endian-per-byte layout
    # 16-base (4-byte) zero head so rc tail windows (base q < 0) index cleanly
    zhead = jnp.zeros((Bn, 4), dtype=jnp.uint8)
    pw = _words_per_position(jnp.concatenate([zhead, be8], axis=1))
    pm = _words_per_position(jnp.concatenate([zhead, v8], axis=1))
    fwd = pw[:, 16 : 16 + L]
    # rc word at flipped position p = rev2(~fwd_word[q] & valid[q]), q = L-16-p
    # -> extended-position column j = q + 16 = L - p, p = 0..L-1 -> j = L..1
    rc_all = _rev2_32((~pw) & pm)
    rc = jnp.flip(rc_all[:, 1 : L + 1], axis=1)
    return fwd, rc


def _reference_path(b2, bm, L):
    from rapmap_tpu.ops.encode import comp_flip_batch
    from rapmap_tpu.ops.extend_packed import pack_reads
    from rapmap_tpu.ops.wire import _unpack_codes_dev

    codes = _unpack_codes_dev(b2, bm, L)
    return pack_reads(codes), pack_reads(comp_flip_batch(codes))


def main():
    from rapmap_tpu.ops.wire import _pack_codes_np

    rng = np.random.default_rng(3)
    for L in (17, 31, 48, 76, 101):
        B = 33
        codes = rng.integers(1, 5, size=(B, L)).astype(np.int8)
        # sprinkle Ns and short rows padded with NCODE
        codes[rng.random((B, L)) < 0.05] = 5
        lens = rng.integers(max(1, L - 20), L + 1, size=B)
        for i in range(B):
            codes[i, lens[i]:] = 5
        b2, bm = _pack_codes_np(codes)
        fwd, rc = packed_words_from_wire(jnp.asarray(b2), jnp.asarray(bm), L)
        rfwd, rrc = _reference_path(jnp.asarray(b2), jnp.asarray(bm), L)
        assert (np.asarray(fwd) == np.asarray(rfwd)).all(), f"fwd mismatch L={L}"
        assert (np.asarray(rc) == np.asarray(rrc)).all(), f"rc mismatch L={L}"
        print(f"L={L}: fwd+rc bit-identical")
    print("OK: wire->packed-words fusion is bit-identical to the engine path")


if __name__ == "__main__":
    main()
