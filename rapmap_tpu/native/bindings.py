"""ctypes bindings for the native library (SA-IS, FASTQ parser).

Auto-builds libtqm_native.so with make on first use when a toolchain exists;
all callers fall back to numpy paths when unavailable.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
import threading

import numpy as np

log = logging.getLogger("tqm.native")

_DIR = os.path.dirname(os.path.abspath(__file__))
_LIB_PATH = os.path.join(_DIR, "libtqm_native.so")
_lock = threading.Lock()
_lib: ctypes.CDLL | None = None
_tried = False


def _load() -> ctypes.CDLL | None:
    global _lib, _tried
    with _lock:
        if _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB_PATH):
            try:
                subprocess.run(
                    ["make", "-C", _DIR, "-s"], check=True, capture_output=True, timeout=120
                )
            except Exception as exc:
                log.warning("native build failed: %s", exc)
                return None
        try:
            lib = ctypes.CDLL(_LIB_PATH)
        except OSError as exc:
            log.warning("native load failed: %s", exc)
            return None
        lib.tqm_sais_u8_i32.restype = ctypes.c_int
        lib.tqm_sais_u8_i32.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.tqm_sais_u8_i64.restype = ctypes.c_int
        lib.tqm_sais_u8_i64.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
        ]
        lib.tqm_chd_build.restype = ctypes.c_int
        lib.tqm_chd_build.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int32, ctypes.c_int32, ctypes.c_uint32, ctypes.c_int32,
            ctypes.c_void_p, ctypes.c_void_p,
        ]
        lib.tqm_fastq_parse.restype = ctypes.c_int64
        lib.tqm_fastq_parse.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def suffix_array(text_codes: np.ndarray) -> np.ndarray:
    """SA-IS over int8/uint8 codes; int32 SA below 2^31, else int64 (bigSA)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    t = np.ascontiguousarray(text_codes, dtype=np.uint8)
    n = len(t)
    big = n >= 2**31 - 2
    sa = np.empty(n, dtype=np.int64 if big else np.int32)
    fn = lib.tqm_sais_u8_i64 if big else lib.tqm_sais_u8_i32
    rc = fn(t.ctypes.data, sa.ctypes.data, n)
    if rc != 0:
        raise RuntimeError(f"tqm_sais failed with code {rc}")
    return sa


def chd_build(
    khi: np.ndarray, klo: np.ndarray, m_bits: int, t_bits: int, seed: int,
    maxd: int = 65535,
):
    """Perfect-hash displacement build over (hi, lo) keys.

    Returns (dir int32 (2^m_bits,), perm int32 (2^t_bits,) row index or -1),
    or None if no displacement assignment was found (caller reseeds)."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    hi = np.ascontiguousarray(khi, dtype=np.uint32)
    lo = np.ascontiguousarray(klo, dtype=np.uint32)
    dirv = np.empty(1 << m_bits, dtype=np.int32)
    perm = np.empty(1 << t_bits, dtype=np.int32)
    rc = lib.tqm_chd_build(
        hi.ctypes.data, lo.ctypes.data, len(hi),
        m_bits, t_bits, seed & 0xFFFFFFFF, maxd,
        dirv.ctypes.data, perm.ctypes.data,
    )
    if rc == -1:
        return None
    if rc != 0:
        raise ValueError(f"tqm_chd_build failed with code {rc}")
    return dirv, perm


def fastq_parse(buf: bytes, max_reads: int, pad_len: int):
    """Parse FASTQ bytes -> (codes (R,pad_len) int8, lens, name_off, name_len,
    seq_off, seq_len, qual_off, consumed_bytes). Incomplete tail not consumed."""
    lib = _load()
    if lib is None:
        raise RuntimeError("native library unavailable")
    codes = np.empty((max_reads, pad_len), dtype=np.int8)
    lens = np.empty(max_reads, dtype=np.int32)
    name_off = np.empty(max_reads, dtype=np.int64)
    name_len = np.empty(max_reads, dtype=np.int32)
    seq_off = np.empty(max_reads, dtype=np.int64)
    seq_len = np.empty(max_reads, dtype=np.int32)
    qual_off = np.empty(max_reads, dtype=np.int64)
    consumed = ctypes.c_int64(0)
    n = lib.tqm_fastq_parse(
        buf, len(buf), max_reads, pad_len,
        codes.ctypes.data, lens.ctypes.data, name_off.ctypes.data,
        name_len.ctypes.data, seq_off.ctypes.data, seq_len.ctypes.data,
        qual_off.ctypes.data, ctypes.byref(consumed),
    )
    if n < 0:
        raise ValueError(f"malformed FASTQ at byte {consumed.value}")
    return codes, lens, name_off, name_len, seq_off, seq_len, qual_off, int(consumed.value), int(n)
