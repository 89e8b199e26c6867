"""Native host runtime: ctypes bindings for the C++ parse/pack fast paths.

The shared library is built lazily from ``sw_native.cpp`` with the system
g++ on first use and cached next to the source (rebuilt when the source is
newer).  Every entry point has a pure-Python/NumPy twin in
:mod:`swtpu.io.fasta` / :mod:`swtpu.utils.bucketing`; callers use
:func:`available` or get ``None`` from :func:`load` and fall back, so the
engine works identically (just slower at ingest) without a toolchain.

Design provenance: the reference's ingest + packing are host C++
(src/FASTAParsers.h:33-138, src/SWSolver.cu:309-359); this module is their
TPU-native equivalent emitting flat int8/int64 buffers instead of per-record
std::strings.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import sys
import threading
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_HERE = Path(__file__).resolve().parent
_SRC = _HERE / "sw_native.cpp"
_LIB = _HERE / "libswnative.so"

_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    """Compile the shared library; returns True on success."""
    cmd = [
        "g++",
        "-O3",
        "-shared",
        "-fPIC",
        "-std=c++17",
        str(_SRC),
        "-o",
        str(_LIB),
    ]
    try:
        proc = subprocess.run(cmd, capture_output=True, text=True, timeout=120)
    except (OSError, subprocess.TimeoutExpired):
        return False
    if proc.returncode != 0:
        print(f"swtpu.native build failed:\n{proc.stderr}", file=sys.stderr)
        return False
    return True


def load() -> Optional[ctypes.CDLL]:
    """Load (building if needed) the native library, or None."""
    global _lib, _build_failed
    if os.environ.get("SWTPU_NO_NATIVE"):
        return None
    if _lib is not None:
        return _lib
    if _build_failed:
        return None
    with _lock:
        if _lib is not None:
            return _lib
        fresh = _LIB.exists() and _LIB.stat().st_mtime >= _SRC.stat().st_mtime
        if not fresh and not _build():
            _build_failed = True
            return None
        try:
            lib = ctypes.CDLL(str(_LIB))
        except OSError:
            _build_failed = True
            return None
        lib.sw_parse_fasta.restype = ctypes.c_int64
        lib.sw_parse_fasta.argtypes = [
            ctypes.c_char_p,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
        ]
        lib.sw_pack_batch.restype = None
        lib.sw_pack_batch.argtypes = [
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int8,
            ctypes.POINTER(ctypes.c_int8),
        ]
        lib.sw_pack_segments.restype = None
        lib.sw_pack_segments.argtypes = [
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int8,
            ctypes.POINTER(ctypes.c_int8),
        ]
        lib.sw_pack_bucket_T.restype = None
        lib.sw_pack_bucket_T.argtypes = [
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int8,
            ctypes.POINTER(ctypes.c_int8),
        ]
        lib.sw_build_signatures.restype = None
        lib.sw_build_signatures.argtypes = [
            ctypes.POINTER(ctypes.c_int8),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int8),
        ]
        _lib = lib
        return _lib


def available() -> bool:
    return load() is not None


def _ptr(arr: np.ndarray, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def parse_fasta_bytes(data: bytes) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Fused parse+encode: FASTA bytes -> (residues int8, offsets int64).

    Returns None when the native library is unavailable (callers fall back
    to the Python parser).  Output is bit-identical to
    swtpu.io.fasta.parse_database's arrays.
    """
    lib = load()
    if lib is None:
        return None
    n = len(data)
    max_records = data.count(b">") + 1
    residues = np.empty(max(n, 1), dtype=np.int8)
    offsets = np.zeros(max_records + 1, dtype=np.int64)
    n_rec = lib.sw_parse_fasta(
        data, n, _ptr(residues, ctypes.c_int8), _ptr(offsets, ctypes.c_int64), max_records
    )
    if n_rec < 0:  # pragma: no cover - capacity bound cannot be exceeded
        return None
    offsets = offsets[: n_rec + 1].copy()
    residues = residues[: int(offsets[-1])].copy()
    return residues, offsets


def pack_batch_native(
    residues: np.ndarray,
    offsets: np.ndarray,
    ids: np.ndarray,
    rows: int,
    width: int,
    pad: int,
) -> Optional[np.ndarray]:
    """Native (rows, width) batch packer; None if the library is missing."""
    lib = load()
    if lib is None:
        return None
    residues = np.ascontiguousarray(residues, dtype=np.int8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    ids32 = np.ascontiguousarray(ids, dtype=np.int32)
    out = np.empty((rows, width), dtype=np.int8)
    lib.sw_pack_batch(
        _ptr(residues, ctypes.c_int8),
        _ptr(offsets, ctypes.c_int64),
        _ptr(ids32, ctypes.c_int32),
        len(ids32),
        rows,
        width,
        pad,
        _ptr(out, ctypes.c_int8),
    )
    return out


def pack_segments_native(
    residues: np.ndarray,
    offsets: np.ndarray,
    ids: np.ndarray,
    starts: np.ndarray,
    width: int,
    pad: int,
) -> Optional[np.ndarray]:
    """Native (rows, width) segment packer; None if the library is missing.

    ids/starts are (rows, s_max) arrays per swtpu.utils.segpack.SegBatch.
    """
    lib = load()
    if lib is None:
        return None
    residues = np.ascontiguousarray(residues, dtype=np.int8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    ids64 = np.ascontiguousarray(ids, dtype=np.int64)
    starts32 = np.ascontiguousarray(starts, dtype=np.int32)
    rows, s_max = ids64.shape
    out = np.empty((rows, width), dtype=np.int8)
    lib.sw_pack_segments(
        _ptr(residues, ctypes.c_int8),
        _ptr(offsets, ctypes.c_int64),
        _ptr(ids64, ctypes.c_int64),
        _ptr(starts32, ctypes.c_int32),
        rows,
        s_max,
        width,
        pad,
        _ptr(out, ctypes.c_int8),
    )
    return out


def pack_bucket_T_native(
    residues: np.ndarray,
    offsets: np.ndarray,
    ids: np.ndarray,
    l2: int,
    bpad: int,
    pad: int,
) -> Optional[np.ndarray]:
    """Native transposed (l2, bpad) wavefront-bucket packer; None if the
    library is missing.  Blocked so both the strided writes and the
    per-subject source streams stay cache-resident."""
    lib = load()
    if lib is None:
        return None
    residues = np.ascontiguousarray(residues, dtype=np.int8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    ids32 = np.ascontiguousarray(ids, dtype=np.int32)
    out = np.empty((l2, bpad), dtype=np.int8)
    lib.sw_pack_bucket_T(
        _ptr(residues, ctypes.c_int8),
        _ptr(offsets, ctypes.c_int64),
        _ptr(ids32, ctypes.c_int32),
        len(ids32),
        l2,
        bpad,
        pad,
        _ptr(out, ctypes.c_int8),
    )
    return out


def build_signatures_native(
    residues: np.ndarray, offsets: np.ndarray, dim: int, k: int, mix: np.ndarray
) -> Optional[np.ndarray]:
    """(n, dim) int8 k-mer presence signatures; None if the library is
    missing.  Must agree bit-for-bit with the NumPy path in
    swtpu.ops.prefilter.database_signatures (tested)."""
    lib = load()
    if lib is None:
        return None
    residues = np.ascontiguousarray(residues, dtype=np.int8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    mix32 = np.ascontiguousarray(mix, dtype=np.uint32)
    n = offsets.shape[0] - 1
    out = np.empty((n, dim), dtype=np.int8)
    lib.sw_build_signatures(
        _ptr(residues, ctypes.c_int8),
        _ptr(offsets, ctypes.c_int64),
        n,
        dim,
        k,
        _ptr(mix32, ctypes.c_uint32),
        _ptr(out, ctypes.c_int8),
    )
    return out
