"""ctypes bindings for the native host-side data kernels.

The C++ library (native/idgrec_native.cpp) provides the host hot
paths — ratings-file parsing, CSR construction, dense count-matrix
fill, bit packing. Every entry point has a numpy fallback so the
framework works without a toolchain; `available()` reports which path
is active and tests assert native/Python equivalence.

Scanner assumption: the native ratings parser emits (user, item)
pairs and the caller reconstructs per-line structure from uid run
lengths — exact for the reference export format (one line per user).
A malformed file with the SAME uid on two adjacent lines would
collapse into one run here while the Python fallback keeps two
pos_length entries; interaction pairs (what training consumes) are
identical either way.

The library is built on first use with g++ (cached beside the source);
set ``IDGREC_NO_NATIVE=1`` to force the Python fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB: ctypes.CDLL | None = None
_TRIED = False

_SRC_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))), "native")
_SO_PATH = os.path.join(_SRC_DIR, "libidgrec_native.so")

_i64 = ctypes.c_int64
_i64p = ctypes.POINTER(ctypes.c_int64)
_i32p = ctypes.POINTER(ctypes.c_int32)
_i8p = ctypes.POINTER(ctypes.c_int8)
_u8p = ctypes.POINTER(ctypes.c_uint8)
_f32p = ctypes.POINTER(ctypes.c_float)


def _build() -> bool:
    src = os.path.join(_SRC_DIR, "idgrec_native.cpp")
    if not os.path.exists(src):
        return False
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-fPIC", "-shared", "-std=c++17",
             "-o", _SO_PATH, src],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> ctypes.CDLL | None:
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if os.environ.get("IDGREC_NO_NATIVE"):
            return None
        if not os.path.exists(_SO_PATH) and not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO_PATH)
        except OSError:
            return None
        lib.idg_count_ratings.restype = _i64
        lib.idg_count_ratings.argtypes = [ctypes.c_char_p]
        lib.idg_parse_ratings.restype = _i64
        lib.idg_parse_ratings.argtypes = [ctypes.c_char_p, _i64p, _i64p]
        lib.idg_max_ids.restype = None
        lib.idg_max_ids.argtypes = [_i64p, _i64p, _i64, _i64p, _i64p]
        lib.idg_build_csr.restype = None
        lib.idg_build_csr.argtypes = [_i64p, _i64p, _i64, _i64, _i64p, _i32p, _f32p]
        lib.idg_fill_count_matrix.restype = None
        lib.idg_fill_count_matrix.argtypes = [_i64p, _i32p, _i64, _i64, _i8p]
        lib.idg_pack_rows.restype = None
        lib.idg_pack_rows.argtypes = [_i8p, _i64, _i64, _i64, _u8p]
        _LIB = lib
        return _LIB


def available() -> bool:
    return _load() is not None


def _ptr(a: np.ndarray, ctype):
    return a.ctypes.data_as(ctype)


def parse_ratings(path: str) -> tuple[np.ndarray, np.ndarray] | None:
    """Parse a reference-format ratings file ('uid iid iid ...' per
    line) into (users, items) int64 arrays. None => use the Python
    fallback (library unavailable or file unreadable)."""
    lib = _load()
    if lib is None:
        return None
    n = lib.idg_count_ratings(path.encode())
    if n < 0:
        return None
    users = np.empty(n, np.int64)
    items = np.empty(n, np.int64)
    if n:
        wrote = lib.idg_parse_ratings(path.encode(), _ptr(users, _i64p), _ptr(items, _i64p))
        if wrote != n:
            return None
    return users, items


def build_csr(users: np.ndarray, items: np.ndarray, num_users: int) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
    """CSR (row_ptr int64, col_idx int32 sorted per row, vals f32=1)."""
    lib = _load()
    if lib is None:
        return None
    users = np.ascontiguousarray(users, np.int64)
    items = np.ascontiguousarray(items, np.int64)
    n = users.size
    row_ptr = np.empty(num_users + 1, np.int64)
    col_idx = np.empty(n, np.int32)
    vals = np.empty(n, np.float32)
    lib.idg_build_csr(_ptr(users, _i64p), _ptr(items, _i64p), n, num_users,
                      _ptr(row_ptr, _i64p), _ptr(col_idx, _i32p), _ptr(vals, _f32p))
    return row_ptr, col_idx, vals


def fill_count_matrix(row_ptr: np.ndarray, col_idx: np.ndarray,
                      num_users: int, num_items: int,
                      rows_out: int | None = None,
                      cols_out: int | None = None) -> np.ndarray | None:
    """Dense int8 count matrix from CSR; optional zero-padded output
    shape (rows_out, cols_out) — the C fill uses cols_out as the row
    stride, so padding columns/rows stay zero."""
    lib = _load()
    if lib is None:
        return None
    rows_out = rows_out or num_users
    cols_out = cols_out or num_items
    row_ptr = np.ascontiguousarray(row_ptr, np.int64)
    col_idx = np.ascontiguousarray(col_idx, np.int32)
    out = np.zeros((rows_out, cols_out), np.int8)
    lib.idg_fill_count_matrix(_ptr(row_ptr, _i64p), _ptr(col_idx, _i32p),
                              num_users, cols_out, _ptr(out, _i8p))
    return out


def pack_rows(m: np.ndarray, rows_pad: int, cols_pad: int) -> np.ndarray | None:
    """Row-major bit packing into uint8 [rows_pad/8, cols_pad]."""
    lib = _load()
    if lib is None:
        return None
    m = np.ascontiguousarray(m, np.int8)
    out = np.zeros((rows_pad // 8, cols_pad), np.uint8)
    lib.idg_pack_rows(_ptr(m, _i8p), m.shape[0], m.shape[1], cols_pad, _ptr(out, _u8p))
    return out
