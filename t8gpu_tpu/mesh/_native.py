"""ctypes bindings for the native forest core (native/forest.cc).

Loads native/libt8forest.so when present (build with native/build.sh; the
library is optional — every entry point has a bit-identical NumPy fallback
in forest.py).  Set T8GPU_TPU_NATIVE=0 to force the NumPy paths.
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path

import numpy as np

_LIB = None
_TRIED = False

_I8 = np.ctypeslib.ndpointer(np.int8, flags="C_CONTIGUOUS")
_I32 = np.ctypeslib.ndpointer(np.int32, flags="C_CONTIGUOUS")
_I64 = np.ctypeslib.ndpointer(np.int64, flags="C_CONTIGUOUS")
_U64 = np.ctypeslib.ndpointer(np.uint64, flags="C_CONTIGUOUS")


def _load():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("T8GPU_TPU_NATIVE", "1") == "0":
        return None
    path = Path(__file__).resolve().parents[2] / "native" / "libt8forest.so"
    if not path.exists():
        return None
    lib = ctypes.CDLL(str(path))
    for sym in ("t8f_morton_encode", "t8f_build_faces", "t8f_balance_flags",
                "t8f_match_records"):
        if not hasattr(lib, sym):
            # a .so built before this revision: fall back to NumPy
            # everywhere rather than AttributeError mid-walk (rebuild
            # with native/build.sh to restore the fast paths)
            return None
    lib.t8f_morton_encode.argtypes = [_I64, ctypes.c_int64, ctypes.c_int, _U64]
    lib.t8f_build_faces.argtypes = [
        _I64, _I8, _U64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, _I32, _I32, _I8, _I8, _I8, _I64, _I32, _I8, _I8, _I64]
    lib.t8f_balance_flags.argtypes = [
        _I64, _I8, _U64, ctypes.c_int64, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, _I8]
    lib.t8f_match_records.argtypes = [
        _I64, ctypes.c_int64, _I64, ctypes.c_int64,
        _I64, _I64, _I64, _I64, _I64, _I64, _I64, _I64]
    lib.t8f_match_records.restype = ctypes.c_int
    _LIB = lib
    return _LIB


def available() -> bool:
    return _load() is not None


def faces_core(anchor: np.ndarray, level: np.ndarray, codes: np.ndarray,
               L: int, dim: int, periodic: bool):
    """Native face enumeration; same outputs as Forest._faces_core_numpy."""
    lib = _load()
    n = len(level)
    cap = 2 * dim * n
    f_left = np.empty(cap, np.int32)
    f_right = np.empty(cap, np.int32)
    f_axis = np.empty(cap, np.int8)
    f_sign = np.empty(cap, np.int8)
    f_ldiff = np.empty(cap, np.int8)
    f_offset = np.empty((cap, dim), np.int64)
    b_elem = np.empty(cap, np.int32)
    b_axis = np.empty(cap, np.int8)
    b_sign = np.empty(cap, np.int8)
    counts = np.zeros(2, np.int64)
    lib.t8f_build_faces(
        np.ascontiguousarray(anchor, np.int64), np.ascontiguousarray(level, np.int8),
        np.ascontiguousarray(codes, np.uint64), n, dim, L, int(periodic),
        f_left, f_right, f_axis, f_sign, f_ldiff,
        f_offset.reshape(-1), b_elem, b_axis, b_sign, counts)
    nf, nb = int(counts[0]), int(counts[1])
    return (f_left[:nf].copy(), f_right[:nf].copy(), f_axis[:nf].copy(),
            f_sign[:nf].copy(), f_ldiff[:nf].copy(), f_offset[:nf].copy(),
            b_elem[:nb].copy(), b_axis[:nb].copy(), b_sign[:nb].copy())


def balance_flags(anchor: np.ndarray, level: np.ndarray, codes: np.ndarray,
                  L: int, dim: int, periodic: bool,
                  flags: np.ndarray) -> np.ndarray:
    lib = _load()
    out = np.ascontiguousarray(flags, np.int8).copy()
    lib.t8f_balance_flags(
        np.ascontiguousarray(anchor, np.int64),
        np.ascontiguousarray(level, np.int8),
        np.ascontiguousarray(codes, np.uint64),
        len(level), dim, L, int(periodic), out)
    return out


def match_records(own_cols: np.ndarray, sub_cols: np.ndarray):
    """Native face-record matching (PrismForest._match_records hot core).

    own_cols / sub_cols are C-contiguous [4, n] int64 key columns
    (k1, k2, g1, g2 — most significant first).  Returns index arrays
    (eq_a, eq_b, hang_own, hang_sub, rest) into the stacked rows, in the
    exact order of the NumPy sort-based implementation."""
    lib = _load()
    n = own_cols.shape[1]
    ns = sub_cols.shape[1]
    eq_a = np.empty(n // 2 + 1, np.int64)
    eq_b = np.empty(n // 2 + 1, np.int64)
    hang_own = np.empty(n, np.int64)
    hang_sub = np.empty(n, np.int64)
    rest = np.empty(n, np.int64)
    counts = np.zeros(3, np.int64)
    rc = lib.t8f_match_records(
        np.ascontiguousarray(own_cols, np.int64), n,
        np.ascontiguousarray(sub_cols, np.int64), ns,
        eq_a, eq_b, counts[0:1], hang_own, hang_sub, counts[1:2],
        rest, counts[2:3])
    if rc != 0:
        raise AssertionError("face key shared by >2 leaves")
    ne, nh, nr = int(counts[0]), int(counts[1]), int(counts[2])
    return (eq_a[:ne].copy(), eq_b[:ne].copy(),
            hang_own[:nh].copy(), hang_sub[:nh].copy(), rest[:nr].copy())
