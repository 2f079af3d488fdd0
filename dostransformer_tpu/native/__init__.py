"""Native host-side runtime (C++ via ctypes).

In-repo equivalents of the native kernels the reference gets from its
dependencies (SURVEY.md §2.4): periodic neighbor search (ASE C /
pymatgen) and batch collation (PyG's C++-backed DataLoader). The NumPy
implementations in data/neighbors.py and data/graph.py remain behind the same
call sites as the differential-test oracle and the no-compiler fallback.

Set DOSTPU_NO_NATIVE=1 to force the NumPy paths.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional, Tuple

import numpy as np

_lib = None


def _load() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    if os.environ.get("DOSTPU_NO_NATIVE") == "1":
        return None
    try:
        from dostransformer_tpu.native.build import build

        lib = ctypes.CDLL(build())
        # symbol binding stays INSIDE the try: a stale on-disk .so from an
        # older ABI (build() only compares mtimes) must degrade to the
        # NumPy fallback, not AttributeError out of every collate()
        if lib.dostpu_abi_version() != 3:
            return None
        i64, f32p, i32p, i64p = (ctypes.c_int64,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.POINTER(ctypes.c_int32),
                                 ctypes.POINTER(ctypes.c_int64))
        lib.dostpu_neighbor_list.restype = i64
        lib.dostpu_neighbor_list.argtypes = [
            ctypes.POINTER(ctypes.c_double), i64,
            ctypes.POINTER(ctypes.c_double), ctypes.c_double, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint8), i64, i64p, i64p, i64p,
        ]
        # full argtypes everywhere: without them ctypes converts the int64_t
        # size params through c_int (a 32-bit cap and an ABI accident)
        lib.dostpu_pack_concat_f32.restype = i64
        lib.dostpu_pack_concat_f32.argtypes = [
            f32p, i64p, i64, i64, i64, f32p, f32p]
        lib.dostpu_pack_concat_i32.restype = i64
        lib.dostpu_pack_concat_i32.argtypes = [
            i32p, i64p, i64, i64, i64, i32p]
        lib.dostpu_pack_edges_i32.restype = i64
        lib.dostpu_pack_edges_i32.argtypes = [
            i32p, i64p, i64, i64, i32p, i32p]
    except Exception:
        return None
    _lib = lib
    return _lib


def available() -> bool:
    return _load() is not None


def _dptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_double))


def _iptr(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def neighbor_list_pbc_native(
    positions: np.ndarray,
    cell: np.ndarray,
    cutoff: float,
    pbc: Tuple[bool, bool, bool] = (True, True, True),
    self_interaction: bool = True,
) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """C++ periodic neighbor search; None when the library is unavailable.
    Same contract as data.neighbors.neighbor_list_pbc."""
    lib = _load()
    if lib is None:
        return None
    positions = np.ascontiguousarray(positions, np.float64)
    cell = np.ascontiguousarray(cell, np.float64)
    n = positions.shape[0]
    pbc_arr = np.asarray(pbc, np.uint8)
    pbc_ptr = pbc_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))

    count = lib.dostpu_neighbor_list(_dptr(positions), n, _dptr(cell),
                                     float(cutoff), int(self_interaction),
                                     pbc_ptr, 0, None, None, None)
    if count < 0:
        return None
    src = np.empty(count, np.int64)
    dst = np.empty(count, np.int64)
    shifts = np.empty((count, 3), np.int64)
    got = lib.dostpu_neighbor_list(_dptr(positions), n, _dptr(cell),
                                   float(cutoff), int(self_interaction),
                                   pbc_ptr, count, _iptr(src), _iptr(dst),
                                   _iptr(shifts))
    if got != count:
        return None
    return src, dst, shifts


def _offsets(arrays) -> np.ndarray:
    off = np.zeros(len(arrays) + 1, np.int64)
    np.cumsum([a.shape[0] for a in arrays], out=off[1:])
    return off


def pack_f32(arrays, r: int, c: int, with_mask: bool = True):
    """Pack a list of [n_i, c] float32 arrays into ([B, r, c], mask [B, r]).
    None when the library is unavailable.

    Concat-based marshalling: one np.concatenate (a single C pass) + one
    offsets vector + one library call — the per-array pointer marshalling of
    the naive ctypes design cost MORE than the NumPy slicing loop it
    replaced (measured 0.6x at 4096 samples)."""
    lib = _load()
    if lib is None:
        return None
    b = len(arrays)
    concat = np.ascontiguousarray(
        np.concatenate(arrays, axis=0), np.float32)
    off = _offsets(arrays)
    if concat.shape[1] != c:
        raise ValueError(f"arrays have {concat.shape[1]} columns, expected "
                         f"{c}")
    out = np.zeros((b, r, c), np.float32)
    mask = np.zeros((b, r), np.float32) if with_mask else None
    fptr = ctypes.POINTER(ctypes.c_float)
    status = lib.dostpu_pack_concat_f32(
        concat.ctypes.data_as(fptr), _iptr(off), b, r, c,
        out.ctypes.data_as(fptr),
        mask.ctypes.data_as(fptr) if with_mask else None)
    if status != 0:
        # the kernel checks BEFORE writing; asserts here would strip under
        # python -O and a bad row count would memcpy past the buffer
        raise ValueError(f"a sample exceeds the pinned {r} rows")
    return out, mask


def pack_i32(arrays, r: int, c: int):
    """Pack a list of [n_i, c] int arrays into [B, r, c] int32 (zero pad)."""
    lib = _load()
    if lib is None:
        return None
    b = len(arrays)
    concat = np.ascontiguousarray(np.concatenate(arrays, axis=0), np.int32)
    off = _offsets(arrays)
    if concat.shape[1] != c:
        raise ValueError(f"arrays have {concat.shape[1]} columns, expected "
                         f"{c}")
    out = np.zeros((b, r, c), np.int32)
    iptr32 = ctypes.POINTER(ctypes.c_int32)
    status = lib.dostpu_pack_concat_i32(
        concat.ctypes.data_as(iptr32), _iptr(off), b, r, c,
        out.ctypes.data_as(iptr32))
    if status != 0:
        raise ValueError(f"a sample exceeds the pinned {r} rows")
    return out


def pack_edges(edge_indices, r: int):
    """Pack per-sample [2, e_i] int edge-index arrays into senders/receivers
    [B, r] int32 — the PyG-DataLoader-collation equivalent for edges. The
    transposes are views; ONE concatenate materializes [sum_e, 2] and the
    library splits senders/receivers in the same pass. None when the library
    is unavailable."""
    lib = _load()
    if lib is None:
        return None
    b = len(edge_indices)
    views = [np.asarray(ei).T for ei in edge_indices]
    concat = np.ascontiguousarray(np.concatenate(views, axis=0), np.int32)
    off = _offsets(views)
    senders = np.zeros((b, r), np.int32)
    receivers = np.zeros((b, r), np.int32)
    iptr32 = ctypes.POINTER(ctypes.c_int32)
    status = lib.dostpu_pack_edges_i32(
        concat.ctypes.data_as(iptr32), _iptr(off), b, r,
        senders.ctypes.data_as(iptr32), receivers.ctypes.data_as(iptr32))
    if status != 0:
        raise ValueError(f"a sample exceeds the pinned {r} edge rows")
    return senders, receivers
