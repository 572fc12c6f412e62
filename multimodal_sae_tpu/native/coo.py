"""ctypes bindings for the native COO kernels (native/coo.cpp) with automatic
build-on-first-use and transparent numpy fallbacks.

The compiled library is cached at native/libmmsae_coo.so; set
MMSAE_DISABLE_NATIVE=1 to force the numpy paths (the dispatch mirrors the
reference's SAE_DISABLE_TRITON toggle, reference sae/utils.py:119-129)."""

from __future__ import annotations

import ctypes
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "coo.cpp"
_LIB = _REPO_ROOT / "native" / "libmmsae_coo.so"

_lib = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            [
                "g++",
                "-O3",
                "-march=native",
                "-shared",
                "-fPIC",
                str(_SRC),
                "-o",
                str(_LIB),
            ],
            check=True,
            capture_output=True,
        )
        return True
    except Exception:
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MMSAE_DISABLE_NATIVE") == "1":
        return None
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        if not _build():
            return None
    try:
        lib = ctypes.CDLL(str(_LIB))
    except OSError:
        return None

    i64p = ctypes.POINTER(ctypes.c_int64)
    f32p = ctypes.POINTER(ctypes.c_float)
    lib.coo_extract_topk.restype = ctypes.c_int64
    lib.coo_extract_topk.argtypes = [
        f32p, i64p,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_float,
        i64p, ctypes.c_int64,
        ctypes.c_int64,
        i64p, f32p,
    ]
    lib.coo_partition_splits.restype = ctypes.c_int64
    lib.coo_partition_splits.argtypes = [
        i64p, f32p, ctypes.c_int64,
        i64p, ctypes.c_int64,
        i64p, i64p, f32p,
    ]
    _lib = lib
    return _lib


def native_available() -> bool:
    return _load() is not None


def _i64p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def _f32p(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_float))


def coo_extract_topk(
    vals: np.ndarray,
    idx: np.ndarray,
    threshold: float = 1e-5,
    filter_ids: Optional[np.ndarray] = None,
    row_offset: int = 0,
) -> Tuple[np.ndarray, np.ndarray]:
    """(B, S, k) top-k values/ids -> (locations (N, 3) int64, activations (N,)
    float32) in row-major order, matching Cache.add_topk's numpy path."""
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    idx = np.ascontiguousarray(idx, dtype=np.int64)
    B, S, K = vals.shape
    lib = _load()
    if lib is None:
        mask = np.abs(vals) > threshold
        if filter_ids is not None:
            mask &= np.isin(idx, filter_ids)
        b, s, j = np.nonzero(mask)
        locations = np.empty((b.shape[0], 3), dtype=np.int64)
        locations[:, 0] = b + row_offset
        locations[:, 1] = s
        locations[:, 2] = idx[b, s, j]
        return locations, vals[mask]

    cap = B * S * K
    out_loc = np.empty((cap, 3), dtype=np.int64)
    out_act = np.empty((cap,), dtype=np.float32)
    if filter_ids is not None:
        filt = np.ascontiguousarray(np.sort(np.asarray(filter_ids, dtype=np.int64)))
        fptr, flen = _i64p(filt), len(filt)
    else:
        filt, fptr, flen = None, ctypes.cast(None, ctypes.POINTER(ctypes.c_int64)), 0
    n = lib.coo_extract_topk(
        _f32p(vals), _i64p(idx), B, S, K,
        ctypes.c_float(threshold), fptr, flen,
        row_offset, _i64p(out_loc), _f32p(out_act),
    )
    return out_loc[:n].copy(), out_act[:n].copy()


def coo_partition_splits(
    locations: np.ndarray,
    activations: np.ndarray,
    boundaries: np.ndarray,
):
    """Partition a COO stream by feature ranges [boundaries[i], boundaries[i+1]).

    Returns a list of (locations_i, activations_i) per split, stable within
    each split."""
    locations = np.ascontiguousarray(locations, dtype=np.int64)
    activations = np.ascontiguousarray(activations, dtype=np.float32)
    boundaries = np.ascontiguousarray(boundaries, dtype=np.int64)
    n_splits = len(boundaries) - 1
    N = len(locations)
    lib = _load()
    if lib is None:
        out = []
        feats = locations[:, 2]
        for i in range(n_splits):
            m = (feats >= boundaries[i]) & (feats < boundaries[i + 1])
            out.append((locations[m], activations[m]))
        return out

    counts = np.zeros(n_splits, dtype=np.int64)
    out_loc = np.empty_like(locations)
    out_act = np.empty_like(activations)
    lib.coo_partition_splits(
        _i64p(locations), _f32p(activations), N,
        _i64p(boundaries), n_splits,
        _i64p(counts), _i64p(out_loc), _f32p(out_act),
    )
    out = []
    start = 0
    for i in range(n_splits):
        end = start + int(counts[i])
        out.append((out_loc[start:end].copy(), out_act[start:end].copy()))
        start = end
    return out
