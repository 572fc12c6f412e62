"""ctypes bindings for the native COO kernels (native/coo.cpp) with automatic
build-on-first-use and transparent numpy fallbacks.

The compiled library is cached at native/libmmsae_coo.so; set
MMSAE_DISABLE_NATIVE=1 to force the numpy paths (the dispatch mirrors the
reference's SAE_DISABLE_TRITON toggle, reference sae/utils.py:119-129)."""

from __future__ import annotations

import ctypes
import mmap
import os
import subprocess
from pathlib import Path
from typing import Optional, Tuple

import numpy as np


def populated_empty(shape, dtype) -> np.ndarray:
    """`np.empty` with pages pre-faulted via MAP_POPULATE.

    On virtualized hosts, first-touch page faults on fresh GB-scale
    allocations can cost ~50 us/page (~0.06 GB/s effective writes) while a
    single MAP_POPULATE mmap populates the same pages ~16x faster (measured
    0.26 s vs 4.2 s for 600 MB); writes to populated pages then stream at
    ~8 GB/s. Falls back to touch-by-fill where MAP_POPULATE is unavailable."""
    dtype = np.dtype(dtype)
    n = int(np.prod(shape))
    nbytes = max(1, n * dtype.itemsize)
    populate = getattr(mmap, "MAP_POPULATE", 0)
    if populate and n:
        try:
            m = mmap.mmap(
                -1, nbytes, flags=mmap.MAP_PRIVATE | mmap.MAP_ANONYMOUS | populate
            )
            return np.frombuffer(m, dtype=dtype, count=n).reshape(shape)
        except (ValueError, OSError):
            pass
    a = np.empty(shape, dtype=dtype)
    a.fill(0)
    return a

_REPO_ROOT = Path(__file__).resolve().parent.parent.parent
_SRC = _REPO_ROOT / "native" / "coo.cpp"
_LIB = _REPO_ROOT / "native" / "libmmsae_coo.so"

_lib = None
_tried = False


def _build() -> bool:
    # Compile to a per-PID temp path and rename into place: writing g++
    # output directly over the .so races other processes that have the old
    # library mapped (truncating a dlopen'd file SIGBUSes them) or are
    # loading it mid-write (review r5). rename is atomic on one filesystem;
    # the old inode stays valid for processes that already mapped it, and
    # concurrent builders simply last-write-wins identical binaries.
    tmp = _LIB.with_suffix(f".so.build.{os.getpid()}")
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
                str(tmp),
            ],
            check=True,
            capture_output=True,
        )
        os.replace(tmp, _LIB)
        return True
    except Exception:
        try:
            tmp.unlink(missing_ok=True)
        except OSError:
            pass
        return False


def _load():
    global _lib, _tried
    if _tried:
        return _lib
    _tried = True
    if os.environ.get("MMSAE_DISABLE_NATIVE") == "1":
        return None
    # A shipped .so without its source (binary-only install) is usable as-is;
    # rebuild only when the source exists and is newer than the binary.
    if not _LIB.exists() or (
        _SRC.exists() and _LIB.stat().st_mtime < _SRC.stat().st_mtime
    ):
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
    # int32-id extract entry point (r5); absent from pre-r5 binary-only .so
    # installs, in which case the wrapper widens to int64 as before.
    if hasattr(lib, "coo_extract_topk_i32"):
        i32p = ctypes.POINTER(ctypes.c_int32)
        lib.coo_extract_topk_i32.restype = ctypes.c_int64
        lib.coo_extract_topk_i32.argtypes = [
            f32p, i32p,
            ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
            ctypes.c_float, i64p, ctypes.c_int64,
            ctypes.c_int64,
            i64p, f32p,
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
    out: Optional[Tuple[np.ndarray, np.ndarray]] = None,
):
    """(B, S, k) top-k values/ids -> (locations (N, 3) int64, activations (N,)
    float32) in row-major order, matching Cache.add_topk's numpy path.

    With `out=(locations (cap, 3) int64, activations (cap,) f32)` the triples
    are written directly into the caller's (pre-touched) buffers and the count
    is returned — avoiding fresh-page allocations whose first-touch faults
    dominate the extraction cost on virtualized hosts."""
    vals = np.ascontiguousarray(vals, dtype=np.float32)
    lib = _load()
    # The device top-k emits int32 ids; read them natively instead of paying
    # a ~100 ms/batch widening pass at the image-headline shape (the output
    # locations are int64 either way — only the input layout differs).
    use_i32 = (
        lib is not None
        and hasattr(lib, "coo_extract_topk_i32")
        and np.asarray(idx).dtype == np.int32
    )
    idx = np.ascontiguousarray(idx, dtype=np.int32 if use_i32 else np.int64)
    B, S, K = vals.shape
    if lib is None:
        mask = np.abs(vals) > threshold
        if filter_ids is not None:
            mask &= np.isin(idx, filter_ids)
        b, s, j = np.nonzero(mask)
        n = b.shape[0]
        if out is not None:
            out_loc, out_act = out
            out_loc[:n, 0] = b + row_offset
            out_loc[:n, 1] = s
            out_loc[:n, 2] = idx[b, s, j]
            out_act[:n] = vals[mask]
            return n
        locations = np.empty((n, 3), dtype=np.int64)
        locations[:, 0] = b + row_offset
        locations[:, 1] = s
        locations[:, 2] = idx[b, s, j]
        return locations, vals[mask]

    cap = B * S * K
    if out is not None:
        out_loc, out_act = out
        assert out_loc.flags.c_contiguous and out_act.flags.c_contiguous
        assert out_loc.shape[0] >= cap and out_act.shape[0] >= cap
    else:
        out_loc = populated_empty((cap, 3), np.int64)
        out_act = populated_empty((cap,), np.float32)
    if filter_ids is not None:
        filt = np.ascontiguousarray(np.sort(np.asarray(filter_ids, dtype=np.int64)))
        fptr, flen = _i64p(filt), len(filt)
    else:
        filt, fptr, flen = None, ctypes.cast(None, ctypes.POINTER(ctypes.c_int64)), 0
    if use_i32:
        n = lib.coo_extract_topk_i32(
            _f32p(vals),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            B, S, K,
            ctypes.c_float(threshold), fptr, flen,
            row_offset, _i64p(out_loc), _f32p(out_act),
        )
    else:
        n = lib.coo_extract_topk(
            _f32p(vals), _i64p(idx), B, S, K,
            ctypes.c_float(threshold), fptr, flen,
            row_offset, _i64p(out_loc), _f32p(out_act),
        )
    if out is not None:
        return n
    return out_loc[:n].copy(), out_act[:n].copy()


def coo_partition_splits(
    locations: np.ndarray,
    activations: np.ndarray,
    boundaries: np.ndarray,
    scratch: Optional[Tuple[np.ndarray, np.ndarray]] = None,
):
    """Partition a COO stream by feature ranges [boundaries[i], boundaries[i+1]).

    Returns a list of (locations_i, activations_i) per split, stable within
    each split.

    `scratch`: optional (locations (cap, 3) int64, activations (cap,) f32)
    pair the partitioned output is written into (and viewed from) when it is
    large enough — a steady-state caller (the streaming writer) reuses one
    pair across chunks instead of paying a fresh-page allocation per batch.
    The returned views alias it: consume them before the next call."""
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
    if (
        scratch is not None
        and scratch[0].ndim == 2
        and scratch[0].shape[0] >= N
        and scratch[0].shape[1] == 3
        and scratch[1].shape[0] >= N
        and scratch[0].flags.c_contiguous
        and scratch[1].flags.c_contiguous
        # dtype legs: the buffers go straight through raw ctypes pointers —
        # a float64 scratch would be reinterpreted as float32 and produce
        # silently corrupt shards (review r5).
        and scratch[0].dtype == np.int64
        and scratch[1].dtype == np.float32
    ):
        out_loc = scratch[0][:N]
        out_act = scratch[1][:N]
    else:
        out_loc = populated_empty(locations.shape, np.int64)
        out_act = populated_empty(activations.shape, np.float32)
    lib.coo_partition_splits(
        _i64p(locations), _f32p(activations), N,
        _i64p(boundaries), n_splits,
        _i64p(counts), _i64p(out_loc), _f32p(out_act),
    )
    out = []
    start = 0
    for i in range(n_splits):
        end = start + int(counts[i])
        # Views, not copies: per-split fresh allocations would re-pay the
        # first-touch fault cost; callers serialize the splits immediately.
        out.append((out_loc[start:end], out_act[start:end]))
        start = end
    return out
