"""Zero-copy split reads + persistent per-split feature indexes.

The canonical `{start}_{end}.safetensors` split files are a bit-parity
surface — they must stay byte-identical to the reference's merged output
(reference sae_auto_interp/features/cache.py:249-280) — so they can never
be re-ordered for read locality.  The fast read path therefore lives
entirely on the reader side:

- `mmap_safetensors` maps a split read-only and returns zero-copy numpy
  views.  The reader no longer pays a full-file memcpy for entries a
  feature filter is about to discard (measured at the flagship 31M-entry /
  128-split layout: `safetensors.load_file`'s copies were ~40% of the
  scoring path's wall time).
- a sidecar `{start}_{end}.featidx` stores the feature-sorted permutation
  of the split (`order`) plus the permuted feature column (`feats`,
  ascending), making a filtered load O(selected entries): two
  `searchsorted` calls per requested feature replace the O(N) membership
  scan + sort `TensorBuffer._load` otherwise runs per split
  (reference loader.py:92-118 pays an O(N) boolean mask per FEATURE).

Sidecars are written by the cache merger at merge time (the data is
already in memory there), self-healed by unfiltered loads (which pay the
full sort anyway), and can be retrofit onto existing caches — including
reference-produced ones — with
`python -m multimodal_sae_tpu.features.split_index <cache_dir>`.
A sidecar validates against the split's current byte size and entry count
and is ignored (then rebuilt) when stale.  `MMSAE_NO_FEATIDX=1` disables
sidecar use and self-healing; `MMSAE_NO_MMAP=1` falls back to
`safetensors.load_file`.  Both exist so either layer can be measured or
ruled out in isolation.
"""

from __future__ import annotations

import json
import mmap
import os
import tempfile
from typing import Dict, Optional, Tuple

import numpy as np

from ..logger import logger

INDEX_SUFFIX = ".featidx"

# safetensors dtype tags -> numpy (the subset a COO cache can contain; BF16
# has no numpy dtype without ml_dtypes, so it falls back to load_file).
_DTYPES = {
    "F64": np.float64,
    "F32": np.float32,
    "F16": np.float16,
    "I64": np.int64,
    "I32": np.int32,
    "I16": np.int16,
    "I8": np.int8,
    "U8": np.uint8,
    "BOOL": np.bool_,
}


class UnsupportedSplitFormat(Exception):
    """The file holds a dtype numpy cannot view zero-copy (e.g. BF16)."""


def mmap_safetensors(path: str) -> Dict[str, np.ndarray]:
    """Read-only zero-copy numpy views over a safetensors file.

    The returned arrays alias the page cache through a shared ``mmap`` (each
    holds a reference, so the mapping lives exactly as long as the views) and
    are marked non-writable.  Raises `UnsupportedSplitFormat` for dtypes
    numpy cannot represent; callers fall back to `safetensors.load_file`.
    """
    with open(path, "rb") as f:
        mapped = mmap.mmap(f.fileno(), 0, access=mmap.ACCESS_READ)
    header_len = int.from_bytes(mapped[:8], "little")
    header = json.loads(mapped[8 : 8 + header_len].decode("utf-8"))
    base = 8 + header_len
    out: Dict[str, np.ndarray] = {}
    for name, spec in header.items():
        if name == "__metadata__":
            continue
        np_dtype = _DTYPES.get(spec["dtype"])
        if np_dtype is None:
            raise UnsupportedSplitFormat(f"{path}: dtype {spec['dtype']}")
        start, end = spec["data_offsets"]
        count = (end - start) // np.dtype(np_dtype).itemsize
        out[name] = np.frombuffer(
            mapped, dtype=np_dtype, count=count, offset=base + start
        ).reshape(spec["shape"])
    return out


def index_path(split_path: str) -> str:
    root, _ext = os.path.splitext(split_path)
    return root + INDEX_SUFFIX


def _disabled() -> bool:
    return os.environ.get("MMSAE_NO_FEATIDX", "") not in ("", "0")


def write_index(
    split_path: str,
    feats: np.ndarray,
    order: Optional[np.ndarray] = None,
) -> bool:
    """Persist the feature-sorted permutation sidecar for one split.

    `feats` is the split's feature column in file order; `order` an optional
    precomputed argsort of it (unstable is fine — consumers re-sort each
    equal-key slice ascending, see loader._feature_slice).  Best-effort:
    returns False (with a warning) instead of raising on unwritable
    directories, since a missing sidecar only costs speed, never
    correctness.  Written via temp + atomic rename so a crash mid-write
    cannot leave a torn index that readers would then trust.
    """
    if _disabled():
        return False
    feats = np.asarray(feats)
    if feats.size and (
        int(feats.min()) < 0 or int(feats.max()) >= np.iinfo(np.int32).max
    ):
        # Corrupt ids; an index over them would be nonsense. Loaders keep
        # their scan path (and surface the corruption there).
        logger.warning(
            f"not indexing {split_path}: feature ids outside int32 range"
        )
        return False
    if feats.shape[0] >= np.iinfo(np.int32).max:
        logger.warning(f"not indexing {split_path}: too many entries for int32")
        return False
    if order is None:
        order = np.argsort(feats, kind=None)
    from safetensors.numpy import save_file

    target = index_path(split_path)
    try:
        split_bytes = os.path.getsize(split_path)
        fd, tmp = tempfile.mkstemp(
            dir=os.path.dirname(target) or ".", suffix=".featidx.tmp"
        )
        os.close(fd)
        try:
            save_file(
                {
                    # Validation rides as a TENSOR, not header metadata:
                    # safetensors serializes the metadata dict through a Rust
                    # HashMap whose key order is per-process random, and the
                    # sidecar must be byte-deterministic (caches produced by
                    # different processes are byte-compared in tests and by
                    # users diffing runs).
                    "meta": np.array(
                        [feats.shape[0], split_bytes], dtype=np.int64
                    ),
                    "order": np.ascontiguousarray(order, dtype=np.int32),
                    "feats": np.ascontiguousarray(feats[order], dtype=np.int32),
                },
                tmp,
            )
            os.replace(tmp, target)
        except BaseException:
            try:
                os.remove(tmp)
            except OSError:
                pass
            raise
    except OSError as e:
        logger.warning(f"could not write feature index {target}: {e}")
        return False
    return True


def read_index(
    split_path: str, n_entries: int
) -> Optional[Tuple[np.ndarray, np.ndarray]]:
    """Load `(order, feats_sorted)` for a split, or None.

    None means absent, disabled, unreadable, or stale — staleness is judged
    by the split's current entry count and byte size (both recorded at write
    time), so a regenerated cache never gets read through an old index.
    """
    if _disabled():
        return None
    target = index_path(split_path)
    try:
        if not os.path.exists(target):
            return None
        data = mmap_safetensors(target)
        meta = data["meta"]
        if meta.shape != (2,) or int(meta[0]) != n_entries or int(
            meta[1]
        ) != os.path.getsize(split_path):
            logger.warning(f"stale feature index ignored: {target}")
            return None
        order, feats = data["order"], data["feats"]
        if order.shape[0] != n_entries or feats.shape[0] != n_entries:
            logger.warning(f"malformed feature index ignored: {target}")
            return None
        return order, feats
    except (OSError, KeyError, ValueError, UnsupportedSplitFormat) as e:
        logger.warning(f"unreadable feature index ignored ({target}): {e}")
        return None


def ensure_index(cache_dir: str, rebuild: bool = False) -> int:
    """Retrofit sidecars onto every `{start}_{end}.safetensors` split under
    `cache_dir/<module>/`.  Returns the number of indexes written.  Works on
    reference-produced caches (the split format is shared)."""
    written = 0
    for module in sorted(os.listdir(cache_dir)):
        module_dir = os.path.join(cache_dir, module)
        if not os.path.isdir(module_dir):
            continue
        for fname in sorted(os.listdir(module_dir)):
            if not fname.endswith(".safetensors"):
                continue
            split_path = os.path.join(module_dir, fname)
            try:
                data = mmap_safetensors(split_path)
            except UnsupportedSplitFormat:
                continue
            locations = data.get("locations")
            if locations is None or locations.ndim != 2 or locations.shape[1] < 3:
                continue
            n = locations.shape[0]
            if not rebuild and read_index(split_path, n) is not None:
                continue
            if write_index(split_path, locations[:, 2]):
                written += 1
    return written


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(
        description="Build .featidx feature-index sidecars for a COO cache "
        "directory (ours or reference-produced)."
    )
    p.add_argument("cache_dir")
    p.add_argument(
        "--rebuild", action="store_true", help="rewrite even valid indexes"
    )
    a = p.parse_args()
    n = ensure_index(a.cache_dir, rebuild=a.rebuild)
    print(f"wrote {n} feature index sidecar(s) under {a.cache_dir}")
