"""Host-level collectives for the launch layer.

The reference ends every multi-rank flow in a torch.distributed collective:
`dist.barrier()` before the rank-0 cache merge (reference
sae_auto_interp/features/cache.py:230, launch/cache/cache.py:79-97),
`all_gather_object` -> rank-0 single-file save for attribution (reference
launch/features/attribution_patching.py:50-60), `gather_object` -> rank-0
json for steering (reference launch/features/steering.py:92-106), and
`all_gather_object` for segment scores (reference launch/score/segment.py:156-172).

The TPU-native equivalents ride the same compiled-collective machinery as the
compute path: `multihost_utils.sync_global_devices` for barriers and a
pickle -> uint8 -> `process_allgather` two-phase exchange for arbitrary
Python objects (JAX has no object gather; lengths are gathered first, then
byte payloads padded to the max).  Every entry point is a no-op passthrough
in single-process runs, so world=1 CLIs pay nothing.
"""

from __future__ import annotations

import pickle
from typing import Any, List, Optional


def world_size() -> int:
    import jax

    return jax.process_count()


def barrier(name: str) -> None:
    """Block until every process reaches this point (reference
    `dist.barrier()`, e.g. reference features/cache.py:230).

    `name` must be identical across processes for the same sync point —
    mismatched names indicate divergent control flow and deadlock loudly
    rather than silently pairing the wrong barriers."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


# process_allgather stages each rank's payload through device memory, so a
# single-shot gather of a large result (e.g. a multi-GB attribution merge)
# would claim world_size x payload HBM right when the chips are fullest.
# Chunking bounds the device-resident transient to world_size x _CHUNK_BYTES;
# the reassembled objects live only in host memory.
_CHUNK_BYTES = 32 << 20


def all_gather_objects(obj: Any) -> List[Any]:
    """Gather one picklable object per process; every process receives the
    full rank-ordered list (reference `dist.all_gather_object`,
    e.g. reference launch/features/attribution_patching.py:50-60).

    Two-phase: gather byte lengths, then gather payloads in fixed-size
    chunks (all ranks loop ceil(max_len / chunk) times, so the collective
    schedule stays identical across processes).
    """
    import jax

    if jax.process_count() == 1:
        return [obj]

    import numpy as np
    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8)
    # Lengths ride as TWO int32 halves: under the default x64-disabled JAX
    # config process_allgather silently downcasts int64 to int32, wrapping
    # payloads over 2 GiB negative (review r5 — and this module's docstring
    # explicitly anticipates multi-GB merges).
    n = int(payload.size)
    halves = multihost_utils.process_allgather(
        np.array([n >> 31, n & 0x7FFFFFFF], dtype=np.int32)
    ).reshape(-1, 2)
    lengths = (halves[:, 0].astype(np.int64) << 31) | halves[:, 1].astype(np.int64)
    max_len = int(lengths.max())
    world = lengths.shape[0]
    buffers = [np.empty((int(lengths[r]),), dtype=np.uint8) for r in range(world)]
    for start in range(0, max(max_len, 1), _CHUNK_BYTES):
        chunk = np.zeros((min(_CHUNK_BYTES, max_len - start),), dtype=np.uint8)
        valid = payload[start : start + chunk.size]
        chunk[: valid.size] = valid
        gathered = np.asarray(multihost_utils.process_allgather(chunk))
        for r in range(world):
            take = min(chunk.size, int(lengths[r]) - start)
            if take > 0:
                buffers[r][start : start + take] = gathered[r, :take]
    return [pickle.loads(buffers[r].tobytes()) for r in range(world)]


def gather_objects(obj: Any, root: int = 0) -> Optional[List[Any]]:
    """Gather objects to `root`; returns the rank-ordered list there and
    None elsewhere (reference `dist.gather_object`, launch steering.py:92-106).

    JAX collectives are symmetric, so this is an all-gather with non-root
    results discarded — same traffic, simpler failure modes."""
    import jax

    objs = all_gather_objects(obj)
    return objs if jax.process_index() == root else None
