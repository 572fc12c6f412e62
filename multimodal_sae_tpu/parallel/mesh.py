"""Device-mesh and sharding helpers — the TPU-native replacement for the
reference's torchrun + NCCL process groups (SURVEY.md §2.9).

The reference's parallelism inventory maps as:

* data parallel (DDP + `dataset.shard`, reference train/sae/sae/__main__.py:164-166,
  trainer.py:334-345) → a 1-D `('data',)` mesh; batches sharded over it,
  parameters replicated; XLA inserts the gradient all-reduces that DDP's
  bucketed NCCL all-reduce performed.
* module sharding (`distribute_modules` + `dist.all_to_all`,
  reference trainer.py:495-538) → a `('module',)` mesh axis; per-device SAE
  parameter stacks and an `all_to_all` inside `shard_map`.
* feature-index sharding (steering/attribution, reference
  launch/features/steering.py:71-78) → host-side static splits (see
  `local_shard_bounds`), results gathered host-side.

Single-controller JAX: there is one global mesh across all hosts; collectives
ride ICI/DCN inside compiled programs, no process-group API.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def get_mesh(
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Sequence[int]] = None,
    devices=None,
) -> Mesh:
    """Build a mesh over all (or the given) devices.

    Default: every device on the `data` axis — the reference's only
    multi-device training topology (pure DP)."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    if shape is None:
        shape = (devices.size,) + (1,) * (len(axis_names) - 1)
    return Mesh(devices.reshape(shape), axis_names)


def data_sharding(mesh: Mesh, ndim: int = 2, axis: str = "data") -> NamedSharding:
    """Shard the leading (batch) dimension over the data axis."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def module_sharding(mesh: Mesh, ndim: int, axis: str = "module") -> NamedSharding:
    """Shard the leading (stacked-hookpoint) dimension over the module axis."""
    return NamedSharding(mesh, P(axis, *([None] * (ndim - 1))))


def local_shard_bounds(n: int, num_shards: int, shard_id: int) -> Tuple[int, int]:
    """[start, end) of `shard_id`'s contiguous chunk of `n` items, matching
    `np.array_split` / HF `dataset.shard(contiguous=True)` semantics (larger
    chunks first) — used for the cache's global row offsets
    (reference launch/cache/cache.py:66-74)."""
    base, rem = divmod(n, num_shards)
    start = shard_id * base + min(shard_id, rem)
    end = start + base + (1 if shard_id < rem else 0)
    return start, end


def shard_dataset_contiguous(dataset, num_shards: int, shard_id: int):
    """Contiguous dataset shard + this shard's global row offset.

    Replaces the reference's `dataset.shard(..., contiguous=True)` +
    all-gathered shard lengths (reference launch/cache/cache.py:61-74): with a
    single controller the offsets are computed directly."""
    n = len(dataset)
    start, end = local_shard_bounds(n, num_shards, shard_id)
    if hasattr(dataset, "select"):
        return dataset.select(range(start, end)), start
    return dataset[start:end], start
