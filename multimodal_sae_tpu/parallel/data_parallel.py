"""In-process data parallelism for the caching flows.

The reference saturates a multi-GPU node with one torchrun process per GPU
(reference README.md:41-56); the multi-process path here mirrors that
(docs/DISTRIBUTED.md).  But the natural JAX posture on a TPU host is ONE
process owning all local chips (how `jax.distributed` brings up pod slices),
and under that posture the cache CLIs could previously use extra local chips
only through `--tp` — megatron shardings whose per-layer all-reduces a
forward-only cache does not need.

`--dp N` instead runs the cache data-parallel *inside* the process: subject
and SAE parameters are replicated onto a `('data',)` mesh over the first N
local devices, and each batch is committed with its leading (row) axis
sharded `P('data')`.  GSPMD then partitions every jitted forward along the
batch with ZERO collectives — each chip computes its rows' hiddens and top-k
independently; only the (B, S, k) results cross back to the host.  Because
the sharding lives entirely in placement, the models' jitted programs are
unchanged (the same pjit placement-only design as tensor_parallel.py).

Semantics: a `--dp N` run feeds the device `N x batch_size` rows per step, so
its output cache is byte-identical to a single-device run at
`batch_size = N x batch_size` (same drop-last boundary, same row-major COO
order) — asserted on the 8-virtual-device CPU mesh in
tests/test_parallel.py.
"""

from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .mesh import get_mesh
from .tensor_parallel import replicate_on_mesh


def shard_subject_model_dp(model, dp: int, axis: str = "data"):
    """Wire `--dp N` from a launch CLI: replicate the subject's params onto a
    `('data',)` mesh over the first `dp` local devices and record the batch
    sharding (`model.batch_sharding`) that the model's jit dispatch points
    apply to incoming rows via `place_rows_padded` (models/llama.py capture,
    models/llava_next.py forward / _embed_multimodal).  Co-resident SAEs
    follow via the shared `parallel.replicate_saes` epilogue (keyed on
    `model.mesh`).

    Returns (model, mesh)."""
    devices = jax.local_devices()
    if dp > len(devices):
        raise ValueError(f"--dp {dp} > local devices ({len(devices)})")
    mesh = get_mesh((axis,), devices=devices[:dp])
    model.params = replicate_on_mesh(model.params, mesh)
    model.mesh = mesh
    model.batch_sharding = NamedSharding(mesh, P(axis))
    return model, mesh


def place_rows(x: jax.Array, sharding: NamedSharding | None):
    """Commit `x` with its leading (row) axis sharded, padding-free: callers
    guarantee divisibility (the cache feeds dp x batch_size rows per step).
    No-op when `sharding` is None (the single-device path)."""
    if sharding is None:
        return x
    spec = sharding.spec
    full = P(*(tuple(spec) + (None,) * (x.ndim - len(spec))))
    return jax.device_put(x, NamedSharding(sharding.mesh, full))


def place_rows_padded(x: jax.Array, sharding: NamedSharding | None):
    """Commit `x` row-sharded even when its leading axis does not divide the
    mesh: pads by repeating the last row, returns (placed, orig_rows) — the
    caller slices results back.  Used for the anyres vision tower, whose
    per-geometry group size is however many distinct images of that geometry
    the batch happens to hold."""
    if sharding is None:
        return x, x.shape[0]
    n = x.shape[0]
    dp = sharding.mesh.devices.size
    pad = (-n) % dp
    if pad:
        import jax.numpy as jnp

        x = jnp.concatenate([x, jnp.repeat(x[-1:], pad, axis=0)], axis=0)
    return place_rows(x, sharding), n
