"""In-process data parallelism (`--dp N`) for every feature flow.

The reference saturates a multi-GPU node with one torchrun process per GPU
(reference README.md:41-56); the multi-process path here mirrors that
(docs/DISTRIBUTED.md).  But the natural JAX posture on a TPU host is ONE
process owning all local chips (how `jax.distributed` brings up pod slices),
and under that posture the CLIs could previously use extra local chips only
through `--tp` — megatron shardings whose per-layer all-reduces a
forward-only workload does not need.

`--dp N` instead replicates the subject + SAE parameters onto a `('data',)`
mesh over the first N local devices and commits the flow's embarrassingly
parallel axis `P('data')`; GSPMD then partitions every jitted program along
it with ZERO collectives.  Which axis that is depends on the flow:

* cache / cache_image / train capture — the batch rows (models/llama.py
  capture, models/llava_next.py forward/_embed_multimodal);
* attribution — the vmapped feature chunk, so each chip carries only its
  features' backward tape (features/patching/attribution.py);
* steering — the generate batch (= feature) axis, KV cache included
  (models/llama.py greedy_generate).

Because the sharding lives entirely in placement, the jitted programs are
unchanged (the same pjit placement-only design as tensor_parallel.py).

Semantics: a `--dp N` cache feeds the device `N x batch_size` rows per step,
so its output is byte-identical to a single-device run at
`batch_size = N x batch_size` (same drop-last boundary, same row-major COO
order) — asserted on the 8-virtual-device CPU mesh in
tests/test_launch_integration.py (CLI byte-parity) and tests/test_parallel.py
(bitwise capture parity incl. padded rows, steering parity).
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
