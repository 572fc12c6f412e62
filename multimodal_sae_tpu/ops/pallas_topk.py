"""Pallas TPU kernel for the block-max reduce of the wide top-k hot path.

Measured reality (v5e, (4096, 131072) bf16): the kernel beats XLA's reduce
fusion 1.45x at block=128 (7.7 vs 11.1 ms) and TIES it at block=64 (7.7 ms
both) — and the block=64 filter wins end-to-end because its candidate set is
half the size, so the dispatcher in ops/topk.py no longer prefers this
kernel (the r1 "fused reduce reclaims the scheduling residue" hypothesis did
not survive measurement; the residue turned out to be gather/sort lowerings,
fixed with one-hot MXU matmuls in ops/topk.py).  The kernel stays available
for block=128 shapes and as the template for future fused-epilogue work.

Fills the role of the reference's Triton block-sparse kernels as the
"custom kernel under the top-k SAE hot path" (reference
sae_auto_interp/sae/kernels.py:403-429) — the TPU-shaped operation is a
block-max filter feeding exact narrow top-ks, not a scatter/gather.

Mosaic layout rules (probed on v5e in round 1):
  * an output tile's last dim must be a multiple of 128 or the full array
    width — so the kernel tiles the width as (block * 128)-wide super-tiles,
    giving output tiles exactly 128 lanes wide;
  * `reshape(tn, 128, block).max(-1)` lowers only when the reshaped last dim
    is the native lane width, so the kernel requires block == 128 (the
    dispatcher in ops/topk.py selects block 128 when this kernel is usable:
    for k=256 @ 131072 the filter keeps k*128 = 1/4 of the row, same
    candidate budget as the XLA block-64 path at half the block count).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANE = 128


def _bmax_kernel(z_ref, out_ref, *, block: int):
    tn = z_ref.shape[0]
    z = z_ref[:]
    out_ref[:] = z.reshape(tn, _LANE, block).max(axis=-1)


@functools.partial(jax.jit, static_argnames=("block", "interpret"))
def pallas_block_max(
    z: jax.Array, block: int = 128, *, interpret: bool = False
) -> jax.Array:
    """Per-block max over the last axis: (N, W) -> (N, W // block), block b
    covering the contiguous slice [b*block, (b+1)*block).  Bit-exact (a max
    never rounds).  Requires `supports(z, block)`."""
    n, w = z.shape
    tws = block * _LANE
    tn = _row_tile(n, z.dtype)
    grid = (n // tn, w // tws)
    return pl.pallas_call(
        functools.partial(_bmax_kernel, block=block),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tn, tws), lambda i, j: (i, j), memory_space=pltpu.VMEM)
        ],
        out_specs=pl.BlockSpec(
            (tn, _LANE), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n, w // block), z.dtype),
        interpret=interpret,
    )(z)


def _row_tile(n: int, dtype) -> int:
    """Rows per grid step: keep the input tile <= 4 MB — Mosaic's scoped VMEM
    limit is 16 MB and it double-buffers both operands (measured on v5e: a
    f32 (128, 16384) tile OOMs at 16.12M/16M) — and respect the dtype's
    sublane minimum."""
    itemsize = jnp.dtype(dtype).itemsize
    sublane_min = 16 if itemsize == 2 else 8
    cap = (4 * 1024 * 1024) // (_LANE * _LANE * itemsize)  # rows per 4MB tile
    for tn in (128, 64, 32, 16, 8):
        if tn <= cap and tn >= sublane_min and n % tn == 0:
            return tn
    return 0


def supports(z: jax.Array, block: int) -> bool:
    """Shape/dtype legality of `pallas_block_max` (independent of platform)."""
    if z.ndim != 2 or block != _LANE:
        return False
    n, w = z.shape
    if w % (block * _LANE) != 0:
        return False
    if jnp.dtype(z.dtype).itemsize not in (2, 4):
        return False
    return _row_tile(n, z.dtype) != 0


@functools.lru_cache(maxsize=1)
def _on_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def use_pallas_block_max(z: jax.Array, block: int) -> bool:
    """Auto-on for TPU (parity-verified there and in interpret mode);
    MMSAE_DISABLE_PALLAS=1 opts out, MMSAE_ENABLE_PALLAS=1 forces it on other
    platforms (interpret-mode tests)."""
    if os.environ.get("MMSAE_DISABLE_PALLAS") == "1":
        return False
    if not supports(z, block):
        return False
    if os.environ.get("MMSAE_ENABLE_PALLAS") == "1":
        return True
    return _on_tpu()
