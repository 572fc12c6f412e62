"""Pallas TPU kernel: streaming row-gather with double-buffered DMA.

This is the Pallas counterpart of the reference's Triton sparse-decode
forward, whose hot operation is "gather k rows of W_dec per token and
weighted-sum them" (reference sae_auto_interp/sae/kernels.py:178-284).  The
decoder matrix stays in HBM; row indices arrive via scalar prefetch so the
kernel can compute DMA source addresses before the body runs
(PrefetchScalarGridSpec pattern from the TPU Pallas guide), and two VMEM
slots overlap the next row's DMA with the current row's copy-out.

`pallas_gather_rows(W, idx)` == `W[idx]` (jnp.take along axis 0).  The jnp
fallback is used automatically off-TPU or when MMSAE_DISABLE_PALLAS=1
(mirroring the reference's SAE_DISABLE_TRITON switch, sae/utils.py:119-129).
"""

from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS_PER_TILE = 8  # rows gathered per grid step


def _gather_kernel(idx_ref, w_hbm, out_ref, scratch, sems):
    """Grid step i copies rows idx[i*T : (i+1)*T] of w_hbm into out_ref via
    double-buffered async DMA."""
    i = pl.program_id(0)
    T = _ROWS_PER_TILE

    def get_dma(slot, j):
        row = idx_ref[i * T + j]
        return pltpu.make_async_copy(
            w_hbm.at[row], scratch.at[slot], sems.at[slot]
        )

    # Warm up: start DMA for the first row of this tile.
    get_dma(0, 0).start()

    def body(j, _):
        slot = jax.lax.rem(j, 2)
        next_slot = jax.lax.rem(j + 1, 2)

        @pl.when(j + 1 < T)
        def _():
            get_dma(next_slot, j + 1).start()

        get_dma(slot, j).wait()
        out_ref[j, :] = scratch[slot]
        return 0

    jax.lax.fori_loop(0, T, body, 0)


def pallas_gather_rows(W: jax.Array, idx: jax.Array, *, interpret: bool = False):
    """W: (L, d), idx: (M,) int32 with M a multiple of 8. Returns W[idx]."""
    M = idx.shape[0]
    d = W.shape[1]
    assert M % _ROWS_PER_TILE == 0, M
    grid = (M // _ROWS_PER_TILE,)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],  # W stays in HBM
        out_specs=pl.BlockSpec(
            (_ROWS_PER_TILE, d),
            lambda i, idx_ref: (i, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, d), W.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, d), W.dtype),
        interpret=interpret,
    )(idx.astype(jnp.int32), W)


def _use_pallas() -> bool:
    if os.environ.get("MMSAE_DISABLE_PALLAS") == "1":
        return False
    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:  # pragma: no cover
        return False


def gather_rows(W: jax.Array, idx: jax.Array) -> jax.Array:
    """W[idx] for a flat idx vector; Pallas on TPU, jnp.take elsewhere."""
    if _use_pallas() and idx.ndim == 1 and idx.shape[0] % _ROWS_PER_TILE == 0:
        return pallas_gather_rows(W, idx)
    return jnp.take(W, idx, axis=0)
