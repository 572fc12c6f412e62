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

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_ROWS_PER_TILE = 8  # rows gathered per grid step


def _gather_kernel(idx_ref, w_hbm, out_hbm, sems):
    """Grid step i copies rows idx[i*T : (i+1)*T] of w_hbm straight into the
    HBM output with T concurrent DMAs.  Source and destination both live in
    HBM (untiled), so single-row copies carry no sublane-alignment
    constraints; the T DMAs overlap on the copy engines."""
    i = pl.program_id(0)
    T = _ROWS_PER_TILE

    def get_dma(j):
        # Refs arrive reshaped to (rows, 16, d/16): a one-row copy is then a
        # (16, d/16) slice, satisfying Mosaic's dim-0 sublane-tile alignment.
        row = idx_ref[i * T + j]
        return pltpu.make_async_copy(
            w_hbm.at[row], out_hbm.at[i * T + j], sems.at[j]
        )

    for j in range(T):
        get_dma(j).start()
    for j in range(T):
        get_dma(j).wait()


def pallas_gather_rows(W: jax.Array, idx: jax.Array, *, interpret: bool = False):
    """W: (L, d) with d a multiple of 2048, idx: (M,) int32 with M a multiple
    of 8. Returns W[idx]."""
    M = idx.shape[0]
    L, d = W.shape
    assert M % _ROWS_PER_TILE == 0, M
    assert d % 2048 == 0, d  # (16, d/16) row view needs d/16 % 128 == 0
    grid = (M // _ROWS_PER_TILE,)
    W = W.reshape(L, 16, d // 16)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],  # W stays in HBM
        out_specs=pl.BlockSpec(memory_space=pl.ANY),  # gather straight to HBM
        scratch_shapes=[
            pltpu.SemaphoreType.DMA((_ROWS_PER_TILE,)),
        ],
    )
    out = pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((M, 16, d // 16), W.dtype),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(idx.astype(jnp.int32), W)
    return out.reshape(M, d)


def _use_pallas() -> bool:
    # Opt-in (MMSAE_ENABLE_PALLAS=1): parity-verified on real TPU v5e and in
    # interpreter mode; stays opt-in until its throughput is characterized
    # against XLA's row gather at production shapes (the dev platform's
    # remote-compile path is too slow for reliable microbenchmarks).
    if os.environ.get("MMSAE_DISABLE_PALLAS") == "1":
        # The documented kill switch (review r5: pallas_topk honored it but
        # this kernel did not — the two must agree on the env contract).
        return False
    if os.environ.get("MMSAE_ENABLE_PALLAS") != "1":
        return False
    # TPU devices only: the Mosaic kernel does not lower on GPU, and
    # silently falling into interpret mode there would be a perf trap —
    # non-TPU platforms take the jnp.take path instead.  (Tests drive
    # interpret mode by calling `pallas_gather_rows(..., interpret=True)`.)
    from .pallas_topk import _on_tpu

    return _on_tpu()


def gather_rows(W: jax.Array, idx: jax.Array) -> jax.Array:
    """W[idx] for a flat idx vector; Pallas on TPU, jnp.take elsewhere."""
    if (
        _use_pallas()
        and idx.ndim == 1
        and idx.shape[0] % _ROWS_PER_TILE == 0
        and W.shape[1] % 2048 == 0
    ):
        return pallas_gather_rows(W, idx)
    return jnp.take(W, idx, axis=0)
