"""Wide top-k selection for TPU.

The reference selects the top-k of 131,072 latents per token with
`torch.topk` (reference sae_auto_interp/sae/sae.py:179-185,
features/cache.py:209-218).  A single `jax.lax.top_k` over such a wide axis is
the throughput pivot on TPU (SURVEY.md §7 hard part #2): XLA lowers it to a
sorting network whose cost grows with the full width.  We instead use an exact
two-pass blockwise reduction:

1. split the latent axis into B blocks and take the per-block top-k
   (every global top-k element is necessarily in its block's top-k);
2. take the top-k of the B*k surviving candidates and translate the winner
   positions back to global indices.

Both passes are `lax.top_k` over much narrower axes, which XLA tiles onto the
VPU far better.  The result is exact (identical *set* of (value, index) pairs;
like `torch.topk(sorted=False)` the intra-k ordering is unspecified).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Optional, Tuple

import jax
import jax.numpy as jnp


def _choose_block_count(width: int, k: int) -> int:
    """Pick a block count. Measured on TPU v5e at width=131072/k=256: block
    sizes of 1024-2048 minimize total time (27.5 ms vs 41 ms for full-width
    lax.top_k and 48 ms for 256-wide blocks), so target ~2048-wide blocks
    subject to each block being at least k wide."""
    if width <= max(4096, 4 * k):
        return 1
    target_block = max(k, 2048)
    num_blocks = max(1, width // target_block)
    # Blocks must evenly divide width for a cheap reshape; walk down to a divisor.
    while num_blocks > 1 and (width % num_blocks != 0 or width // num_blocks < k):
        num_blocks -= 1
    return num_blocks


def blockwise_top_k(
    x: jax.Array, k: int, num_blocks: Optional[int] = None
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k over the last axis using a two-pass block reduction.

    Args:
        x: (..., width) scores.
        k: number of entries to keep.
        num_blocks: optional explicit block count (must divide width and
            leave each block at least k wide). Auto-chosen if None.

    Returns:
        (values, indices), each (..., k). Matches `jax.lax.top_k` as a set;
        values are sorted descending (ties may order differently).
    """
    width = x.shape[-1]
    if k >= width:
        raise ValueError(f"k={k} must be < width={width}")
    if num_blocks is None:
        num_blocks = _choose_block_count(width, k)
    if num_blocks <= 1:
        return jax.lax.top_k(x, k)

    assert width % num_blocks == 0, (width, num_blocks)
    block = width // num_blocks
    assert block >= k, (block, k)

    lead = x.shape[:-1]
    xb = x.reshape(*lead, num_blocks, block)
    # Pass 1: per-block top-k.
    bvals, bidx = jax.lax.top_k(xb, k)  # (..., num_blocks, k)
    offsets = (jnp.arange(num_blocks, dtype=bidx.dtype) * block)[..., None]
    gidx = (bidx + offsets).reshape(*lead, num_blocks * k)
    bvals = bvals.reshape(*lead, num_blocks * k)
    # Pass 2: top-k of the candidates.
    vals, cand_pos = jax.lax.top_k(bvals, k)  # (..., k)
    idx = jnp.take_along_axis(gidx, cand_pos, axis=-1)
    return vals, idx


def blockmax_top_k(
    x: jax.Array, k: int, block: int = 64
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k via block-max filtering: take the k blocks with the largest
    maxima, gather only those k·block candidates, and top-k the candidates.

    Correctness: let v_k be the k-th largest value. Every element > v_k is a
    top-k winner, so fewer than k blocks have max > v_k, and all of them sort
    ahead of any block with max <= v_k — the top-k-by-max block set therefore
    contains every element > v_k plus at least enough v_k-valued ties to fill
    k slots. Ties order arbitrarily, exactly like `torch.topk(sorted=False)`.

    Measured on TPU v5e at width=131072/k=256 (N=4096 rows): selection costs
    ~6.6 ms vs ~27.5 ms for the per-block-sort reduction and ~41 ms for
    full-width `lax.top_k` — the max-reduce replaces the expensive first sort
    pass entirely.
    """
    width = x.shape[-1]
    lead = x.shape[:-1]
    x2 = x.reshape(-1, width)
    n = x2.shape[0]
    pad = (-width) % block
    if pad:
        fill = jnp.full((n, pad), -jnp.inf, dtype=x2.dtype)
        x2 = jnp.concatenate([x2, fill], axis=-1)
        width += pad
    nb = width // block
    blocks = x2.reshape(n, nb, block)
    bmax = blocks.max(axis=-1)  # (n, nb)
    _, bidx = jax.lax.top_k(bmax, k)  # (n, k) winning blocks
    cand = jnp.take_along_axis(blocks, bidx[:, :, None], axis=1)  # (n, k, block)
    cand = cand.reshape(n, k * block)
    vals, pos = jax.lax.top_k(cand, k)
    sel_block = jnp.take_along_axis(bidx, pos // block, axis=1)
    idx = sel_block * block + (pos % block)
    return vals.reshape(*lead, k), idx.reshape(*lead, k)


def top_k(
    x: jax.Array,
    k: int,
    *,
    num_blocks: Optional[int] = None,
    approx: bool = False,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over the last axis.

    `approx=True` uses the TPU-accelerated `jax.lax.approx_max_k` (useful for
    training where a tiny recall loss is tolerable). The default is exact:
    block-max filtering for wide axes (where the k winning blocks cover a
    small fraction of the width), blockwise reduction otherwise — both of
    which the bit-exact cache path can rely on.
    """
    if approx:
        return jax.lax.approx_max_k(x, k, recall_target=recall_target)
    width = x.shape[-1]
    if num_blocks is None and width >= 32768 and k * 64 * 4 <= width:
        return blockmax_top_k(x, k, block=64)
    return blockwise_top_k(x, k, num_blocks=num_blocks)
