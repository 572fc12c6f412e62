"""Sparse TopK-SAE decoder for TPU.

The reference implements this as a Triton GPU kernel suite
(reference sae_auto_interp/sae/kernels.py: sparse @ W_dec forward, sorted-COO +
atomic-add dW backward, gathered dvals backward, wrapped in a
`TritonDecoder` autograd.Function at kernels.py:403-429, dispatched in
sae_auto_interp/sae/utils.py:108-129).  Atomic-add scatter is the wrong shape
for a TPU, so the backward here is reformulated (SURVEY.md §7 hard part #3):

* forward           y[n]      = Σ_j vals[n, j] * W_dec[idx[n, j]]     (row gather + weighted sum)
* dvals[n, j]       = g[n] · W_dec[idx[n, j]]                          (same gather, dot with g)
* dW_dec            = Sᵀ @ g  where S is the dense scatter of (vals, idx)
                      — built chunk-by-chunk so the (chunk, L) buffer stays
                      small, with the contraction riding the MXU instead of
                      atomic scatter-adds.

Three interchangeable implementations are provided and parity-tested against
each other (mirroring the reference's eager-vs-triton test,
train/sae/tests/test_decode.py:6-20):

* `eager_decode`      — scatter into a dense buffer then matmul; the semantic
                        reference (== reference sae/utils.py:108-111).
* `gather_decode`     — gather-based; cheap at small batch (generation,
                        steering, attribution).
* `sparse_decode`     — public entry: gather forward + custom VJP backward.

For the *training* fast path see `topk_mask_decode`, which never materializes
(vals, idx) at all: it thresholds the dense pre-activations at the k-th value
and runs one dense matmul — the idiomatic MXU formulation.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def _flatten_leading(idx: jax.Array, vals: jax.Array):
    lead = vals.shape[:-1]
    k = vals.shape[-1]
    return idx.reshape(-1, k), vals.reshape(-1, k), lead


def eager_decode(top_indices: jax.Array, top_acts: jax.Array, W_dec: jax.Array):
    """Reference semantics: scatter (vals, idx) into a dense (N, L) buffer and
    matmul with W_dec (reference sae_auto_interp/sae/utils.py:108-111).

    Args:
        top_indices: (..., k) int latent ids.
        top_acts:    (..., k) activations.
        W_dec:       (L, d) decoder matrix.
    Returns:
        (..., d) reconstruction (no decoder bias).
    """
    idx, vals, lead = _flatten_leading(top_indices, top_acts)
    L = W_dec.shape[0]
    dense = scatter_dense(idx, vals, L)
    y = jnp.dot(dense, W_dec, preferred_element_type=vals.dtype)
    return y.reshape(*lead, W_dec.shape[1])


def scatter_dense(idx: jax.Array, vals: jax.Array, width: int) -> jax.Array:
    """Scatter per-row (vals, idx) into a dense (N, width) matrix.

    Indices within a row come from top-k and are therefore unique, which lets
    XLA use the cheaper unique-indices scatter lowering.
    """
    n, k = idx.shape
    dense = jnp.zeros((n, width), dtype=vals.dtype)
    return dense.at[jnp.arange(n)[:, None], idx].add(vals, unique_indices=True)


def gather_decode(top_indices: jax.Array, top_acts: jax.Array, W_dec: jax.Array):
    """Gather rows of W_dec and take the weighted sum. O(N·k·d) memory traffic,
    no dense buffer; the cheap path when N is small."""
    rows = jnp.take(W_dec, top_indices, axis=0)  # (..., k, d)
    return jnp.einsum(
        "...k,...kd->...d", top_acts, rows, preferred_element_type=top_acts.dtype
    )


def _dW_chunked(
    idx: jax.Array, vals: jax.Array, g: jax.Array, L: int, chunk: int = 1024
) -> jax.Array:
    """dW_dec = Sᵀ @ g computed in row chunks: scatter a (chunk, L) slab of the
    dense activation matrix, contract with the matching grad rows on the MXU,
    and accumulate.  Replaces the reference's sorted-COO atomic_add kernel
    (reference sae_auto_interp/sae/kernels.py:10-175)."""
    n, k = idx.shape
    d = g.shape[-1]
    if n <= chunk:
        dense = scatter_dense(idx, vals, L)
        return jnp.dot(dense.T, g, preferred_element_type=jnp.float32).astype(g.dtype)

    pad = (-n) % chunk
    if pad:
        idx = jnp.pad(idx, ((0, pad), (0, 0)))
        vals = jnp.pad(vals, ((0, pad), (0, 0)))
        g = jnp.pad(g, ((0, pad), (0, 0)))
    steps = (n + pad) // chunk
    idx = idx.reshape(steps, chunk, k)
    vals = vals.reshape(steps, chunk, k)
    g = g.reshape(steps, chunk, d)

    def body(acc, xs):
        i, v, gg = xs
        dense = scatter_dense(i, v, L)
        acc = acc + jnp.dot(dense.T, gg, preferred_element_type=jnp.float32)
        return acc, None

    acc0 = jnp.zeros((L, d), dtype=jnp.float32)
    acc, _ = jax.lax.scan(body, acc0, (idx, vals, g))
    return acc.astype(vals.dtype)


@partial(jax.custom_vjp, nondiff_argnums=())
def sparse_decode(top_indices: jax.Array, top_acts: jax.Array, W_dec: jax.Array):
    """y = sparse(top_acts @ one_hot(top_indices)) @ W_dec, differentiable in
    (top_acts, W_dec).  TPU replacement for the reference's `TritonDecoder`
    (reference sae_auto_interp/sae/kernels.py:403-429)."""
    return gather_decode(top_indices, top_acts, W_dec)


def _sparse_decode_fwd(top_indices, top_acts, W_dec):
    y = gather_decode(top_indices, top_acts, W_dec)
    return y, (top_indices, top_acts, W_dec)


def _sparse_decode_bwd(res, g):
    top_indices, top_acts, W_dec = res
    # dvals: gather the same W_dec rows, dot each with the output grad.
    rows = jnp.take(W_dec, top_indices, axis=0)  # (..., k, d)
    d_acts = jnp.einsum(
        "...d,...kd->...k", g, rows, preferred_element_type=g.dtype
    ).astype(top_acts.dtype)
    # dW: chunked dense-transpose matmul.
    idx2, vals2, _ = _flatten_leading(top_indices, top_acts)
    g2 = g.reshape(-1, g.shape[-1])
    dW = _dW_chunked(idx2, vals2, g2, W_dec.shape[0]).astype(W_dec.dtype)
    return None, d_acts, dW


sparse_decode.defvjp(_sparse_decode_fwd, _sparse_decode_bwd)


def topk_mask_decode(
    pre_acts: jax.Array, W_dec: jax.Array, k: int, *, approx: bool = False
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Training fast path: decode the top-k of `pre_acts` without ever
    materializing (vals, idx).

    Thresholds each row at its k-th largest value (threshold treated as a
    constant, matching torch.topk's backward which flows gradient only into
    the selected values) and runs a single dense (N, L) @ (L, d) matmul —
    pure MXU work, no gather/scatter.

    Tie semantics: with float ties at the k-th value, *every* tied latent
    survives the mask, so more than k latents can contribute to the
    reconstruction and receive gradient — unlike `torch.topk`, which keeps
    exactly k (breaking ties arbitrarily).  When the tie value is 0 (common:
    pre-activations are ReLU'd, so rows with < k positive entries tie at 0)
    the extras are zero-valued and contribute nothing; a *nonzero* bf16 tie
    across 131k latents is possible, and then this path distributes the k-th
    slot's reconstruction across all tied latents instead of picking one.
    This is an intentional, documented deviation: correcting to exactly-k
    would need a per-row tie-count-and-fix pass that costs more than the
    drift is worth during training.

    Returns:
        (y, dense_masked, mask): the reconstruction (no bias), the masked
        dense latents, and the boolean selection mask (`pre >= kth`) — the
        mask marks selected latents even when their activation is exactly 0,
        which is what dead-feature bookkeeping needs (the reference scatters
        did_fire from latent_indices regardless of value).
    """
    from .topk import kth_value, top_k

    # Dispatcher, not blockwise_top_k: at (4096, 131072)/k=256 the blockwise
    # reduction does a k-wide top-k in every block (~270 ms) where block-max
    # filtering needs ~23 ms — this line is most of the training step.
    # Once k is too large for cheap block-max filtering (multi-topk's 4k),
    # the bitwise exact k-th value is ~5x cheaper again (35 vs 165 ms at
    # k=1024) and costs the same for any k.
    if approx:
        # Opt-in training-only threshold via the TPU PartialReduce unit
        # (jax.lax.approx_max_k, default aggregate_to_topk=True — the SAFE
        # mode; the raw aggregate_to_topk=False probe is retired, it hangs
        # this platform's compiler). ~0.95-recall k-th value: a few of the
        # true top-k can fall below it and a few extras can pass, so the
        # selected count is ~k not exactly k — tolerable during training
        # (same territory as the tie semantics below), never used on the
        # bit-parity cache path. Wired from TrainConfig.approx_topk.
        kth = jax.lax.approx_max_k(pre_acts, k, recall_target=0.95)[0][..., -1:]
    elif k * 256 <= pre_acts.shape[-1]:
        # assume_finite: pre_acts are ReLU'd by contract (docstring above),
        # so the -inf defense clamp (a materialized copy) is skipped.
        kth = top_k(pre_acts, k, assume_finite=True)[0][..., -1:]
    else:
        kth = kth_value(pre_acts, k)
    kth = jax.lax.stop_gradient(kth)
    mask = pre_acts >= kth
    dense = jnp.where(mask, pre_acts, jnp.zeros_like(pre_acts))
    y = jnp.dot(dense, W_dec, preferred_element_type=pre_acts.dtype)
    return y, dense, mask
