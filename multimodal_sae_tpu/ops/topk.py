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
    if k == width:
        # Degenerate full-width selection (e.g. the fast-attribution
        # top-(k+1) pool at k = width-1): block filtering has nothing to
        # discard — fall through to the exact sort.
        return jax.lax.top_k(x, k)
    if k > width:
        raise ValueError(f"k={k} must be <= width={width}")
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


def _block_filter(x2: jax.Array, k: int, block: int, assume_finite: bool = False):
    """One level of block-max filtering: returns (candidates (n, k*block),
    winning block ids (n, k)).

    The selected blocks move via a one-hot matmul on the MXU: XLA's native
    gather of (n, k) scattered 64-element blocks costs ~20 ms at
    (4096, 2048, 64) on v5e vs ~1.4 ms for the einsum. Exact for any payload:
    each one-hot row has a single 1.0, so the "accumulation" copies the value
    bit-for-bit."""
    from .pallas_topk import _on_tpu, pallas_block_max, use_pallas_block_max

    n, width = x2.shape
    nb = width // block
    if assume_finite:
        # Post-ReLU SAE latents are always finite; the defensive clamp below
        # materializes a full clamped copy of the operand (XLA does not fuse
        # it into the einsum read): +6.5 ms at (4096, 131072) bf16 on v5e.
        blocks = x2.reshape(n, nb, block)
    else:
        # Clamp -inf (masking pattern) to the finite minimum on the einsum
        # operand, where 0 * -inf = NaN would corrupt the gather; max()
        # itself is -inf-safe.
        blocks = jnp.maximum(x2, jnp.finfo(x2.dtype).min).reshape(n, nb, block)
    if use_pallas_block_max(x2, block):
        # Beats XLA's reduce fusion 1.45x at block=128 (7.7 vs 11.1 ms at
        # (4096, 131072) bf16 v5e); ties it at block=64 (the kernel's lane
        # constraint only admits block=128).
        bmax = pallas_block_max(x2, block, interpret=not _on_tpu())
    else:
        bmax = x2.reshape(n, nb, block).max(axis=-1)
    _, bidx = jax.lax.top_k(bmax, k)
    oh = jax.nn.one_hot(bidx, nb, dtype=x2.dtype)  # (n, k, nb)
    # float32 payloads need HIGHEST (a single-pass bf16 MXU product would
    # round them; the multi-pass decomposition reconstructs 1.0*v
    # bit-exactly). bf16 payloads are exact in a single pass already —
    # 1.0*v multiplies exactly and the f32 accumulator only adds zeros.
    precision = (
        jax.lax.Precision.HIGHEST
        if x2.dtype == jnp.float32
        else jax.lax.Precision.DEFAULT
    )
    cand = jnp.einsum(
        "nkb,nbc->nkc",
        oh,
        blocks,
        preferred_element_type=x2.dtype,
        precision=precision,
    )
    return cand.reshape(n, k * block), bidx


def _one_hot_gather_int(table: jax.Array, pos: jax.Array) -> jax.Array:
    """`take_along_axis(table, pos, axis=-1)` for int tables via a one-hot
    MXU matmul — exact for |values| < 2^24 (f32 mantissa).  XLA's native
    per-row gather lowering costs ~10 ms per call at (4096, 256) on v5e where
    the einsum is ~free; the two translation gathers below plus the final
    index sort account for ~20 ms of the cache step without this
    (46.5 -> 66.8 ms measured)."""
    oh = jax.nn.one_hot(pos, table.shape[-1], dtype=jnp.float32)
    out = jnp.einsum(
        "...kj,...j->...k",
        oh,
        table.astype(jnp.float32),
        precision=jax.lax.Precision.HIGHEST,
    )
    return out.astype(table.dtype)


def _permute_payload_bits(vals: jax.Array, oh: jax.Array) -> jax.Array:
    """Apply a one-hot permutation to payloads BIT-EXACTLY for any value.

    Multiplying payload *values* into the one-hot breaks on non-finite
    entries (0 * -inf = NaN), so the raw bits move instead, as 16-bit
    planes through f32 one-hot matmuls (each plane < 2^16, exact in f32),
    then bitcast back.  Exact for ±inf and NaN payloads too."""
    hp = jax.lax.Precision.HIGHEST
    if vals.dtype.itemsize == 2:
        bits = jax.lax.bitcast_convert_type(vals, jnp.uint16)
        p = jnp.einsum("...k,...kj->...j", bits.astype(jnp.float32), oh,
                       precision=hp)
        return jax.lax.bitcast_convert_type(p.astype(jnp.uint16), vals.dtype)
    bits = jax.lax.bitcast_convert_type(vals, jnp.uint32)
    lo = (bits & 0xFFFF).astype(jnp.float32)
    hi = (bits >> 16).astype(jnp.float32)
    lo_s = jnp.einsum("...k,...kj->...j", lo, oh, precision=hp)
    hi_s = jnp.einsum("...k,...kj->...j", hi, oh, precision=hp)
    out = (hi_s.astype(jnp.uint32) << 16) | lo_s.astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(out, vals.dtype)


def sort_pairs_by_index(
    idx: jax.Array, vals: jax.Array, max_index: Optional[int] = None
) -> Tuple[jax.Array, jax.Array]:
    """Sort (idx, vals) ascending by idx along the last axis.

    For the (n, k<=1024) unique-int-index case (top-k output), a rank
    permutation applied with one-hot MXU matmuls: rank_i = #{j: idx_j <
    idx_i} is exact for *unique* indices (top-k positions always are), and
    the permutation moves payload BITS as 16-bit planes (exact f32
    matmuls), so ±inf/NaN payloads survive bit-for-bit — a value-multiply
    formulation would NaN them (0 * -inf).  XLA's `sort_key_val` lowering
    costs ~20 ms composed after the blockmax pipeline at (4096, 256) on
    v5e; this costs <1 ms.  Falls back to `lax.sort_key_val` when the
    exactness preconditions don't hold: wide k, payload itemsize not
    2/4 bytes (e.g. f64), or index values not provably < 2^24 (pass
    `max_index` — e.g. the top-k width — to assert that bound)."""
    k = idx.shape[-1]
    if k > 1024 or vals.dtype.itemsize not in (2, 4) or (
        max_index is None or max_index >= 1 << 24
    ):
        i, v = jax.lax.sort_key_val(idx, vals, dimension=-1)
        return i, v
    ranks = jnp.sum(
        (idx[..., None, :] < idx[..., :, None]).astype(jnp.int32), axis=-1
    )
    oh = jax.nn.one_hot(ranks, k, dtype=jnp.float32)
    vals_s = _permute_payload_bits(vals, oh)
    idx_s = jnp.einsum(
        "...k,...kj->...j",
        idx.astype(jnp.float32),
        oh,
        precision=jax.lax.Precision.HIGHEST,
    ).astype(idx.dtype)
    return idx_s, vals_s


def blockmax_top_k(
    x: jax.Array,
    k: int,
    block: int = 64,
    block2: int = 8,
    assume_finite: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Exact top-k via recursive block-max filtering with one-hot gathers.

    Level 1: take the k blocks (width `block`) with the largest maxima —
    provably a superset of the top-k winners: let v_k be the k-th largest
    value; every element > v_k is a winner, so fewer than k blocks have
    max > v_k and they all sort ahead of blocks with max <= v_k; the
    remaining slots fill with enough v_k-tied blocks to cover k. Ties order
    arbitrarily, like `torch.topk(sorted=False)`.

    Level 2: the same filter applied to the k·block candidates (width
    `block2`), shrinking the final exact `lax.top_k` to k·block2 wide — the
    full-width top-k is the dominant cost on TPU (measured v5e, N=4096,
    width=131072, k=256: full `lax.top_k` ~417 ms; one-level blockmax ~73 ms;
    this ~27 ms). Selected blocks move via one-hot matmuls on the MXU instead
    of XLA gathers (~14x faster).
    """
    width = x.shape[-1]
    lead = x.shape[:-1]
    if k * block > width + (-width) % block:
        # Fewer block maxima than k: level-1 filtering cannot pick k blocks
        # (lax.top_k over the maxima would reject k > num_blocks). Fall back
        # to the generic two-pass selection — exact, and these are small
        # widths where blockmax has no advantage anyway.
        return blockwise_top_k(x, k)
    if not jnp.issubdtype(x.dtype, jnp.floating):
        # The -inf defense clamp and (historically) the pad fill use
        # jnp.finfo; integer inputs crashed at trace time while the
        # narrow-width path accepted them (review r5) — route to the
        # generic exact path instead of an inconsistent ValueError.
        return blockwise_top_k(x, k)
    if width % block:
        # REMOVED pad path (review r5, confirmed by repro): padding with
        # finfo.min mis-ranks pads ABOVE real -inf elements (the pad beats
        # -inf block maxima, and after the clamp it ties AHEAD of real
        # candidates from later-ranked blocks), returning indices past the
        # row end on -inf-dominated rows. Non-divisible widths take the
        # generic exact path; the top_k dispatcher only routes divisible
        # widths here, so the hot shapes (131072 % 64 == 0) are unaffected.
        return blockwise_top_k(x, k)
    # -inf inputs (common masking pattern) are handled by clamping the
    # one-hot gather operand inside `_block_filter` (0 * -inf = NaN there);
    # returned *values* for -inf entries therefore read finfo.min instead of
    # -inf (indices are unaffected). Callers needing literal -inf values
    # back should use blockwise_top_k. `assume_finite=True` skips the clamp
    # (a full materialized copy, +6.5 ms at flagship shape) — safe for
    # post-ReLU latents.
    x2 = x.reshape(-1, width)
    n = x2.shape[0]

    # Index-translation gathers run as one-hot matmuls when exactness allows
    # (values < 2^24): XLA's per-row gather costs ~10 ms/call here.
    use_mm_gather = k <= 1024 and width <= 1 << 24

    def _gather(table, pos):
        if use_mm_gather:
            return _one_hot_gather_int(table, pos)
        return jnp.take_along_axis(table, pos, axis=1)

    cand1, bidx1 = _block_filter(x2, k, block, assume_finite)  # (n, k*block)

    if k * block > 4096 and block % block2 == 0 and block2 > 1:
        # Level-1 candidates are finite even for -inf inputs (clamped there).
        cand2, bidx2 = _block_filter(cand1, k, block2, True)  # (n, k*block2)
        vals, pos2 = jax.lax.top_k(cand2, k)
        # position in level-1 candidate space
        pos1 = _gather(bidx2, pos2 // block2) * block2 + pos2 % block2
    else:
        vals, pos1 = jax.lax.top_k(cand1, k)

    sel_block = _gather(bidx1, pos1 // block)
    idx = sel_block * block + (pos1 % block)
    return vals.reshape(*lead, k), idx.reshape(*lead, k)


def _monotone_key(x: jax.Array) -> jax.Array:
    """float -> unsigned int of the same width with key(a) < key(b) iff a < b
    (NaNs unspecified). f64 -> uint64, f32 -> uint32, bf16/f16 -> uint16.

    The sign-flip transform is IEEE-float-specific (two's-complement ints
    would need bits ^ sign instead), so non-float inputs raise rather than
    silently mis-rank."""
    if not jnp.issubdtype(x.dtype, jnp.floating):
        raise TypeError(f"kth_value requires a float dtype, got {x.dtype}")
    nbits = x.dtype.itemsize * 8
    udtype = {16: jnp.uint16, 32: jnp.uint32, 64: jnp.uint64}[nbits]
    sign = udtype(1 << (nbits - 1))
    bits = jax.lax.bitcast_convert_type(x, udtype)
    return jnp.where(bits & sign != 0, ~bits, bits | sign)


def _key_to_val(key: jax.Array, dtype) -> jax.Array:
    nbits = jnp.dtype(dtype).itemsize * 8
    sign = key.dtype.type(1 << (nbits - 1))
    bits = jnp.where(key & sign != 0, key & ~sign, ~key)
    return jax.lax.bitcast_convert_type(bits, dtype)


def kth_value_bitwise(x: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest value along the last axis, shape (..., 1).

    Bitwise binary search over a monotone integer key: one masked count per
    key bit (16 passes for bf16, 32 for f32), no sorting.  Measured v5e at
    (4096, 131072) bf16: 32.6 ms — XLA streams the uint16 compare+count
    fusion at ~500 GB/s effective, already near the 16-pass memory floor,
    which is why this remains `kth_value`'s dispatch target for 16-bit keys
    (see `kth_value_histogram`)."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    key = _monotone_key(x2)
    nbits = key.dtype.itemsize * 8

    def body(i, t):
        cand = t | (key.dtype.type(1) << (nbits - 1 - i))
        cnt = jnp.sum((key >= cand[:, None]).astype(jnp.int32), axis=1)
        return jnp.where(cnt >= k, cand, t)

    t = jax.lax.fori_loop(0, nbits, body, jnp.zeros((x2.shape[0],), key.dtype))
    return _key_to_val(t, x.dtype).reshape(*lead, 1)


def kth_value(x: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest value along the last axis, shape (..., 1).

    Cost is independent of k — use where k is too large for block-max
    filtering to help (e.g. the AuxK dead-latent threshold at
    k_aux = d_in/2, reference sae.py:207-227, where a full-width
    `lax.top_k` is ~20x slower).  Dispatch measured on v5e at
    (4096, 131072): 16-bit keys -> bitwise search (32.6 ms; the nibble
    histogram does NOT fuse and measures 62.7 ms), 32-bit keys -> nibble
    histogram (8 rounds vs 32 bitwise passes)."""
    if jnp.dtype(x.dtype).itemsize <= 2:
        return kth_value_bitwise(x, k)
    return kth_value_histogram(x, k)


def kth_value_histogram(x: jax.Array, k: int) -> jax.Array:
    """Exact k-th largest value along the last axis, shape (..., 1).

    Nibble-wise histogram binary search over a monotone integer key: each
    round nominally streams the keys once and counts all 16 values of the
    next nibble simultaneously, so bf16 needs 4 rounds and f32 needs 8 — vs
    16/32 for the bit-at-a-time search.

    Measured v5e at (4096, 131072) bf16: 62.7 ms — SLOWER than the 16-pass
    bitwise search (32.6 ms): XLA materializes the (N, C, 16)
    broadcast-compare intermediate instead of fusing it into 16 running
    accumulators (a 16-separate-reduces formulation measures 35.3 ms, and a
    2-round one-hot-einsum byte histogram 213 ms — the per-(n,c)-varying
    one-hot defeats the MXU operand fusion that makes the top-k gathers
    free).  Kept for 32-bit keys, where 8 rounds beat 32 bitwise passes."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1])
    rows = x2.shape[0]
    key = _monotone_key(x2)
    nbits = key.dtype.itemsize * 8
    kdt = key.dtype.type
    lanes = jnp.arange(16, dtype=jnp.uint32)

    # Invariants entering each round (high nibbles above `shift` decided):
    #   t     — decided high bits of the k-th largest key (rest zero)
    #   above — #elements whose decided high bits exceed t's (all rank < k)
    t = jnp.zeros((rows,), key.dtype)
    above = jnp.zeros((rows,), jnp.int32)
    for shift in range(nbits - 4, -4, -4):
        hi = kdt(~kdt(0)) << kdt(shift + 4) if shift + 4 < nbits else kdt(0)
        eq = (key & hi) == (t & hi)[:, None]
        nib = (key >> kdt(shift)).astype(jnp.uint32) & 15
        # hist[r, i] = #elements in row r matching the prefix with nibble i.
        hist = jnp.sum(
            (eq[..., None] & (nib[..., None] == lanes)).astype(jnp.int32),
            axis=1,
        )
        # c[r, i] = #elements ranking >= (prefix | i<<shift); nonincreasing
        # in i, so the chosen nibble is (#i with c_i >= k) - 1.
        suffix = jnp.cumsum(hist[:, ::-1], axis=1)[:, ::-1]
        c = above[:, None] + suffix
        nib_star = jnp.sum((c >= k).astype(jnp.int32), axis=1) - 1
        t = t | (nib_star.astype(key.dtype) << kdt(shift))
        c_pad = jnp.concatenate([c, above[:, None]], axis=1)  # c_16 = above
        above = jnp.take_along_axis(c_pad, nib_star[:, None] + 1, axis=1)[:, 0]
    return _key_to_val(t, x.dtype).reshape(*lead, 1)


def top_k(
    x: jax.Array,
    k: int,
    *,
    num_blocks: Optional[int] = None,
    approx: bool = False,
    recall_target: float = 0.95,
    assume_finite: bool = False,
) -> Tuple[jax.Array, jax.Array]:
    """Top-k over the last axis.

    `approx=True` uses the TPU-accelerated `jax.lax.approx_max_k` (useful for
    training where a tiny recall loss is tolerable). The default is exact:
    block-max filtering for wide axes (where the k winning blocks cover a
    small fraction of the width), blockwise reduction otherwise — both of
    which the bit-exact cache path can rely on.

    `assume_finite=True` promises no -inf/NaN inputs (e.g. post-ReLU SAE
    latents), letting the filter skip a defensive clamp that costs a full
    materialized copy of the operand (+6.5 ms at (4096, 131072) bf16, v5e).
    """
    if approx:
        return jax.lax.approx_max_k(x, k, recall_target=recall_target)
    width = x.shape[-1]
    if num_blocks is None and width >= 32768:
        # Shrink the block until the k winning blocks cover at most 1/4 of
        # the width (the filter must discard most of the row to pay for
        # itself); e.g. k=256 -> block 64, k=1024 (multi-topk 4k) -> block 32.
        # block=128 + the Pallas reduce was measured NET slower at flagship
        # shape (33.2 vs 26.4 ms): the kernel wins the reduce (7.7 vs 11.1 ms
        # at block=128) but the 2x candidate set costs more downstream.
        block = 64
        while block > 8 and k * block * 4 > width:
            block //= 2
        if k * block * 4 <= width and width % block == 0:
            return blockmax_top_k(x, k, block=block, assume_finite=assume_finite)
    return blockwise_top_k(x, k, num_blocks=num_blocks)
