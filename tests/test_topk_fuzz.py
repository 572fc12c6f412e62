"""Randomized exactness fuzz for every top-k routine: values must match
`lax.top_k` as a multiset, indices must point at their values with no
duplicates, across dtypes, widths, k, and tie-heavy distributions."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.ops import blockmax_top_k, blockwise_top_k, kth_value, top_k

ml_dtypes = pytest.importorskip("ml_dtypes")


@pytest.mark.parametrize("seed", range(12))
def test_topk_fuzz(seed):
    r = np.random.default_rng(seed)
    w = int(r.choice([8192, 32768, 131072]))
    k = int(r.choice([16, 256, 1024]))
    dtype = r.choice([np.float32, ml_dtypes.bfloat16])
    style = int(r.integers(0, 3))
    if style == 0:
        x = r.normal(size=(3, w))
    elif style == 1:
        x = np.maximum(r.normal(size=(3, w)), 0)  # relu zeros
    else:
        x = r.integers(-2, 2, size=(3, w)).astype(float)  # massive ties
    x = x.astype(dtype)
    xj = jnp.asarray(x)
    ref_sorted = np.sort(np.asarray(jax.lax.top_k(xj, k)[0]).astype(np.float32), axis=1)

    candidates = [top_k, blockwise_top_k]
    if k * 64 * 4 <= w:
        candidates.append(blockmax_top_k)
    for fn in candidates:
        v, i = fn(xj, k)
        v = np.asarray(v).astype(np.float32)
        i = np.asarray(i)
        np.testing.assert_array_equal(np.sort(v, axis=1), ref_sorted, err_msg=fn.__name__)
        np.testing.assert_array_equal(
            np.take_along_axis(x, i, 1).astype(np.float32), v, err_msg=fn.__name__
        )
        for row in i:
            assert len(set(row.tolist())) == k, fn.__name__

    kv = np.asarray(kth_value(xj, k)).astype(np.float32)
    np.testing.assert_array_equal(
        kv[:, 0], np.sort(x.astype(np.float32), axis=1)[:, -k]
    )


def test_kth_value_histogram_matches_bitwise_adversarial():
    """The nibble-histogram search must agree bit-for-bit with the
    bit-at-a-time oracle on ties, negatives, infs, and degenerate rows.
    (kth_value dispatches: bitwise for 16-bit keys, histogram for 32-bit —
    both paths are exercised against the oracle here.)"""
    from multimodal_sae_tpu.ops import kth_value_bitwise
    from multimodal_sae_tpu.ops.topk import kth_value_histogram

    rng = np.random.default_rng(7)
    for dtype in (jnp.float32, jnp.bfloat16):
        rows = [
            rng.normal(size=512).astype(np.float32),
            np.zeros(512, np.float32),                      # all ties at 0
            np.full(512, 2.5, np.float32),                  # all ties nonzero
            np.repeat(rng.normal(size=64).astype(np.float32), 8),  # heavy ties
            np.concatenate([np.full(500, -np.inf), rng.normal(size=12)]).astype(np.float32),
            -np.abs(rng.normal(size=512)).astype(np.float32),  # all negative
        ]
        x = jnp.asarray(np.stack(rows)).astype(dtype)
        for k in (1, 7, 256, 511):
            b = np.asarray(kth_value_bitwise(x, k), np.float32)
            for name, fn in (("hist", kth_value_histogram), ("dispatch", kth_value)):
                a = np.asarray(fn(x, k), np.float32)
                np.testing.assert_array_equal(a, b, err_msg=f"{name} {dtype} k={k}")
