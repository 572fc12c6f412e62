"""Native C++ COO kernel parity vs the numpy reference path (the kernel-parity
pattern from SURVEY.md §4, applied to the host runtime)."""

import numpy as np
import pytest

from multimodal_sae_tpu.native import (
    coo_extract_topk,
    coo_partition_splits,
    native_available,
)
from multimodal_sae_tpu.native import coo as coo_mod


def _numpy_extract(vals, idx, threshold, filter_ids, row_offset):
    mask = np.abs(vals) > threshold
    if filter_ids is not None:
        mask &= np.isin(idx, filter_ids)
    b, s, j = np.nonzero(mask)
    locations = np.empty((b.shape[0], 3), dtype=np.int64)
    locations[:, 0] = b + row_offset
    locations[:, 1] = s
    locations[:, 2] = idx[b, s, j]
    return locations, vals[mask]


def test_native_builds():
    assert native_available(), "g++ build of native/coo.cpp failed"


@pytest.mark.parametrize("with_filter", [False, True])
def test_extract_matches_numpy(with_filter):
    rng = np.random.default_rng(0)
    B, S, K, L = 3, 7, 16, 512
    vals = rng.normal(size=(B, S, K)).astype(np.float32)
    vals[vals < 0] = 0.0  # post-relu regime, many zeros
    idx = rng.integers(0, L, size=(B, S, K)).astype(np.int64)
    filt = rng.choice(L, size=50, replace=False).astype(np.int64) if with_filter else None

    loc_n, act_n = coo_extract_topk(vals, idx, 1e-5, filt, row_offset=10)
    loc_r, act_r = _numpy_extract(vals, idx, 1e-5, filt, 10)
    np.testing.assert_array_equal(loc_n, loc_r)
    np.testing.assert_array_equal(act_n, act_r)


def test_partition_matches_numpy():
    rng = np.random.default_rng(1)
    N, L = 5000, 256
    locations = np.stack(
        [
            rng.integers(0, 100, N),
            rng.integers(0, 64, N),
            rng.integers(0, L, N),
        ],
        axis=1,
    ).astype(np.int64)
    activations = rng.normal(size=N).astype(np.float32)
    boundaries = np.array([0, 64, 128, 192, 256], dtype=np.int64)

    parts = coo_partition_splits(locations, activations, boundaries)
    feats = locations[:, 2]
    for i in range(4):
        m = (feats >= boundaries[i]) & (feats < boundaries[i + 1])
        np.testing.assert_array_equal(parts[i][0], locations[m])
        np.testing.assert_array_equal(parts[i][1], activations[m])


def test_fallback_matches_native(monkeypatch):
    rng = np.random.default_rng(2)
    vals = rng.normal(size=(2, 4, 8)).astype(np.float32)
    idx = rng.integers(0, 64, size=(2, 4, 8)).astype(np.int64)
    loc_n, act_n = coo_extract_topk(vals, idx)
    monkeypatch.setattr(coo_mod, "_lib", None)
    monkeypatch.setattr(coo_mod, "_tried", True)
    loc_f, act_f = coo_extract_topk(vals, idx)
    np.testing.assert_array_equal(loc_n, loc_f)
    np.testing.assert_array_equal(act_n, act_f)


def test_extract_int32_ids_match_int64():
    """The i32 entry point (the device top-k's native index dtype) must
    produce byte-identical triples to the int64 path."""
    rng = np.random.default_rng(7)
    B, S, K, L = 4, 33, 16, 131072
    vals = rng.normal(size=(B, S, K)).astype(np.float32)
    vals[vals < 0] = 0.0
    idx64 = rng.integers(0, L, size=(B, S, K)).astype(np.int64)
    idx32 = idx64.astype(np.int32)
    filt = rng.choice(L, size=700, replace=False).astype(np.int64)
    for f in (None, filt):
        loc64, act64 = coo_extract_topk(vals, idx64, 1e-5, f, row_offset=3)
        loc32, act32 = coo_extract_topk(vals, idx32, 1e-5, f, row_offset=3)
        np.testing.assert_array_equal(loc32, loc64)
        np.testing.assert_array_equal(act32, act64)


def test_partition_uniform_nonpow2_stride():
    """Uniform boundaries with a non-power-of-two stride take the division
    fast path; must still match the per-split mask oracle."""
    rng = np.random.default_rng(9)
    N, L = 3000, 96
    locations = np.stack(
        [rng.integers(0, 50, N), rng.integers(0, 9, N), rng.integers(0, L, N)],
        axis=1,
    ).astype(np.int64)
    activations = rng.normal(size=N).astype(np.float32)
    boundaries = np.arange(0, L + 1, 12, dtype=np.int64)  # stride 12
    parts = coo_partition_splits(locations, activations, boundaries)
    feats = locations[:, 2]
    for i in range(len(parts)):
        m = (feats >= boundaries[i]) & (feats < boundaries[i + 1])
        np.testing.assert_array_equal(parts[i][0], locations[m])
        np.testing.assert_array_equal(parts[i][1], activations[m])


def test_partition_scratch_reuse_matches_fresh():
    """With a caller-provided scratch pair the partition must return views
    into it (no fresh allocation) with content identical to the fresh-buffer
    call, including when the scratch is oversized."""
    if not native_available():
        pytest.skip("native build unavailable")
    rng = np.random.default_rng(11)
    N, L = 2048, 512
    locations = np.stack(
        [rng.integers(0, 64, N), rng.integers(0, 16, N), rng.integers(0, L, N)],
        axis=1,
    ).astype(np.int64)
    activations = rng.normal(size=N).astype(np.float32)
    boundaries = np.linspace(0, L, 9).astype(np.int64)

    fresh = coo_partition_splits(locations, activations, boundaries)
    scratch = (
        np.zeros((N + 100, 3), np.int64),
        np.zeros((N + 100,), np.float32),
    )
    reused = coo_partition_splits(locations, activations, boundaries, scratch=scratch)
    for (fl, fa), (rl, ra) in zip(fresh, reused):
        np.testing.assert_array_equal(fl, rl)
        np.testing.assert_array_equal(fa, ra)
        if len(ra):
            assert ra.base is scratch[1] or ra.base is None and len(ra) == 0
    # An undersized scratch is ignored (fresh buffers), not an error.
    small = (np.zeros((4, 3), np.int64), np.zeros((4,), np.float32))
    again = coo_partition_splits(locations, activations, boundaries, scratch=small)
    for (fl, fa), (al, aa) in zip(fresh, again):
        np.testing.assert_array_equal(fl, al)
        np.testing.assert_array_equal(fa, aa)


def test_native_randomized_property_sweep():
    """Seeded fuzz vs the numpy oracle: random shapes, thresholds (incl.
    everything-filtered and everything-kept), negative activations (the
    threshold is on |v|), empty/full filters, and uneven split boundaries
    with empty buckets."""
    if not native_available():
        pytest.skip("native build unavailable")
    rng = np.random.default_rng(42)
    for trial in range(16):
        B = int(rng.integers(1, 6))
        S = int(rng.integers(1, 12))
        K = int(rng.integers(1, 24))
        L = int(rng.integers(K, 800))
        vals = rng.normal(size=(B, S, K)).astype(np.float32)
        if trial % 3 == 0:
            vals[vals < 0] = 0.0  # post-relu
        thresh = [0.0, 1e-5, 0.5, 10.0][trial % 4]  # 10.0 -> usually empty
        idx = rng.integers(0, L, size=(B, S, K)).astype(np.int64)
        filt = None
        if trial % 2:
            nf = int(rng.integers(1, L))
            filt = rng.choice(L, size=nf, replace=False).astype(np.int64)
        off = int(rng.integers(0, 1000))

        loc_n, act_n = coo_extract_topk(vals, idx, thresh, filt, row_offset=off)
        loc_r, act_r = _numpy_extract(vals, idx, thresh, filt, off)
        np.testing.assert_array_equal(loc_n, loc_r, err_msg=str(trial))
        np.testing.assert_array_equal(act_n, act_r, err_msg=str(trial))

        if loc_n.shape[0]:
            nb = int(rng.integers(1, 6))
            cuts = np.unique(rng.integers(0, L, size=nb))
            boundaries = np.concatenate([[0], cuts, [L]]).astype(np.int64)
            boundaries = np.unique(boundaries)
            parts = coo_partition_splits(loc_n, act_n, boundaries)
            feats = loc_n[:, 2]
            assert len(parts) == len(boundaries) - 1
            for i in range(len(parts)):
                m = (feats >= boundaries[i]) & (feats < boundaries[i + 1])
                np.testing.assert_array_equal(parts[i][0], loc_n[m], err_msg=str(trial))
                np.testing.assert_array_equal(parts[i][1], act_n[m], err_msg=str(trial))


def test_partition_ignores_wrong_dtype_or_shape_scratch():
    """The scratch pair feeds raw ctypes pointers: wrong-dtype or 1-D
    buffers must be ignored (fresh allocation) rather than reinterpreted
    into corrupt shards (review r5)."""
    rng = np.random.default_rng(0)
    N = 1000
    locations = np.stack(
        [rng.integers(0, 50, N), rng.integers(0, 8, N), rng.integers(0, 64, N)],
        axis=1,
    ).astype(np.int64)
    activations = rng.normal(size=N).astype(np.float32)
    boundaries = np.array([0, 16, 32, 64], dtype=np.int64)
    ref = coo_partition_splits(locations, activations, boundaries)
    bad_scratches = [
        (np.zeros((N, 3), np.int32), np.zeros(N, np.float32)),  # wrong int dtype
        (np.zeros((N, 3), np.int64), np.zeros(N, np.float64)),  # wrong act dtype
        (np.zeros(N, np.int64), np.zeros(N, np.float32)),  # 1-D locations
    ]
    for scratch in bad_scratches:
        parts = coo_partition_splits(
            locations, activations, boundaries, scratch=scratch
        )
        for (l1, a1), (l2, a2) in zip(parts, ref):
            np.testing.assert_array_equal(l1, l2)
            np.testing.assert_array_equal(a1, a2)
