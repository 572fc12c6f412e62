"""Kernel parity tests, modeled on the reference's eager-vs-triton decoder test
(reference train/sae/tests/test_decode.py:6-20): every custom formulation is
checked against the straightforward eager implementation."""

import os
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sae_tpu.ops import (
    blockmax_top_k,
    blockwise_top_k,
    eager_decode,
    gather_decode,
    geometric_median,
    sparse_decode,
    topk_mask_decode,
)


def _topk_set(vals, idx):
    return {(int(i), float(np.round(v, 4))) for i, v in zip(np.ravel(idx), np.ravel(vals))}


@pytest.mark.parametrize("width,k,blocks", [(1024, 16, 8), (4096, 64, None), (8192, 32, 16)])
def test_blockwise_topk_matches_lax(width, k, blocks):
    x = jax.random.normal(jax.random.PRNGKey(0), (4, width))
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = blockwise_top_k(x, k, num_blocks=blocks)
    # Same set of (index, value) pairs per row.
    for r in range(x.shape[0]):
        assert _topk_set(v[r], i[r]) == _topk_set(v_ref[r], i_ref[r])
    # Values sorted descending.
    assert bool(jnp.all(v[:, :-1] >= v[:, 1:]))


@pytest.mark.parametrize("width,k,block", [(8192, 16, 64), (4096, 8, 32), (4100, 8, 32)])
def test_blockmax_topk_matches_lax(width, k, block):
    x = jax.random.normal(jax.random.PRNGKey(5), (6, width))
    v_ref, i_ref = jax.lax.top_k(x, k)
    v, i = blockmax_top_k(x, k, block=block)
    for r in range(x.shape[0]):
        assert _topk_set(v[r], i[r]) == _topk_set(v_ref[r], i_ref[r])


def test_blockmax_topk_clustered_winners():
    # All winners inside a couple of blocks (the stress case for the
    # top-k-by-block-max filter) plus ties at the k-th value.
    x = jnp.zeros((1, 4096))
    x = x.at[0, 100:108].set(5.0)  # 8 winners in one block
    x = x.at[0, 2000:2004].set(3.0)  # 4 tied at the boundary
    x = x.at[0, 3000:3004].set(3.0)  # 4 more ties than slots
    v, i = blockmax_top_k(x, 10, block=64)
    v = np.sort(np.asarray(v[0]))[::-1]
    assert (v[:8] == 5.0).all() and (v[8:] == 3.0).all()


def test_blockmax_topk_leading_dims():
    x = jax.random.normal(jax.random.PRNGKey(6), (2, 3, 8192))
    v, i = blockmax_top_k(x, 4)
    v_ref, i_ref = jax.lax.top_k(x, 4)
    np.testing.assert_allclose(np.sort(v), np.sort(v_ref), rtol=1e-6)


def test_blockwise_topk_relu_ties():
    # Many zeros (post-ReLU regime): still selects a valid top-k set.
    x = jnp.zeros((2, 512)).at[0, 5].set(3.0).at[0, 100].set(1.0)
    v, i = blockwise_top_k(x, 4, num_blocks=4)
    assert float(v[0, 0]) == 3.0 and int(i[0, 0]) == 5
    assert float(v[0, 1]) == 1.0 and int(i[0, 1]) == 100


def _random_sparse(key, n, k, L, d):
    k1, k2, k3 = jax.random.split(key, 3)
    pre = jax.nn.relu(jax.random.normal(k1, (n, L)))
    vals, idx = jax.lax.top_k(pre, k)
    W = jax.random.normal(k3, (L, d)) / (d**0.5)
    return vals, idx, W, pre


def test_decode_parity():
    vals, idx, W, _ = _random_sparse(jax.random.PRNGKey(1), n=32, k=8, L=256, d=64)
    y_eager = eager_decode(idx, vals, W)
    y_gather = gather_decode(idx, vals, W)
    y_sparse = sparse_decode(idx, vals, W)
    np.testing.assert_allclose(y_eager, y_gather, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(y_eager, y_sparse, rtol=1e-5, atol=1e-5)


def test_decode_batched_leading_dims():
    vals, idx, W, _ = _random_sparse(jax.random.PRNGKey(2), n=12, k=4, L=128, d=32)
    vals3 = vals.reshape(3, 4, 4)
    idx3 = idx.reshape(3, 4, 4)
    y = sparse_decode(idx3, vals3, W)
    assert y.shape == (3, 4, 32)
    np.testing.assert_allclose(
        y.reshape(12, 32), eager_decode(idx, vals, W), rtol=1e-5, atol=1e-5
    )


def test_decode_grads_match_eager():
    vals, idx, W, _ = _random_sparse(jax.random.PRNGKey(3), n=2600, k=8, L=256, d=64)

    def loss_sparse(v, w):
        return jnp.sum(sparse_decode(idx, v, w) ** 2)

    def loss_eager(v, w):
        return jnp.sum(eager_decode(idx, v, w) ** 2)

    gs = jax.grad(loss_sparse, argnums=(0, 1))(vals, W)
    ge = jax.grad(loss_eager, argnums=(0, 1))(vals, W)
    np.testing.assert_allclose(gs[0], ge[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gs[1], ge[1], rtol=1e-4, atol=1e-4)


def test_topk_mask_decode_matches_sparse_decode():
    vals, idx, W, pre = _random_sparse(jax.random.PRNGKey(4), n=16, k=8, L=256, d=64)
    y_mask, dense, sel = topk_mask_decode(pre, W, 8)
    y_ref = eager_decode(idx, vals, W)
    np.testing.assert_allclose(y_mask, y_ref, rtol=1e-5, atol=1e-5)
    # Fired mask marks exactly the nonzero selected latents.
    assert int(jnp.sum(dense > 0)) <= 16 * 8 + 16  # ties allowance
    # The selection mask marks at least k latents per row (>k only on ties),
    # including exactly-zero selections that `dense > 0` would miss.
    assert int(jnp.sum(sel)) >= 16 * 8
    # Gradient parity with the explicit sparse path (grad flows only to
    # selected latents through the threshold mask).
    def loss_mask(p, w):
        y, _, _ = topk_mask_decode(p, w, 8)
        return jnp.sum(y**2)

    def loss_sparse(p, w):
        v, i = jax.lax.top_k(p, 8)
        return jnp.sum(sparse_decode(i, v, w) ** 2)

    gm = jax.grad(loss_mask, argnums=(0, 1))(pre, W)
    gs = jax.grad(loss_sparse, argnums=(0, 1))(pre, W)
    np.testing.assert_allclose(gm[0], gs[0], rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(gm[1], gs[1], rtol=1e-4, atol=1e-4)


def test_geometric_median_simple():
    pts = jnp.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0], [1.0, 1.0]])
    med = geometric_median(pts)
    np.testing.assert_allclose(med, jnp.array([0.5, 0.5]), atol=1e-3)
    # Robustness: an outlier moves the median far less than the mean.
    pts2 = jnp.concatenate([jnp.zeros((10, 2)), jnp.array([[100.0, 100.0]])])
    med2 = geometric_median(pts2)
    assert float(jnp.linalg.norm(med2)) < 1.0


def test_kth_value_exact():
    """kth_value == the k-th column of a descending sort, for f32 and bf16,
    with negatives, ties, and -inf fills (the AuxK masked-score case)."""
    from multimodal_sae_tpu.ops import kth_value

    rng = np.random.default_rng(0)
    for dtype in (jnp.float32, jnp.bfloat16):
        for trial, base in enumerate(
            [
                rng.normal(size=(7, 512)),
                rng.integers(-3, 3, size=(5, 512)).astype(float),  # heavy ties
                np.where(rng.random((4, 512)) < 0.7, -np.inf, rng.normal(size=(4, 512))),
            ]
        ):
            x = jnp.asarray(base, dtype=dtype)
            ref = -jnp.sort(-x, axis=-1)
            for k in (1, 17, 256, 511):
                got = np.asarray(kth_value(x, k))
                exp = np.asarray(ref[:, k - 1 : k])
                np.testing.assert_array_equal(got, exp, err_msg=f"{dtype} {trial} k={k}")
    # leading-dims shape contract
    from multimodal_sae_tpu.ops import kth_value as kv

    x3 = jnp.asarray(rng.normal(size=(2, 3, 64)), jnp.float32)
    assert kv(x3, 5).shape == (2, 3, 1)


def test_geometric_median_identical_points_no_nan():
    """Weiszfeld division-by-zero guard: duplicated rows must not yield NaN."""
    med = geometric_median(jnp.ones((8, 4)) * 3.5)
    np.testing.assert_allclose(np.asarray(med), 3.5, atol=1e-5)
    assert np.isfinite(np.asarray(med)).all()


def test_sort_pairs_by_index_nonfinite_payloads():
    """The MXU rank-permutation path must move payload BITS, not values:
    a value-multiply formulation NaNs every output when any payload is
    non-finite (0 * -inf).  Exercises -inf, NaN, bf16, and the composed
    blockwise_top_k-on-a-masked-row case from the cache step."""
    from multimodal_sae_tpu.ops import sort_pairs_by_index

    idx = jnp.array([[5, 2, 9, 1]])
    vals = jnp.array([[1.0, -jnp.inf, jnp.nan, 2.0]])
    for dt in (jnp.float32, jnp.bfloat16):
        i, v = sort_pairs_by_index(idx, vals.astype(dt), max_index=100)
        ri, rv = jax.lax.sort_key_val(idx, vals.astype(dt), dimension=-1)
        np.testing.assert_array_equal(np.asarray(i), np.asarray(ri))
        np.testing.assert_array_equal(
            np.asarray(v, np.float32), np.asarray(rv, np.float32)
        )

    # masked row through the documented -inf-capable top-k, then the sort
    x = jnp.full((1, 512), -jnp.inf).at[0, :8].set(jnp.arange(8.0))
    bv, bi = blockwise_top_k(x, 128)
    si, sv = sort_pairs_by_index(bi, bv, max_index=512)
    assert int(jnp.isnan(sv).sum()) == 0
    assert int(jnp.isinf(sv).sum()) == 120  # the 120 masked winners stay -inf

    # random unique-index parity sweep (finite + one -inf per row)
    key = jax.random.PRNGKey(0)
    for n, k in [(16, 256), (4, 1024), (7, 33)]:
        perm = jax.vmap(
            lambda s: jax.random.permutation(jax.random.fold_in(key, s), 1 << 20)[:k]
        )(jnp.arange(n))
        vs = jax.random.normal(jax.random.fold_in(key, 99), (n, k)).at[:, 0].set(-jnp.inf)
        ai, av = sort_pairs_by_index(perm, vs, max_index=1 << 20)
        bi_, bv_ = jax.lax.sort_key_val(perm, vs, dimension=-1)
        np.testing.assert_array_equal(np.asarray(ai), np.asarray(bi_))
        np.testing.assert_array_equal(np.asarray(av), np.asarray(bv_))


def test_kth_value_f64_and_int_guard():
    """f64 keys ride a uint64 monotone key (the old uint16 fallback bitcast
    appended a trailing dim and broke shapes under x64); int inputs raise
    rather than silently mis-ranking through the IEEE sign-flip."""
    import subprocess
    import sys

    code = (
        "import jax, jax.numpy as jnp;"
        "from multimodal_sae_tpu.ops import kth_value;"
        "x = jax.random.normal(jax.random.PRNGKey(3), (5, 1000), dtype=jnp.float64);"
        "assert x.dtype == jnp.float64;"
        "ref = jnp.sort(x, axis=-1)[:, -17][:, None];"
        "assert (kth_value(x, 17) == ref).all()"
    )
    env = {
        "JAX_ENABLE_X64": "1",
        "JAX_PLATFORMS": "cpu",
        "PATH": os.environ.get("PATH", ""),
        "HOME": os.environ.get("HOME", "/root"),
    }
    r = subprocess.run(
        [sys.executable, "-c", code], env=env, cwd="/root/repo",
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr

    from multimodal_sae_tpu.ops import kth_value

    with pytest.raises(TypeError):
        kth_value(jnp.arange(10)[None], 3)


def test_topk_ops_randomized_property_sweep():
    """Seeded fuzz over the top-k family vs lax oracles: random widths
    (incl. non-multiples of the block), k values, dtypes, heavy ties, and
    -inf masking — the regimes the cache step meets on real data."""
    from multimodal_sae_tpu.ops import kth_value, sort_pairs_by_index

    rng = np.random.default_rng(1234)
    for trial in range(24):
        n = int(rng.integers(1, 5))
        width = int(rng.integers(257, 6000))
        k = int(rng.integers(1, min(width, 300)))
        dtype = jnp.float32 if trial % 2 == 0 else jnp.bfloat16
        base = rng.normal(size=(n, width))
        if trial % 3 == 1:  # heavy ties
            base = np.round(base * 2) / 2
        if trial % 4 == 2:  # masked tail (post-filter latents)
            base[:, rng.integers(1, width) :] = -np.inf
        x = jnp.asarray(base, dtype=dtype)

        v_ref, i_ref = jax.lax.top_k(x, k)
        for fn in (blockwise_top_k, blockmax_top_k):
            v, i = fn(x, k)
            for r in range(n):
                # Multisets of float values must agree even across ties; the
                # blockmax path clamps returned -inf VALUES to finfo.min (its
                # documented contract), so compare on the oracle's values at
                # the chosen indices instead.
                picked = np.asarray(x)[r, np.asarray(i[r])]
                assert sorted(picked.tolist(), reverse=True) == sorted(
                    np.asarray(v_ref[r], picked.dtype).tolist(), reverse=True
                ), (fn.__name__, trial, r)
                assert len(set(np.asarray(i[r]).tolist())) == k

        if not np.isinf(base).any():
            kv = np.asarray(kth_value(x, k))
            exp = np.asarray(-jnp.sort(-x, axis=-1))[:, k - 1 : k]
            np.testing.assert_array_equal(kv, exp, err_msg=str(trial))

        # pair sort on the blockwise output (always exact values)
        bv, bi = blockwise_top_k(x, k)
        si, sv = sort_pairs_by_index(bi, bv, max_index=width)
        ri, rv = jax.lax.sort_key_val(bi, bv, dimension=-1)
        np.testing.assert_array_equal(np.asarray(si), np.asarray(ri))
        np.testing.assert_array_equal(
            np.asarray(sv, np.float32), np.asarray(rv, np.float32)
        )


def test_decode_randomized_property_sweep():
    """Seeded fuzz over the decode family vs the eager oracle: random
    (n, k, L, d) incl. k=1, k=L, duplicate-value ties, all-zero rows, and
    grads through both value and weight inputs."""
    rng = np.random.default_rng(77)
    for trial in range(12):
        n = int(rng.integers(1, 40))
        L = int(rng.integers(8, 300))
        k = int(rng.integers(1, L + 1)) if trial % 4 else L  # hit k == L too
        d = int(rng.integers(4, 96))
        key = jax.random.PRNGKey(trial)
        pre = jax.nn.relu(jax.random.normal(key, (n, L)))
        if trial % 3 == 1:  # heavy ties + dead rows
            pre = jnp.round(pre * 2) / 2
            pre = pre.at[0].set(0.0)
        vals, idx = jax.lax.top_k(pre, k)
        W = jax.random.normal(jax.random.fold_in(key, 1), (L, d)) / (d**0.5)

        y_e = eager_decode(idx, vals, W)
        for fn in (gather_decode, sparse_decode):
            np.testing.assert_allclose(
                np.asarray(fn(idx, vals, W)), np.asarray(y_e),
                rtol=2e-5, atol=2e-5, err_msg=f"{fn.__name__} {trial}",
            )

        # topk_mask_decode includes EVERY latent tied at the k-th value (its
        # documented contract), so compare only rows without a boundary tie.
        y_m, _, _ = topk_mask_decode(pre, W, k)
        srt = np.sort(np.asarray(pre), axis=-1)[:, ::-1]
        no_tie = (srt[:, k - 1] > srt[:, k]) if k < L else np.ones(n, bool)
        np.testing.assert_allclose(
            np.asarray(y_m)[no_tie], np.asarray(y_e)[no_tie],
            rtol=2e-5, atol=2e-5, err_msg=f"mask {trial}",
        )

        gs = jax.grad(lambda v, w: jnp.sum(sparse_decode(idx, v, w) ** 2),
                      argnums=(0, 1))(vals, W)
        ge = jax.grad(lambda v, w: jnp.sum(eager_decode(idx, v, w) ** 2),
                      argnums=(0, 1))(vals, W)
        for a, b in zip(gs, ge):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4,
                err_msg=f"grad {trial}",
            )


def test_topk_mask_decode_approx_mode():
    """approx=True thresholds via approx_max_k (TrainConfig.approx_topk).
    On the CPU backend approx_max_k reduces to the exact top-k, so the mask
    and reconstruction must match the exact path bit-for-bit here; on TPU
    the contract is weaker (~0.95 recall), covered by the selection-count
    sanity bound."""
    _, _, W, pre = _random_sparse(jax.random.PRNGKey(7), n=16, k=8, L=256, d=64)
    y_exact, _, sel_exact = topk_mask_decode(pre, W, 8)
    y_approx, _, sel_approx = topk_mask_decode(pre, W, 8, approx=True)
    n_sel = int(jnp.sum(sel_approx))
    assert 16 * 8 * 0.9 <= n_sel <= 16 * 8 * 2, n_sel
    if jax.default_backend() == "cpu":
        np.testing.assert_array_equal(
            np.asarray(sel_exact), np.asarray(sel_approx)
        )
        np.testing.assert_allclose(y_approx, y_exact, rtol=1e-6, atol=1e-6)
    # Gradients flow through the masked dense matmul, not the threshold.
    g = jax.grad(lambda p: jnp.sum(topk_mask_decode(p, W, 8, approx=True)[0] ** 2))(pre)
    assert np.isfinite(np.asarray(g)).all()
