"""Bit-exactness of the wide top-k path for fp32 payloads: the one-hot MXU
gather must copy values exactly (the cache's fp32 bit-match guarantee)."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.ops import blockmax_top_k


def test_blockmax_values_bitexact_f32():
    rng = np.random.default_rng(0)
    # Adversarial mantissas: values needing all 24 bits.
    x = (rng.normal(size=(8, 8192)).astype(np.float32) * (1 + 1e-7)).astype(
        np.float32
    )
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), 16)
    v, i = blockmax_top_k(jnp.asarray(x), 16, block=64)
    ref = {}
    for r in range(8):
        ref_pairs = {int(ii): np.asarray(vv).tobytes() for ii, vv in zip(i_ref[r], v_ref[r])}
        got_pairs = {int(ii): np.asarray(vv).tobytes() for ii, vv in zip(i[r], v[r])}
        assert ref_pairs == got_pairs  # identical indices AND identical bits


def test_blockmax_two_level_bitexact_f32():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(4, 131072)).astype(np.float32)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), 256)
    v, i = blockmax_top_k(jnp.asarray(x), 256)  # k*block > 4096 -> two-level
    for r in range(4):
        ref_pairs = {int(ii): np.asarray(vv).tobytes() for ii, vv in zip(i_ref[r], v_ref[r])}
        got_pairs = {int(ii): np.asarray(vv).tobytes() for ii, vv in zip(i[r], v[r])}
        assert ref_pairs == got_pairs


def test_blockmax_neg_inf_inputs_no_nan():
    """-inf entries (masking pattern) must not poison the one-hot gather with
    0 * -inf = NaN; indices stay exact, -inf values clamp to finfo.min."""
    rng = np.random.default_rng(2)
    x = rng.normal(size=(4, 8192)).astype(np.float32)
    x[:, ::3] = -np.inf  # a third of each row masked out
    x[3, :] = -np.inf  # fully masked row
    v, i = blockmax_top_k(jnp.asarray(x), 16, block=64)
    assert not np.any(np.isnan(np.asarray(v)))
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), 16)
    for r in range(3):
        assert set(np.asarray(i[r]).tolist()) == set(np.asarray(i_ref[r]).tolist())
        np.testing.assert_array_equal(
            np.sort(np.asarray(v[r])),
            np.sort(np.maximum(np.asarray(v_ref[r]), np.finfo(np.float32).min)),
        )


def test_blockmax_nondivisible_width_neginf_rows_exact():
    """Review r5 (confirmed repro): the old padded path returned indices
    PAST the row end (pads filled at finfo.min beat real -inf elements) on
    -inf-dominated rows at width % block != 0. Non-divisible widths now take
    the generic exact path."""
    from multimodal_sae_tpu.ops.topk import blockmax_top_k

    width, k = 2924, 46
    x = np.full((1, width), -np.inf, dtype=np.float32)
    x[0, 2900] = 4.0
    vals, idx = blockmax_top_k(jnp.asarray(x), k, block=64)
    idx = np.asarray(idx)
    assert idx.max() < width, idx.max()
    ref_vals, ref_idx = jax.lax.top_k(jnp.asarray(x), k)
    # Set equality is the contract (ties order arbitrarily); the single
    # finite element must be ranked first in both.
    assert int(idx[0, 0]) == 2900 and float(np.asarray(vals)[0, 0]) == 4.0


def test_top_k_integer_dtype_wide_width():
    """Review r5: integer inputs crashed at trace time (jnp.finfo) once the
    width crossed the blockmax threshold while narrower widths worked; they
    now route to the generic path at any width."""
    from multimodal_sae_tpu.ops.topk import top_k

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(0, 1 << 20, size=(2, 40960)), dtype=jnp.int32)
    vals, idx = top_k(x, 16)
    ref_vals, ref_idx = jax.lax.top_k(x, 16)
    np.testing.assert_array_equal(np.asarray(vals), np.asarray(ref_vals))


def test_pallas_gather_honors_disable_env(monkeypatch):
    """Review r5: MMSAE_DISABLE_PALLAS is the documented kill switch and
    must gate this kernel like pallas_topk's."""
    from multimodal_sae_tpu.ops import pallas_gather

    monkeypatch.setenv("MMSAE_ENABLE_PALLAS", "1")
    monkeypatch.setenv("MMSAE_DISABLE_PALLAS", "1")
    assert pallas_gather._use_pallas() is False
