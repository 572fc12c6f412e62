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
