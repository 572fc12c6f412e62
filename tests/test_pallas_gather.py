"""Pallas DMA row-gather kernel parity in interpreter mode (the kernel-parity
pattern of SURVEY.md §4 applied to our Pallas op; runs on CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.ops.pallas_gather import gather_rows, pallas_gather_rows


@pytest.mark.parametrize("M,L,d", [(8, 64, 2048), (64, 512, 2048), (32, 128, 4096)])
def test_pallas_gather_parity(M, L, d):
    W = jax.random.normal(jax.random.PRNGKey(0), (L, d), dtype=jnp.float32)
    idx = jax.random.randint(jax.random.PRNGKey(1), (M,), 0, L)
    out = pallas_gather_rows(W, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(jnp.take(W, idx, axis=0)))


def test_pallas_gather_repeated_rows():
    W = jax.random.normal(jax.random.PRNGKey(2), (32, 2048))
    idx = jnp.asarray([5] * 8, dtype=jnp.int32)
    out = pallas_gather_rows(W, idx, interpret=True)
    np.testing.assert_array_equal(np.asarray(out), np.tile(np.asarray(W[5]), (8, 1)))


def test_gather_rows_fallback_cpu():
    # On CPU the dispatcher must take the jnp path and match.
    W = jax.random.normal(jax.random.PRNGKey(3), (64, 2048))
    idx = jax.random.randint(jax.random.PRNGKey(4), (16,), 0, 64)
    np.testing.assert_array_equal(
        np.asarray(gather_rows(W, idx)), np.asarray(jnp.take(W, idx, axis=0))
    )
