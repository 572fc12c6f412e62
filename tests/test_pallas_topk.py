"""Pallas block-max reduce kernel (ops/pallas_topk.py): interpret-mode
bit-exactness vs the XLA reshape-max, and the blockmax_top_k integration."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.ops import blockmax_top_k, top_k
from multimodal_sae_tpu.ops.pallas_topk import (
    pallas_block_max,
    supports,
    use_pallas_block_max,
)


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_pallas_block_max_matches_reshape_max(dtype):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 32768)).astype(np.float32)).astype(dtype)
    assert supports(x, 128)
    got = pallas_block_max(x, 128, interpret=True)
    ref = x.reshape(16, 256, 128).max(axis=-1)
    assert got.dtype == x.dtype
    np.testing.assert_array_equal(
        np.asarray(got, np.float32), np.asarray(ref, np.float32)
    )


def test_pallas_block_max_shape_gates():
    x = jnp.zeros((16, 32768), jnp.float32)
    assert supports(x, 128)
    assert not supports(x, 64)  # reshape last dim must be the lane width
    assert not supports(jnp.zeros((16, 30000), jnp.float32), 128)  # width
    assert not supports(jnp.zeros((3, 32768), jnp.float32), 128)  # rows
    assert not supports(jnp.zeros((16, 32768), jnp.int8), 128)  # dtype


def test_use_pallas_env_gates(monkeypatch):
    x = jnp.zeros((16, 32768), jnp.float32)
    monkeypatch.setenv("MMSAE_ENABLE_PALLAS", "1")
    monkeypatch.delenv("MMSAE_DISABLE_PALLAS", raising=False)
    assert use_pallas_block_max(x, 128)
    monkeypatch.setenv("MMSAE_DISABLE_PALLAS", "1")
    assert not use_pallas_block_max(x, 128)


def test_blockmax_top_k_with_pallas_reduce_bitexact(monkeypatch):
    monkeypatch.setenv("MMSAE_ENABLE_PALLAS", "1")
    rng = np.random.default_rng(1)
    x = rng.normal(size=(8, 32768)).astype(np.float32)
    v_ref, i_ref = jax.lax.top_k(jnp.asarray(x), 32)
    v, i = blockmax_top_k(jnp.asarray(x), 32, block=128)
    for r in range(8):
        ref = {int(a): np.asarray(b).tobytes() for a, b in zip(i_ref[r], v_ref[r])}
        got = {int(a): np.asarray(b).tobytes() for a, b in zip(i[r], v[r])}
        assert ref == got


def test_dispatcher_prefers_block_128_when_pallas_on(monkeypatch):
    """top_k must stay exact when the dispatcher routes to the block-128
    Pallas path (k*128*4 <= width)."""
    monkeypatch.setenv("MMSAE_ENABLE_PALLAS", "1")
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(4, 65536)).astype(np.float32))
    v_ref, i_ref = jax.lax.top_k(x, 64)
    v, i = top_k(x, 64)
    for r in range(4):
        assert set(np.asarray(i[r]).tolist()) == set(np.asarray(i_ref[r]).tolist())
        np.testing.assert_array_equal(np.asarray(v[r]), np.asarray(v_ref[r]))
