"""The scan-over-layers forward (stacked params, cond-based interventions)
must match the unrolled per-layer loop exactly — with and without KV cache."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    greedy_generate,
    init_llama_params,
    llama_forward,
    stack_layer_params,
)

CFG = LlamaConfig(
    vocab_size=128,
    hidden_size=32,
    intermediate_size=64,
    num_hidden_layers=3,
    num_attention_heads=4,
    num_key_value_heads=2,
    rope_theta=10000.0,
)


@pytest.fixture(scope="module")
def params():
    return init_llama_params(jax.random.PRNGKey(0), CFG)


def test_scan_matches_unrolled(params):
    stacked = stack_layer_params(params)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, size=(2, 6)))
    a = llama_forward(params, CFG, ids)["logits"]
    b = llama_forward(stacked, CFG, ids)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_scan_matches_unrolled_with_cache(params):
    stacked = stack_layer_params(params)
    ids = jnp.asarray(np.random.default_rng(1).integers(0, 128, size=(1, 5)))
    cache_a = KVCache.init(CFG, 1, 8)
    cache_b = KVCache.init(CFG, 1, 8)
    a = llama_forward(params, CFG, ids, cache=cache_a)
    b = llama_forward(stacked, CFG, ids, cache=cache_b)
    np.testing.assert_allclose(
        np.asarray(a["logits"]), np.asarray(b["logits"]), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a["cache"].k), np.asarray(b["cache"].k), rtol=1e-5, atol=1e-6
    )


def test_scan_interventions_match_unrolled(params):
    stacked = stack_layer_params(params)
    iv = {"layers.1": lambda h: h * 1.5 + 0.1}
    ids = jnp.asarray([[3, 7, 11, 2]])
    a = llama_forward(params, CFG, ids, interventions=iv)["logits"]
    b = llama_forward(stacked, CFG, ids, interventions=iv)["logits"]
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)
    # And the intervention actually changed the output.
    plain = llama_forward(params, CFG, ids)["logits"]
    assert not np.allclose(np.asarray(a), np.asarray(plain))


def test_generate_decode_phase_interventions():
    """intervene_prefill_only=False applies the intervention at every decode
    step through the scanned loop."""
    params = init_llama_params(jax.random.PRNGKey(3), CFG)
    ids = jnp.asarray([[1, 5, 9]])
    base = np.asarray(greedy_generate(params, CFG, ids, max_new_tokens=6))
    steered = np.asarray(
        greedy_generate(
            params,
            CFG,
            ids,
            max_new_tokens=6,
            interventions={"layers.1": lambda h: h * 2.0},
            intervene_prefill_only=False,
        )
    )
    assert base.shape == steered.shape
    assert not np.array_equal(base, steered)
