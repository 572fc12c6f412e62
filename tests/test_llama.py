"""LLaMA JAX implementation parity vs HF transformers (torch CPU, fp32) —
the stand-in for real-checkpoint bit-matching (no network in this env), plus
capture/intervention and generation-loop behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.models.hf_loader import (
    llama_params_from_state_dict,
    torch_module_state_dict,
)
from multimodal_sae_tpu.models.llama import (
    KVCache,
    LlamaConfig,
    LlamaModel,
    greedy_generate,
    llama_forward,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
        rms_norm_eps=1e-5,
        rope_theta=10000.0,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    cfg = LlamaConfig.from_hf(hf_cfg.to_dict())
    params = llama_params_from_state_dict(
        torch_module_state_dict(hf), cfg, dtype=jnp.float32
    )
    return hf, cfg, params


def test_logits_match_hf(tiny):
    hf, cfg, params = tiny
    ids = np.array([[1, 5, 9, 42, 100, 7, 3, 250]])
    with torch.no_grad():
        hf_out = hf(torch.tensor(ids), output_hidden_states=True)
    out = llama_forward(params, cfg, jnp.asarray(ids), capture=("layers.1",))
    np.testing.assert_allclose(
        np.asarray(out["logits"]), hf_out.logits.numpy(), rtol=2e-4, atol=2e-5
    )
    # hidden_states[i+1] in HF == output of decoder layer i (pre final norm).
    np.testing.assert_allclose(
        np.asarray(out["captured"]["layers.1"]),
        hf_out.hidden_states[2].numpy(),
        rtol=2e-4,
        atol=2e-5,
    )


def test_batched_padding_mask(tiny):
    hf, cfg, params = tiny
    ids = np.array([[1, 5, 9, 42], [7, 3, 0, 0]])
    amask = np.array([[1, 1, 1, 1], [1, 1, 0, 0]])
    with torch.no_grad():
        hf_out = hf(torch.tensor(ids), attention_mask=torch.tensor(amask))
    out = llama_forward(
        params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(amask)
    )
    # Compare only non-pad positions.
    ours = np.asarray(out["logits"])
    ref = hf_out.logits.numpy()
    np.testing.assert_allclose(ours[0], ref[0], rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(ours[1, :2], ref[1, :2], rtol=2e-4, atol=2e-5)


def test_intervention_replaces_layer_output(tiny):
    _, cfg, params = tiny
    ids = jnp.array([[1, 2, 3, 4]])

    def zero_out(h):
        return jnp.zeros_like(h)

    out_plain = llama_forward(params, cfg, ids)
    out_iv = llama_forward(
        params, cfg, ids, interventions={"layers.0": zero_out}, capture=("layers.0",)
    )
    assert not np.allclose(np.asarray(out_plain["logits"]), np.asarray(out_iv["logits"]))
    # Capture sees the post-intervention hidden (hook-replacement semantics).
    assert float(jnp.abs(out_iv["captured"]["layers.0"]).max()) == 0.0


def test_grad_through_intervention(tiny):
    """Attribution needs d(metric)/d(spliced hidden) — jax.vjp through the
    intervention replaces the reference's retain_grad
    (reference features/patching/attribution.py:160-182)."""
    _, cfg, params = tiny
    ids = jnp.array([[1, 2, 3, 4]])

    def metric_of_hidden(delta):
        out = llama_forward(
            params, cfg, ids, interventions={"layers.1": lambda h: h + delta}
        )
        return out["logits"][0, -1, 7]

    g = jax.grad(metric_of_hidden)(jnp.zeros((1, 4, cfg.hidden_size)))
    assert float(jnp.abs(g).sum()) > 0


def test_generate_matches_hf_greedy(tiny):
    hf, cfg, params = tiny
    ids = np.array([[1, 5, 9, 42, 7]])
    with torch.no_grad():
        hf_tokens = hf.generate(
            torch.tensor(ids), max_new_tokens=8, do_sample=False
        ).numpy()
    ours = np.asarray(
        greedy_generate(params, cfg, jnp.asarray(ids), max_new_tokens=8)
    )
    np.testing.assert_array_equal(ours, hf_tokens)


def test_generate_with_intervention_runs(tiny):
    _, cfg, params = tiny
    model = LlamaModel(params, cfg)
    ids = jnp.array([[1, 5, 9]])
    out = model.generate(
        ids,
        max_new_tokens=4,
        interventions={"layers.1": lambda h: h * 1.5},
        intervene_prefill_only=True,
    )
    assert out.shape == (1, 7)


def test_activation_source_protocol(tiny):
    _, cfg, params = tiny
    model = LlamaModel(params, cfg)
    assert model.hookpoint_names()[0] == "layers.0"
    assert model.resolve_widths(["layers.2"]) == {"layers.2": 64}
    caps = model.capture(
        {"input_ids": np.array([[1, 2, 3]])}, ["layers.0", "layers.2"]
    )
    assert set(caps) == {"layers.0", "layers.2"}
    assert caps["layers.0"].shape == (1, 3, 64)
