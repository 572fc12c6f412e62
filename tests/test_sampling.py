"""Sampling-capable generation (temperature + nucleus) vs HF semantics.

The reference inherits sampling from HF `generate` and the checkpoint's
generation_config (reference features/steering.py:72-75).  Our warper math is
checked exactly against HF's LogitsWarper classes, and the end-to-end sampled
token distribution is checked statistically against the analytic warped
softmax (same-seed cross-framework token equality is impossible — torch and
JAX PRNGs differ — so distribution parity is the meaningful contract)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.models.llama import (
    LlamaConfig,
    LlamaModel,
    greedy_generate,
    top_p_filter,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny():
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    from multimodal_sae_tpu.models.hf_loader import (
        llama_params_from_state_dict,
        torch_module_state_dict,
    )

    cfg = LlamaConfig.from_hf(hf_cfg.to_dict())
    params = llama_params_from_state_dict(
        torch_module_state_dict(hf), cfg, dtype=jnp.float32
    )
    return hf, cfg, params


@pytest.mark.parametrize("top_p", [0.3, 0.7, 0.9, 0.99])
def test_top_p_filter_matches_hf_warper(top_p):
    from transformers.generation.logits_process import TopPLogitsWarper

    rng = np.random.default_rng(0)
    logits = rng.normal(size=(5, 64)).astype(np.float32) * 3
    ours = np.asarray(top_p_filter(jnp.asarray(logits), jnp.float32(top_p)))
    ref = (
        TopPLogitsWarper(top_p=top_p)(None, torch.tensor(logits))
        .numpy()
    )
    np.testing.assert_array_equal(np.isinf(ours), np.isinf(ref))
    keep = ~np.isinf(ref)
    np.testing.assert_allclose(ours[keep], ref[keep], rtol=1e-6)


def test_top_p_filter_tied_logits_keeps_sorted_prefix():
    """Logit ties at the nucleus boundary keep exactly the first kcount in
    sort order (HF sorted-mask scatter), not the whole tie class: a flat
    row with top_p=0.5 must keep ceil(V/2) tokens, not all V."""
    from transformers.generation.logits_process import TopPLogitsWarper

    flat = np.zeros((1, 8), dtype=np.float32)
    boundary_tie = np.asarray([[2.0, 1.0, 1.0, 1.0, -4.0, -4.0]], np.float32)
    for logits, top_p in ((flat, 0.5), (boundary_tie, 0.6), (boundary_tie, 0.75)):
        ours = np.asarray(top_p_filter(jnp.asarray(logits), jnp.float32(top_p)))
        ref = TopPLogitsWarper(top_p=top_p)(None, torch.tensor(logits)).numpy()
        np.testing.assert_array_equal(np.isinf(ours), np.isinf(ref))


def test_top_p_keeps_at_least_one_token():
    # One dominant token; tiny top_p must still keep it (HF min_tokens_to_keep).
    logits = jnp.asarray([[10.0, 0.0, -1.0, -2.0]])
    out = np.asarray(top_p_filter(logits, jnp.float32(0.01)))
    assert np.isfinite(out[0, 0])
    assert np.isinf(out[0, 1:]).all()


def test_sampled_distribution_matches_warped_softmax(tiny):
    """4096 i.i.d. next-token draws (identical prompts riding the batch axis)
    vs the analytic temperature+top_p-warped distribution computed from HF's
    own warpers on our logits."""
    from transformers.generation.logits_process import (
        TemperatureLogitsWarper,
        TopPLogitsWarper,
    )
    from multimodal_sae_tpu.models.llama import llama_forward

    hf, cfg, params = tiny
    temperature, top_p = 0.8, 0.9
    prompt = np.array([[1, 5, 9, 42]])
    B = 4096
    ids = np.repeat(prompt, B, axis=0)

    out = greedy_generate(
        params,
        cfg,
        jnp.asarray(ids),
        max_new_tokens=1,
        do_sample=True,
        temperature=temperature,
        top_p=top_p,
        prng_key=jax.random.PRNGKey(7),
    )
    samples = np.asarray(out)[:, -1]

    logits = np.asarray(
        llama_forward(params, cfg, jnp.asarray(prompt))["logits"][:, -1, :]
    )
    t_logits = torch.tensor(logits)
    t_logits = TemperatureLogitsWarper(temperature)(None, t_logits)
    t_logits = TopPLogitsWarper(top_p=top_p)(None, t_logits)
    probs = torch.softmax(t_logits, dim=-1).numpy()[0]

    # Every sampled token must be inside the nucleus.
    assert probs[samples].min() > 0
    emp = np.bincount(samples, minlength=cfg.vocab_size) / B
    tv = 0.5 * np.abs(emp - probs).sum()
    assert tv < 0.06, f"total variation {tv:.3f} vs analytic distribution"


def test_temperature_near_zero_equals_greedy(tiny):
    _, cfg, params = tiny
    ids = jnp.asarray(np.array([[1, 5, 9, 42, 100]]))
    greedy = greedy_generate(params, cfg, ids, max_new_tokens=6)
    sampled = greedy_generate(
        params,
        cfg,
        ids,
        max_new_tokens=6,
        do_sample=True,
        temperature=1e-4,
        prng_key=jax.random.PRNGKey(3),
    )
    np.testing.assert_array_equal(np.asarray(greedy), np.asarray(sampled))


def test_sampling_deterministic_given_key(tiny):
    _, cfg, params = tiny
    ids = jnp.asarray(np.array([[1, 5, 9, 42]]))
    kw = dict(max_new_tokens=8, do_sample=True, temperature=1.5, top_p=0.95)
    a = greedy_generate(params, cfg, ids, prng_key=jax.random.PRNGKey(11), **kw)
    b = greedy_generate(params, cfg, ids, prng_key=jax.random.PRNGKey(11), **kw)
    c = greedy_generate(params, cfg, ids, prng_key=jax.random.PRNGKey(12), **kw)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.array_equal(np.asarray(a), np.asarray(c))


def test_model_generate_sampling_kwargs(tiny):
    _, cfg, params = tiny
    model = LlamaModel(params, cfg)
    out = model.generate(
        {"input_ids": np.array([[1, 5, 9]])},
        max_new_tokens=4,
        do_sample=True,
        temperature=0.7,
        top_p=0.9,
        prng_key=jax.random.PRNGKey(0),
    )
    assert np.asarray(out).shape == (1, 7)


def test_load_generation_config(tmp_path):
    import json

    from multimodal_sae_tpu.launch.utils import _load_generation_config

    assert _load_generation_config(str(tmp_path)) == {}
    (tmp_path / "generation_config.json").write_text(
        json.dumps(
            {"do_sample": True, "temperature": 0.6, "top_p": 0.9, "bos_token_id": 1}
        )
    )
    assert _load_generation_config(str(tmp_path)) == {
        "do_sample": True,
        "temperature": 0.6,
        "top_p": 0.9,
    }


def test_steering_rejects_nonpositive_sampling_temperature(tiny):
    """temperature 0.0 with do_sample must raise (HF generate does too), not
    silently fall back to temperature-1.0 sampling."""
    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.features.steering import SteeringController
    from multimodal_sae_tpu.sae import Sae

    _, cfg, params = tiny
    model = LlamaModel(params, cfg)

    class StubTok:
        def apply_chat_template(self, conv, add_generation_prompt=True, tokenize=False):
            return conv[0]["content"][0]["text"]

        def __call__(self, text):
            return {"input_ids": [1, 5]}

    sae = Sae(
        cfg.hidden_size,
        SaeConfig(expansion_factor=2, k=4),
        key=jax.random.PRNGKey(0),
    )
    with pytest.raises(ValueError, match="temperature"):
        SteeringController(
            sae=sae,
            module_name="layers.1",
            feature_idx=[0],
            model=model,
            processor=StubTok(),
            prompt="hello",
            generation_config={"do_sample": True, "temperature": 0.0},
        )


def test_steering_controller_sampling_smoke(tiny):
    """SteeringController with a do_sample generation_config produces the
    unchanged output schema (reference steering json, launch steering.py:94-106)."""
    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.features.steering import SteeringController
    from multimodal_sae_tpu.sae import Sae

    _, cfg, params = tiny
    model = LlamaModel(params, cfg)

    class StubTok:
        def apply_chat_template(self, conv, add_generation_prompt=True, tokenize=False):
            return conv[0]["content"][0]["text"]

        def __call__(self, text):
            return {"input_ids": [1, 5, 9, 42]}

        def batch_decode(self, arr, skip_special_tokens=True):
            return [" ".join(str(int(t)) for t in row) for row in arr]

    sae = Sae(
        cfg.hidden_size,
        SaeConfig(expansion_factor=2, k=4),
        key=jax.random.PRNGKey(0),
    )
    ctrl = SteeringController(
        sae=sae,
        module_name="layers.1",
        feature_idx=[0, 3],
        model=model,
        processor=StubTok(),
        prompt="hello",
        k=5.0,
        max_new_tokens=4,
        feature_batch_size=2,
        generation_config={"do_sample": True, "temperature": 0.8, "top_p": 0.9, "seed": 1},
    )
    result = ctrl.run()
    assert set(result) == {"layers.1_feature0", "layers.1_feature3"}
    for v in result.values():
        assert set(v) == {"original_resps", "clamped_resps", "idx"}


def test_steering_threads_eos_from_tokenizer(tiny):
    """SteeringController must pass the stop id to generate (config first,
    tokenizer fallback) — without it every generation ran the full
    max_new_tokens and decoded post-EOS babble (review r3)."""
    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.features.steering import SteeringController
    from multimodal_sae_tpu.sae import Sae

    _, cfg, params = tiny
    model = LlamaModel(params, cfg)

    class StubTok:
        eos_token_id = 9

        def apply_chat_template(self, conv, add_generation_prompt=True, tokenize=False):
            return conv[0]["content"][0]["text"]

        def __call__(self, text):
            return {"input_ids": [1, 5]}

    sae = Sae(
        cfg.hidden_size, SaeConfig(expansion_factor=2, k=4), key=jax.random.PRNGKey(0)
    )
    ctrl = SteeringController(
        sae=sae,
        module_name="layers.1",
        feature_idx=[0],
        model=model,
        processor=StubTok(),
        prompt="hi",
    )
    assert ctrl._sample_kwargs["eos_token_id"] == 9
    # An explicit generation_config id wins over the tokenizer's.
    ctrl2 = SteeringController(
        sae=sae,
        module_name="layers.1",
        feature_idx=[0],
        model=model,
        processor=StubTok(),
        prompt="hi",
        generation_config={"eos_token_id": [3, 9]},
    )
    assert ctrl2._sample_kwargs["eos_token_id"] == [3, 9]
