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


def test_rope_scaling_llama3_matches_hf():
    """Llama-3.1's 'llama3' rope_scaling must be applied, not silently
    dropped (it changes every activation)."""
    rs = {
        "rope_type": "llama3",
        "factor": 8.0,
        "low_freq_factor": 1.0,
        "high_freq_factor": 4.0,
        "original_max_position_embeddings": 64,
    }
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
        rope_scaling=dict(rs),
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval().to(torch.float32)
    cfg = LlamaConfig.from_hf(hf_cfg.to_dict())
    assert cfg.rope_scaling_dict is not None
    params = llama_params_from_state_dict(
        torch_module_state_dict(hf), cfg, dtype=jnp.float32
    )
    ids = np.array([[1, 5, 9, 42, 100, 7, 3, 120]])
    with torch.no_grad():
        ref = hf(torch.tensor(ids)).logits.numpy()
    ours = np.asarray(llama_forward(params, cfg, jnp.asarray(ids))["logits"])
    np.testing.assert_allclose(ours, ref, rtol=2e-4, atol=2e-5)
    # And the scaling genuinely differs from default RoPE.
    cfg_plain = LlamaConfig.from_hf(
        {k: v for k, v in hf_cfg.to_dict().items() if k != "rope_scaling"}
    )
    plain = np.asarray(llama_forward(params, cfg_plain, jnp.asarray(ids))["logits"])
    assert not np.allclose(ours, plain)


def test_rope_scaling_unknown_type_raises():
    with pytest.raises(NotImplementedError):
        LlamaConfig.from_hf(
            {"hidden_size": 64, "rope_scaling": {"rope_type": "yarn", "factor": 2.0}}
        )


def test_generate_left_padded_matches_hf(tiny):
    """Batched generation with left-padded prompts: pad positions masked for
    the whole generation, per-row position ids — token-parity vs HF."""
    hf, cfg, params = tiny
    ids = np.array([[0, 0, 1, 5, 9], [7, 3, 9, 42, 2]])
    amask = np.array([[0, 0, 1, 1, 1], [1, 1, 1, 1, 1]])
    with torch.no_grad():
        hf_tokens = hf.generate(
            torch.tensor(ids),
            attention_mask=torch.tensor(amask),
            max_new_tokens=6,
            do_sample=False,
            pad_token_id=0,
        ).numpy()
    ours = np.asarray(
        greedy_generate(
            params,
            cfg,
            jnp.asarray(ids),
            max_new_tokens=6,
            attention_mask=jnp.asarray(amask),
        )
    )
    np.testing.assert_array_equal(ours, hf_tokens)


def test_generate_right_padded_raises(tiny):
    _, cfg, params = tiny
    ids = jnp.array([[1, 5, 0], [7, 3, 9]])
    amask = jnp.array([[1, 1, 0], [1, 1, 1]])
    with pytest.raises(ValueError, match="LEFT-padded"):
        greedy_generate(params, cfg, ids, max_new_tokens=2, attention_mask=amask)


def test_forward_bad_mask_length_raises(tiny):
    _, cfg, params = tiny
    cache = KVCache.init(cfg, 1, 16)
    with pytest.raises(ValueError, match="attention_mask length"):
        llama_forward(
            params,
            cfg,
            jnp.array([[1, 2, 3]]),
            attention_mask=jnp.ones((1, 7), jnp.int32),
            cache=cache,
        )


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


def test_flash_attention_matches_eager():
    """cfg.flash_attention routes no-cache forwards through the fused kernel
    (mha_reference off-TPU — same math as the Pallas kernel), matching eager
    attention within bf16-level tolerance, including pad-key exclusion."""
    import dataclasses

    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=10000.0,
    )
    from multimodal_sae_tpu.models.llama import init_llama_params

    fcfg = dataclasses.replace(cfg, flash_attention=True)
    params = init_llama_params(jax.random.PRNGKey(3), cfg)
    ids = jnp.asarray(np.random.default_rng(3).integers(0, 128, size=(2, 16)))
    amask = np.ones((2, 16), np.int32)
    amask[1, 12:] = 0  # right-padded row: pad keys must be excluded

    ref = llama_forward(params, cfg, ids, attention_mask=jnp.asarray(amask),
                        capture=("layers.1",))
    got = llama_forward(params, fcfg, ids, attention_mask=jnp.asarray(amask),
                        capture=("layers.1",))
    # Compare only real-token positions (pad outputs are garbage-but-finite
    # in both paths, with different garbage).
    for key in ("logits",):
        a = np.asarray(ref[key], np.float32)
        b = np.asarray(got[key], np.float32)
        np.testing.assert_allclose(a[0], b[0], rtol=2e-3, atol=2e-3)
        np.testing.assert_allclose(a[1, :12], b[1, :12], rtol=2e-3, atol=2e-3)
    assert np.isfinite(np.asarray(got["captured"]["layers.1"])).all()

    # Attribution-style gradients flow THROUGH flash attention (sm_scale is
    # folded into q because the reference backward rejects sm_scale != 1).
    def metric(c, delta):
        out = llama_forward(
            params, c, ids, interventions={"layers.0": lambda h: h + delta}
        )
        return out["logits"][0, -1, 5]

    z = jnp.zeros((2, 16, 64))
    g = jax.grad(lambda d: metric(fcfg, d))(z)
    ge = jax.grad(lambda d: metric(cfg, d))(z)
    rel = float(jnp.linalg.norm(g - ge) / jnp.linalg.norm(ge))
    assert np.isfinite(np.asarray(g)).all() and rel < 1e-3, rel

    # And through the segment-ids (pad mask) backward — what right-padded
    # multimodal attribution batches hit.
    def metric_m(c, delta):
        out = llama_forward(
            params,
            c,
            ids,
            attention_mask=jnp.asarray(amask),
            interventions={"layers.0": lambda h: h + delta},
        )
        # Sum a real-token logit from BOTH rows (position 11 is row 1's last
        # real token) so both rows carry gradient.
        return out["logits"][:, 11, 5].sum()

    gm = jax.grad(lambda d: metric_m(fcfg, d))(z)
    gme = jax.grad(lambda d: metric_m(cfg, d))(z)
    # Row 1's pad-position grads differ by construction; compare row 0 (no
    # pads) and the real tokens of row 1.
    a, b = np.asarray(gm, np.float32), np.asarray(gme, np.float32)
    assert np.isfinite(a).all()
    rel0 = np.linalg.norm(a[0] - b[0]) / np.linalg.norm(b[0])
    rel1 = np.linalg.norm(a[1, :12] - b[1, :12]) / np.linalg.norm(b[1, :12])
    assert rel0 < 1e-3 and rel1 < 1e-3, (rel0, rel1)


def test_generate_eos_stops_and_fills_tail(tiny):
    """EOS semantics (review r3): once every row has emitted a stop id the
    loop exits early, and the unwritten tail must be filled with the primary
    stop id — the zeros init is a REAL vocab token. Also covers list-valued
    eos (Llama-3 ships [eot, eos]) and parity with HF generate's pad fill."""
    hf, cfg, params = tiny
    ids = np.array([[1, 5, 9, 42, 7]])
    free = np.asarray(
        greedy_generate(params, cfg, jnp.asarray(ids), max_new_tokens=8)
    )
    # Choose the 3rd generated token as "EOS": generation must stop there.
    eos = int(free[0, ids.shape[1] + 2])
    ours = np.asarray(
        greedy_generate(
            params, cfg, jnp.asarray(ids), max_new_tokens=8, eos_token_id=eos
        )
    )
    np.testing.assert_array_equal(ours[:, : ids.shape[1] + 3], free[:, : ids.shape[1] + 3])
    assert (ours[0, ids.shape[1] + 3 :] == eos).all(), ours
    with torch.no_grad():
        hf_tokens = hf.generate(
            torch.tensor(ids),
            max_new_tokens=8,
            do_sample=False,
            eos_token_id=eos,
            pad_token_id=eos,
        ).numpy()
    np.testing.assert_array_equal(ours[:, : hf_tokens.shape[1]], hf_tokens)
    # List-valued eos: a set containing the SECOND generated token stops earlier.
    eos2 = int(free[0, ids.shape[1] + 1])
    ours2 = np.asarray(
        greedy_generate(
            params,
            cfg,
            jnp.asarray(ids),
            max_new_tokens=8,
            eos_token_id=[eos2, eos],
        )
    )
    assert (ours2[0, ids.shape[1] + 2 :] == eos2).all(), ours2


def test_select_modules_layer_indices_are_natsorted():
    """--selected_layers indexes a natsorted listing (stable across
    filesystems; the reference indexed raw os.listdir order)."""
    import os
    import tempfile

    from multimodal_sae_tpu.launch.utils import select_modules

    with tempfile.TemporaryDirectory() as d:
        for name in ("layers.10", "layers.5", "layers.24"):
            os.mkdir(os.path.join(d, name))
        assert select_modules(d, None, [0, 2]) == ["layers.5", "layers.24"]
        assert select_modules(d, None, None) == [
            "layers.5",
            "layers.10",
            "layers.24",
        ]


def test_generate_empty_eos_list_means_no_eos(tiny):
    """A checkpoint generation_config with eos_token_id: [] must behave as
    no-eos, not IndexError at trace time (review r3 follow-up)."""
    _, cfg, params = tiny
    ids = jnp.asarray(np.array([[1, 5, 9]]))
    free = np.asarray(greedy_generate(params, cfg, ids, max_new_tokens=4))
    empty = np.asarray(
        greedy_generate(params, cfg, ids, max_new_tokens=4, eos_token_id=[])
    )
    np.testing.assert_array_equal(free, empty)


def test_model_generate_defaults_eos_from_generation_config(tiny):
    """LlamaModel.generate picks the stop id up from the checkpoint's
    attached generation_config, so every caller (tools/model_steering.py
    included) stops at EOS without threading it."""
    _, cfg, params = tiny
    from multimodal_sae_tpu.models.llama import LlamaModel

    model = LlamaModel(params, cfg)
    ids = np.array([[1, 5, 9, 42, 7]])
    free = np.asarray(model.generate(ids, max_new_tokens=8))
    eos = int(free[0, ids.shape[1] + 1])
    model.generation_config = {"eos_token_id": eos}
    stopped = np.asarray(model.generate(ids, max_new_tokens=8))
    assert (stopped[0, ids.shape[1] + 2 :] == eos).all(), stopped


def test_lm_head_fallback_nested_prefix():
    """The sibling lm_head candidate must strip only the TRAILING 'model.'
    segment ('language_model.model.' -> 'language_model.lm_head.weight')."""
    import dataclasses

    cfg = LlamaConfig(
        vocab_size=32,
        hidden_size=8,
        intermediate_size=16,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=1,
        tie_word_embeddings=False,
    )
    torch = pytest.importorskip("torch")
    p = "language_model.model."
    hd = cfg.hidden_size
    sd = {
        p + "embed_tokens.weight": torch.randn(32, hd),
        p + "norm.weight": torch.ones(hd),
        "language_model.lm_head.weight": torch.randn(32, hd),
    }
    for name, shape in [
        ("input_layernorm.weight", (hd,)),
        ("self_attn.q_proj.weight", (8, hd)),
        ("self_attn.k_proj.weight", (4, hd)),
        ("self_attn.v_proj.weight", (4, hd)),
        ("self_attn.o_proj.weight", (hd, 8)),
        ("post_attention_layernorm.weight", (hd,)),
        ("mlp.gate_proj.weight", (16, hd)),
        ("mlp.up_proj.weight", (16, hd)),
        ("mlp.down_proj.weight", (hd, 16)),
    ]:
        sd[p + "layers.0." + name] = (
            torch.ones(shape) if name.endswith("layernorm.weight") else torch.randn(shape)
        )
    params = llama_params_from_state_dict(sd, cfg, prefix=p)
    assert "lm_head" in params, "nested-prefix lm_head fallback missed"
    np.testing.assert_allclose(
        np.asarray(params["lm_head"]),
        sd["language_model.lm_head.weight"].numpy().T,
    )


def test_flash_attention_long_sequence_512_bucket():
    """S >= 1024 routes through the 512-block bucket (padding to a 512
    multiple); outputs must still match eager at real positions, and
    gradients must flow (attribution backward uses these block sizes)."""
    import dataclasses

    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=1,
        num_attention_heads=2,
        num_key_value_heads=1,
        rope_theta=10000.0,
        max_position_embeddings=2048,
    )
    from multimodal_sae_tpu.models.llama import init_llama_params

    fcfg = dataclasses.replace(cfg, flash_attention=True)
    params = init_llama_params(jax.random.PRNGKey(5), cfg)
    S = 1100  # >= 1024 and not a multiple of 512: pads to 1536
    ids = jnp.asarray(np.random.default_rng(5).integers(0, 64, size=(1, S)))
    amask = np.ones((1, S), np.int32)
    amask[0, 1050:] = 0

    ref = llama_forward(params, cfg, ids, attention_mask=jnp.asarray(amask))
    got = llama_forward(params, fcfg, ids, attention_mask=jnp.asarray(amask))
    a = np.asarray(ref["logits"][0, :1050], np.float32)
    b = np.asarray(got["logits"][0, :1050], np.float32)
    np.testing.assert_allclose(a, b, rtol=3e-3, atol=3e-3)

    def metric(c, delta):
        out = llama_forward(
            params, c, ids, interventions={"layers.0": lambda h: h + delta}
        )
        return out["logits"][0, 1049, 5]

    z = jnp.zeros((1, S, 32))
    g = jax.grad(lambda d: metric(fcfg, d))(z)
    ge = jax.grad(lambda d: metric(cfg, d))(z)
    rel = float(jnp.linalg.norm(g - ge) / (jnp.linalg.norm(ge) + 1e-9))
    assert np.isfinite(np.asarray(g)).all() and rel < 5e-3, rel


def test_capture_with_explicit_masks():
    """capture() drops an all-ones mask (fast flash route) but honors a
    padded one — both must match the maskless / masked forward exactly."""
    cfg = LlamaConfig(
        vocab_size=64,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
        rope_theta=10000.0,
    )
    from multimodal_sae_tpu.models.llama import LlamaModel, init_llama_params

    params = init_llama_params(jax.random.PRNGKey(7), cfg)
    model = LlamaModel(params, cfg)
    ids = np.random.default_rng(7).integers(1, 64, size=(2, 10))
    ones = np.ones((2, 10), np.int64)
    c_none = model.capture({"input_ids": ids}, ["layers.1"])
    c_ones = model.capture({"input_ids": ids, "attention_mask": ones}, ["layers.1"])
    np.testing.assert_array_equal(
        np.asarray(c_none["layers.1"]), np.asarray(c_ones["layers.1"])
    )
    pad = ones.copy()
    pad[1, 8:] = 0
    c_pad = model.capture({"input_ids": ids, "attention_mask": pad}, ["layers.1"])
    ref = llama_forward(
        params, cfg, jnp.asarray(ids), attention_mask=jnp.asarray(pad),
        capture=("layers.1",), return_logits=False,
    )["captured"]["layers.1"]
    np.testing.assert_allclose(
        np.asarray(c_pad["layers.1"]), np.asarray(ref), rtol=1e-4, atol=1e-5
    )


def test_flash_block_sizes_construct():
    """The 512-wide BlockSizes the TPU branch builds must stay constructible
    against the installed jax (the CPU tests never execute that branch, so a
    kwarg rename in jax would otherwise surface only on hardware)."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    b = 512
    bs = _fa.BlockSizes(
        block_q=b, block_k_major=b, block_k=b, block_b=1,
        block_q_major_dkv=b, block_k_major_dkv=b,
        block_k_dkv=b, block_q_dkv=b,
        block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
    )
    assert bs.block_q == 512 and bs.block_k_major == 512


def test_hookpoint_spelling_consistent_across_paths(tiny):
    """'model.layers.N' (the reference's spelling) and 'layers.N' must behave
    identically for interventions AND capture on the unrolled path — the
    spelling-sensitive match silently dropped 'model.'-prefixed hooks when
    capture forced the unrolled path."""
    _, cfg, params = tiny
    ids = jnp.array([[1, 2, 3, 4]])

    def bump(h):
        return h + 1.0

    a = llama_forward(
        params, cfg, ids,
        interventions={"layers.1": bump}, capture=("layers.1",),
    )
    b = llama_forward(
        params, cfg, ids,
        interventions={"model.layers.1": bump}, capture=("model.layers.1",),
    )
    np.testing.assert_array_equal(
        np.asarray(a["logits"]), np.asarray(b["logits"])
    )
    np.testing.assert_array_equal(
        np.asarray(a["captured"]["layers.1"]),
        np.asarray(b["captured"]["model.layers.1"]),
    )
    # Non-layer hookpoints fail loudly instead of silently not capturing.
    with pytest.raises(ValueError, match="unsupported hookpoint"):
        llama_forward(params, cfg, ids, capture=("norm",))


def test_suffix_forward_last_logit_respects_padding(tiny):
    """forward_from_layer_above(last_logit_only=True) must read each row's
    LAST ATTENDED position: right-padded rows previously got pad-position
    logits."""
    from multimodal_sae_tpu.models.llama import forward_from_layer_above

    _, cfg, params = tiny
    ids_short = jnp.array([[5, 6, 7]])
    out = llama_forward(params, cfg, ids_short, capture=("layers.0",))
    h_short = out["captured"]["layers.0"]
    ref = forward_from_layer_above(params, cfg, h_short, 0)  # (1, 1, V)

    # Right-pad the captured hidden (pad embeds vary; zeros suffice — they
    # must not influence the answer once masked).
    h_pad = jnp.concatenate([h_short, jnp.zeros((1, 2, cfg.hidden_size))], axis=1)
    mask = jnp.array([[1, 1, 1, 0, 0]])
    got = forward_from_layer_above(params, cfg, h_pad, 0, attention_mask=mask)
    np.testing.assert_allclose(
        np.asarray(got)[0, 0], np.asarray(ref)[0, 0], rtol=1e-4, atol=1e-5
    )

    # Left-padded rows keep selecting the final column (the previous, correct
    # behavior for the left-padded attribution batches).
    h_lpad = jnp.concatenate([jnp.zeros((1, 2, cfg.hidden_size)), h_short], axis=1)
    lmask = jnp.array([[0, 0, 1, 1, 1]])
    got_l = forward_from_layer_above(params, cfg, h_lpad, 0, attention_mask=lmask)
    full_l = forward_from_layer_above(
        params, cfg, h_lpad, 0, attention_mask=lmask, last_logit_only=False
    )
    np.testing.assert_allclose(
        np.asarray(got_l)[0, 0], np.asarray(full_l)[0, -1], rtol=1e-4, atol=1e-5
    )


def test_do_sample_zero_temperature_raises(tiny):
    _, cfg, params = tiny
    with pytest.raises(ValueError, match="temperature > 0"):
        greedy_generate(
            params, cfg, jnp.array([[1, 2, 3]]), max_new_tokens=2,
            do_sample=True, temperature=0.0,
        )


def test_bias_checkpoint_config_raises():
    with pytest.raises(NotImplementedError, match="bias"):
        LlamaConfig.from_hf({"hidden_size": 64, "attention_bias": True})
    with pytest.raises(NotImplementedError, match="bias"):
        LlamaConfig.from_hf({"hidden_size": 64, "mlp_bias": True})


def _tiny_cfg(**kw):
    base = dict(
        vocab_size=64,
        hidden_size=16,
        intermediate_size=32,
        num_hidden_layers=2,
        num_attention_heads=2,
        num_key_value_heads=1,
    )
    base.update(kw)
    return LlamaConfig(**base)


def test_untied_missing_lm_head_raises_and_nested_sibling_resolves():
    """Review r5: an untied checkpoint with no findable lm_head must raise
    (the old warn-and-reuse-embed fallback made every logit silently wrong),
    and the sibling candidate for the post-4.52 nested prefix
    'model.language_model.' must be 'model.lm_head.weight' (the old
    fixed-6-char strip produced 'model.language_lm_head.weight')."""
    import torch

    from multimodal_sae_tpu.models.hf_loader import llama_params_from_state_dict

    cfg = _tiny_cfg(tie_word_embeddings=False)

    def sd_for(prefix, head_key=None):
        H, kvH, hd = 2, 1, 8
        D, I, V = 16, 32, 64
        sd = {
            f"{prefix}embed_tokens.weight": torch.zeros(V, D),
            f"{prefix}norm.weight": torch.ones(D),
        }
        for i in range(2):
            p = f"{prefix}layers.{i}."
            sd.update(
                {
                    p + "input_layernorm.weight": torch.ones(D),
                    p + "self_attn.q_proj.weight": torch.zeros(H * hd, D),
                    p + "self_attn.k_proj.weight": torch.zeros(kvH * hd, D),
                    p + "self_attn.v_proj.weight": torch.zeros(kvH * hd, D),
                    p + "self_attn.o_proj.weight": torch.zeros(D, H * hd),
                    p + "post_attention_layernorm.weight": torch.ones(D),
                    p + "mlp.gate_proj.weight": torch.zeros(I, D),
                    p + "mlp.up_proj.weight": torch.zeros(I, D),
                    p + "mlp.down_proj.weight": torch.zeros(D, I),
                }
            )
        if head_key:
            sd[head_key] = torch.full((V, D), 3.0)
        return sd

    with pytest.raises(KeyError, match="lm_head"):
        llama_params_from_state_dict(sd_for("model."), cfg, prefix="model.")

    # Nested post-4.52 layout: head at the true sibling path.
    nested = "model.language_model."
    params = llama_params_from_state_dict(
        sd_for(nested, head_key="model.lm_head.weight"), cfg, prefix=nested
    )
    assert "lm_head" in params
    np.testing.assert_allclose(np.asarray(params["lm_head"])[0, 0], 3.0)


def test_llama_model_prepare_inputs_and_generic_forward():
    """Review r5: LlamaModel now implements prepare_inputs (ragged rows
    right-padded with a mask) and a traceable forward() — the generic
    SAE-splice path's contract — matching the direct capture path."""
    from multimodal_sae_tpu.models.llama import LlamaModel, init_llama_params

    cfg = _tiny_cfg()
    model = LlamaModel(init_llama_params(jax.random.PRNGKey(0), cfg), cfg)

    batch = model.prepare_inputs(prompt_ids=[[1, 2, 3], [4, 5]])
    assert batch["input_ids"].shape == (2, 3)
    np.testing.assert_array_equal(batch["attention_mask"], [[1, 1, 1], [1, 1, 0]])
    with pytest.raises(ValueError, match="text-only"):
        model.prepare_inputs(images=[object()], prompt_ids=[[1]])

    out = model.forward(batch, capture=("layers.1",))
    assert out["logits"].shape == (2, 3, cfg.vocab_size)
    caps = model.capture(batch, ["layers.1"])
    # capture() is jitted, forward() traceable-eager: fp32 fusion noise only.
    np.testing.assert_allclose(
        np.asarray(out["captured"]["layers.1"]),
        np.asarray(caps["layers.1"]),
        rtol=1e-5,
        atol=1e-5,
    )

    # The generic splice path runs on the REAL model now (not a test shim).
    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.features.patching.utils import (
        spliced_forward_with_delta,
    )
    from multimodal_sae_tpu.sae import Sae

    sae = Sae(16, SaeConfig(num_latents=32, k=4), key=jax.random.PRNGKey(1))
    zeros = {"layers.1": jnp.zeros((2, 3, 16))}
    logits, cache = spliced_forward_with_delta(
        model, batch, {"layers.1": sae}, zeros
    )
    assert logits.shape == (2, 3, cfg.vocab_size)
    assert cache["layers.1"].shape == (2, 3, 16)
