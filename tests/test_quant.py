"""Int8 weight-only subject-model path (models/quant.py) — the TPU equivalent
of the reference's bitsandbytes 8-bit load (reference train/sae/sae/
__main__.py:66-97) and fp8-Quanto attribution model (reference
sae_auto_interp/utils.py:91-103)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.models.llama import (
    LlamaConfig,
    LlamaModel,
    greedy_generate,
    init_llama_params,
    llama_forward,
    stack_layer_params,
)
from multimodal_sae_tpu.models.quant import (
    dequantize_weight,
    is_quantized,
    qmatmul,
    quantize_llama_params,
    quantize_weight,
)

CFG = LlamaConfig(
    vocab_size=256,
    hidden_size=64,
    intermediate_size=128,
    num_hidden_layers=2,
    num_attention_heads=4,
    num_key_value_heads=2,
    max_position_embeddings=128,
)


@pytest.fixture(scope="module")
def fp32_and_q8():
    params = init_llama_params(jax.random.PRNGKey(0), CFG, dtype=jnp.float32)
    return params, quantize_llama_params(params)


def test_quantize_roundtrip_exact_for_representable_weights():
    # Columns that are exact multiples of their scale dequantize bit-exactly.
    scale = np.array([0.5, 0.25], np.float32)
    # absmax of each column must hit 127 * scale for the scale to reproduce.
    w = (np.array([[3, -7], [127, 127], [-127, 0]], np.float32) * scale).astype(
        np.float32
    )
    q = quantize_weight(jnp.asarray(w))
    assert q["q8"].dtype == jnp.int8
    np.testing.assert_array_equal(np.asarray(dequantize_weight(q)), w)


def test_qmatmul_matches_dequantized_dense():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(8, 32)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    q = quantize_weight(w)
    np.testing.assert_allclose(
        np.asarray(qmatmul(x, q)),
        np.asarray(x @ dequantize_weight(q)),
        rtol=1e-5,
        atol=1e-5,
    )


def test_quantized_forward_close_to_fp32(fp32_and_q8):
    params, qparams = fp32_and_q8
    assert is_quantized(qparams["layers"][0]["q_proj"])
    assert is_quantized(qparams["embed_tokens"])
    ids = jnp.asarray(np.arange(1, 9)[None, :])
    ref = llama_forward(params, CFG, ids, capture=("layers.1",))
    got = llama_forward(qparams, CFG, ids, capture=("layers.1",))
    for key in ("logits",):
        a, b = np.asarray(ref[key]).ravel(), np.asarray(got[key]).ravel()
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert cos > 0.995, cos
    a = np.asarray(ref["captured"]["layers.1"])
    b = np.asarray(got["captured"]["layers.1"])
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.05, rel


def test_quantized_grad_flows_for_attribution(fp32_and_q8):
    """Attribution backward through the int8 subject: grads reach the spliced
    hidden state (weights are frozen, only input grads are needed)."""
    _, qparams = fp32_and_q8
    ids = jnp.array([[1, 2, 3, 4]])

    def metric(delta):
        out = llama_forward(
            qparams, CFG, ids, interventions={"layers.0": lambda h: h + delta}
        )
        return out["logits"][0, -1, 7]

    g = jax.grad(metric)(jnp.zeros((1, 4, CFG.hidden_size)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_quantized_generate_and_stacking(fp32_and_q8):
    params, qparams = fp32_and_q8
    stacked = stack_layer_params(qparams)
    assert is_quantized(stacked["layers"]["q_proj"])
    assert stacked["layers"]["q_proj"]["q8"].shape[0] == CFG.num_hidden_layers
    ids = jnp.array([[1, 5, 9, 42]])
    out = greedy_generate(qparams, CFG, ids, max_new_tokens=4)
    assert out.shape == (1, 8)
    # Greedy tokens usually survive int8 weight quantization on a tiny model.
    ref = greedy_generate(params, CFG, ids, max_new_tokens=4)
    assert (np.asarray(out) == np.asarray(ref)).mean() >= 0.5


def test_quantized_capture_protocol(fp32_and_q8):
    _, qparams = fp32_and_q8
    model = LlamaModel(qparams, CFG)
    caps = model.capture({"input_ids": np.array([[1, 2, 3]])}, ["layers.0"])
    assert caps["layers.0"].shape == (1, 3, CFG.hidden_size)


def test_quantized_memory_halved(fp32_and_q8):
    params, qparams = fp32_and_q8

    def nbytes(tree):
        return sum(
            x.size * x.dtype.itemsize
            for x in jax.tree_util.tree_leaves(tree)
            if hasattr(x, "dtype")
        )

    # fp32 baseline -> int8 is ~4x; vs the bf16 deployment dtype it is ~2x.
    assert nbytes(qparams) < 0.30 * nbytes(params)


# --- int8x int8 MXU compute path (W8A8, cfg.int8_matmul) --------------------


def test_qmatmul_int8_exact_for_int8_scaled_inputs():
    """Rows that are already exact int8 grids survive activation quantization
    bit-exactly, so the int8 path must equal the dequantized dense product."""
    rng = np.random.default_rng(1)
    xq = rng.integers(-127, 128, size=(8, 32)).astype(np.float32)
    xq[:, 0] = 127  # pin each row's absmax so sx = 127*step/127 = step exactly
    x = jnp.asarray(xq * 0.03125)  # power-of-two row scale: exact in f32
    w = jnp.asarray(rng.normal(size=(32, 16)).astype(np.float32))
    q = quantize_weight(w)
    got = np.asarray(qmatmul(x, q, int8=True))
    want = np.asarray(x.astype(jnp.float32) @ dequantize_weight(q))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_qmatmul_int8_close_for_general_inputs():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(16, 64)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(64, 32)).astype(np.float32))
    q = quantize_weight(w)
    got = np.asarray(qmatmul(x, q, int8=True))
    want = np.asarray(x @ w)
    rel = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert rel < 0.02, rel  # W8A8 rounding noise only


def test_qmatmul_int8_zero_row_safe():
    x = jnp.zeros((4, 8), jnp.float32)
    q = quantize_weight(jnp.ones((8, 4), jnp.float32))
    assert np.asarray(qmatmul(x, q, int8=True)).sum() == 0.0


def test_qmatmul_int8_gradient_straight_through():
    """Backward = g @ W_dequant.T (ignores activation rounding) — exact for
    inputs on the int8 grid, and finite/nonzero in general."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 16)).astype(np.float32))
    w = jnp.asarray(rng.normal(size=(16, 8)).astype(np.float32))
    q = quantize_weight(w)

    g = jax.grad(lambda x: qmatmul(x, q, int8=True).sum())(x)
    want = jnp.ones((4, 8)) @ dequantize_weight(q).T
    np.testing.assert_allclose(np.asarray(g), np.asarray(want), rtol=2e-2, atol=2e-2)


def test_int8_matmul_forward_close_and_grad_flows(fp32_and_q8):
    """Full subject forward with cfg.int8_matmul: close to fp32 and
    attribution-style input grads flow."""
    import dataclasses

    params, qparams = fp32_and_q8
    cfg8 = dataclasses.replace(CFG, int8_matmul=True)
    ids = jnp.asarray(np.arange(1, 9)[None, :])
    ref = llama_forward(params, CFG, ids, capture=("layers.1",))
    got = llama_forward(qparams, cfg8, ids, capture=("layers.1",))
    a, b = np.asarray(ref["logits"]).ravel(), np.asarray(got["logits"]).ravel()
    cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
    assert cos > 0.99, cos

    def metric(delta):
        out = llama_forward(
            qparams, cfg8, ids, interventions={"layers.0": lambda h: h + delta}
        )
        return out["logits"][0, -1, 7]

    g = jax.grad(metric)(jnp.zeros((1, 8, CFG.hidden_size)))
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.abs(g).sum()) > 0


def test_int8_sae_encoder():
    """Opt-in W8A8 SAE encoder (sae/model.py quantize_encoder): pre_acts
    close to the dense path, top-k selection largely preserved, training
    forward refuses it, and load_saes honors the flag."""
    import jax
    import numpy as np

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.interp_utils import load_saes
    from multimodal_sae_tpu.sae import Sae
    from multimodal_sae_tpu.sae.model import (
        encode,
        forward,
        pre_acts,
        quantize_encoder,
    )

    d, L, k = 32, 128, 8
    cfg = SaeConfig(num_latents=L, k=k)
    sae = Sae(d, cfg, key=jax.random.PRNGKey(0))
    x = jax.random.normal(jax.random.PRNGKey(1), (64, d), dtype=jnp.float32)

    dense = np.asarray(pre_acts(sae.params, x), dtype=np.float64)
    qp = quantize_encoder(sae.params)
    quant = np.asarray(pre_acts(qp, x), dtype=np.float64)
    assert np.abs(quant - dense).max() < 0.05 * max(dense.max(), 1e-6)

    di = np.asarray(encode(sae.params, x, cfg).top_indices)
    qi = np.asarray(encode(qp, x, cfg).top_indices)
    overlap = np.mean(
        [len(set(a) & set(b)) / k for a, b in zip(di.tolist(), qi.tolist())]
    )
    assert overlap > 0.75, overlap

    with pytest.raises(AssertionError, match="dense encoder"):
        forward(qp, x, cfg)

    import tempfile
    from pathlib import Path

    with tempfile.TemporaryDirectory() as td:
        sae.save_to_disk(Path(td) / "layers.0")
        loaded = load_saes(td, int8_encoder=True)
        assert isinstance(loaded["layers.0"].params["W_enc"], dict)
        assert loaded["layers.0"].dtype == jnp.bfloat16


def test_quantized_clip_tower_close_to_dense():
    """Opt-in int8 vision tower: weight-only dequant and W8A8 paths both
    track the dense forward within int8 tolerance."""
    import dataclasses

    from multimodal_sae_tpu.models.clip_vit import (
        ClipVisionConfig,
        clip_vision_forward,
    )
    from multimodal_sae_tpu.models.quant import quantize_clip_params

    cfg = ClipVisionConfig(
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
    )
    rng = np.random.default_rng(0)

    def mat(shape, scale=0.05):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32) * scale)

    D, I = cfg.hidden_size, cfg.intermediate_size
    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "q_proj": mat((D, D)), "q_bias": jnp.zeros((D,)),
                "k_proj": mat((D, D)), "k_bias": jnp.zeros((D,)),
                "v_proj": mat((D, D)), "v_bias": jnp.zeros((D,)),
                "out_proj": mat((D, D)), "out_bias": jnp.zeros((D,)),
                "ln1": jnp.ones((D,)), "ln1_bias": jnp.zeros((D,)),
                "ln2": jnp.ones((D,)), "ln2_bias": jnp.zeros((D,)),
                "fc1": mat((D, I)), "fc1_bias": jnp.zeros((I,)),
                "fc2": mat((I, D)), "fc2_bias": jnp.zeros((D,)),
            }
        )
    params = {
        "patch_embedding": mat((3 * 16 * 16, D)),
        "class_embedding": mat((D,)),
        "position_embedding": mat((cfg.num_patches + 1, D)),
        "pre_layrnorm": jnp.ones((D,)), "pre_layrnorm_bias": jnp.zeros((D,)),
        "post_layernorm": jnp.ones((D,)), "post_layernorm_bias": jnp.zeros((D,)),
        "layers": layers,
    }
    pv = jnp.asarray(rng.normal(size=(2, 3, 32, 32)).astype(np.float32))
    ref = clip_vision_forward(params, cfg, pv)["features"]

    qp = quantize_clip_params(params)
    deq = clip_vision_forward(qp, cfg, pv)["features"]
    rel = float(
        jnp.linalg.norm((deq.astype(jnp.float32) - ref))
        / jnp.linalg.norm(ref)
    )
    assert rel < 0.05, rel

    i8cfg = dataclasses.replace(cfg, int8_matmul=True)
    w8a8 = clip_vision_forward(qp, i8cfg, pv)["features"]
    rel8 = float(
        jnp.linalg.norm((w8a8.astype(jnp.float32) - ref))
        / jnp.linalg.norm(ref)
    )
    assert rel8 < 0.08, rel8
