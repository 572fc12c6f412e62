"""LLaVA-NeXT parity vs HF transformers (torch CPU, fp32) with a tiny random
model: anyres preprocessing bit-parity against LlavaNextImageProcessor,
packed-feature forward logits, hookpoint capture, and token-count arithmetic."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_sae_tpu.models.llava_next import (
    LlavaNextConfig,
    LlavaNextModel,
    get_number_of_features,
    image_size_to_num_patches,
    llava_params_from_state_dict,
    preprocess_anyres,
    select_best_resolution,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from PIL import Image

PINPOINTS = [[32, 64], [64, 32], [64, 64]]
IMG_TOKEN = 250


def _hf_tiny():
    text_cfg = dict(
        vocab_size=256,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=512,
        rope_theta=10000.0,
    )
    vision_cfg = dict(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
    )
    cfg = transformers.LlavaNextConfig(
        vision_config=transformers.CLIPVisionConfig(**vision_cfg),
        text_config=transformers.LlamaConfig(**text_cfg),
        image_grid_pinpoints=PINPOINTS,
        image_token_index=IMG_TOKEN,
        vision_feature_layer=-2,
        vision_feature_select_strategy="default",
    )
    torch.manual_seed(0)
    model = transformers.LlavaNextForConditionalGeneration(cfg).eval().to(torch.float32)
    return model, cfg


@pytest.fixture(scope="module")
def tiny():
    hf, hf_cfg = _hf_tiny()
    cfg = LlavaNextConfig.from_hf(hf_cfg.to_dict())
    sd = {k: v for k, v in hf.state_dict().items()}
    params = llava_params_from_state_dict(sd, cfg, dtype=jnp.float32)
    return hf, cfg, params


@pytest.fixture(scope="module")
def images():
    rng = np.random.default_rng(0)
    return [
        Image.fromarray(rng.integers(0, 255, size=(50, 70, 3), dtype=np.uint8)),
        Image.fromarray(rng.integers(0, 255, size=(90, 40, 3), dtype=np.uint8)),
    ]


def test_preprocess_matches_hf_processor(tiny, images):
    _, cfg, _ = tiny
    hf_proc = transformers.LlavaNextImageProcessor(
        size={"shortest_edge": 32},
        crop_size={"height": 32, "width": 32},
        image_grid_pinpoints=PINPOINTS,
    )
    for img in images:
        ref = hf_proc(img, return_tensors="np")
        pv, size = preprocess_anyres(img, cfg)
        ref_pv = ref["pixel_values"][0]
        assert pv.shape == ref_pv.shape, (pv.shape, ref_pv.shape)
        np.testing.assert_allclose(pv, ref_pv, atol=2e-5)
        assert tuple(ref["image_sizes"][0]) == size


def test_token_count_matches_hf_model(tiny, images):
    hf, cfg, _ = tiny
    for img in images:
        h, w = img.size[1], img.size[0]
        n = get_number_of_features(h, w, cfg)
        # HF's own expansion arithmetic via the processor-free path: run the
        # model with n placeholder tokens; a mismatch raises in HF.
        hf_proc = transformers.LlavaNextImageProcessor(
            size={"shortest_edge": 32},
            crop_size={"height": 32, "width": 32},
            image_grid_pinpoints=PINPOINTS,
        )
        enc = hf_proc(img, return_tensors="pt")
        ids = torch.tensor([[1, 2] + [IMG_TOKEN] * n + [3]])
        with torch.no_grad():
            out = hf(
                input_ids=ids,
                pixel_values=enc["pixel_values"].float(),
                image_sizes=enc["image_sizes"],
            )
        assert out.logits.shape[1] == ids.shape[1]


def test_forward_matches_hf(tiny, images):
    hf, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    img = images[0]
    prompt = [1, 2, IMG_TOKEN, 3, 4]
    batch = model.prepare_inputs(images=[img], prompt_ids=[prompt])

    with torch.no_grad():
        hf_out = hf(
            input_ids=torch.tensor(np.asarray(batch["input_ids"])),
            pixel_values=torch.tensor(np.asarray(batch["pixel_values"][0]))[None].float(),
            image_sizes=torch.tensor([list(batch["image_sizes"][0])]),
            attention_mask=torch.tensor(np.asarray(batch["attention_mask"])),
            output_hidden_states=True,
        )
    out = model.forward(batch, capture=("model.layers.0",))
    np.testing.assert_allclose(
        np.asarray(out["logits"]), hf_out.logits.numpy(), rtol=3e-4, atol=3e-5
    )
    np.testing.assert_allclose(
        np.asarray(out["captured"]["model.layers.0"]),
        hf_out.hidden_states[1].numpy(),
        rtol=3e-4,
        atol=3e-5,
    )


def test_capture_activation_source(tiny, images):
    _, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    batch = model.prepare_inputs(images=[images[1]], prompt_ids=[[1, IMG_TOKEN]])
    caps = model.capture(batch, ["model.layers.1"])
    assert caps["model.layers.1"].shape[-1] == cfg.text_config.hidden_size
    assert model.hookpoint_names()[0] == "model.layers.0"


def test_select_best_resolution():
    assert select_best_resolution((50, 70), PINPOINTS) in [(32, 64), (64, 64)]
    # exact HF agreement
    from transformers.image_processing_utils import (
        select_best_resolution as hf_select,
    )

    for size in [(50, 70), (90, 40), (64, 64), (10, 300)]:
        assert select_best_resolution(size, PINPOINTS) == tuple(
            hf_select(size, PINPOINTS)
        )


def test_num_patches():
    cfg = LlavaNextConfig.from_hf(
        {
            "image_grid_pinpoints": PINPOINTS,
            "vision_config": {"image_size": 32, "patch_size": 16},
        }
    )
    n = image_size_to_num_patches((50, 70), PINPOINTS, 32)
    pv, _ = preprocess_anyres(
        Image.new("RGB", (70, 50)), cfg
    )
    assert pv.shape[0] == n


def test_capture_accepts_stacked_pixel_values(tiny, images):
    """pixel_values as ONE stacked numpy array (collated batches / HF
    BatchFeature) must work: re-iterating a stacked array yields fresh row
    views, which the id()-keyed image dedupe must not trip over."""
    _, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    img = images[0]
    prepared = model.prepare_inputs(
        images=[img, img], prompt_ids=[[1, IMG_TOKEN, 2]] * 2
    )
    hook = model.hookpoint_names()[-1]
    ref = model.capture(prepared, [hook])[hook]

    stacked = dict(prepared)
    stacked["pixel_values"] = np.stack(
        [np.asarray(pv) for pv in prepared["pixel_values"]]
    )
    got = model.capture(stacked, [hook])[hook]
    np.testing.assert_allclose(
        np.asarray(ref), np.asarray(got), rtol=1e-5, atol=1e-5
    )

    # Text-only batch that still carries an empty pixel_values list.
    empty = {"input_ids": np.array([[1, 2, 3]]), "pixel_values": []}
    out = model.capture(empty, [hook])[hook]
    assert out.shape[1] == 3


def test_generate_right_padded_multi_image_batch(tiny, images):
    """prepare_inputs right-pads heterogeneous batches; generate must
    re-pack to left padding (greedy_generate's requirement) and match
    per-row generation."""
    from multimodal_sae_tpu.models.llava_next import LlavaNextModel

    _, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    prompts = [[1, IMG_TOKEN, 2], [1, IMG_TOKEN, 2, 3]]
    batch = model.prepare_inputs(images=images, prompt_ids=prompts)
    # The two images have different anyres geometries -> unequal expanded
    # lengths -> right-padded batch (this used to raise in generate).
    assert (np.asarray(batch["attention_mask"])[:, -1] == 0).any()
    out = np.asarray(model.generate(batch, max_new_tokens=3))
    for i in range(2):
        single = model.prepare_inputs(images=[images[i]], prompt_ids=[prompts[i]])
        ref = np.asarray(model.generate(single, max_new_tokens=3))
        np.testing.assert_array_equal(out[i, -3:], ref[0, -3:])


def test_capture_with_int8_tower(tiny, images):
    """Opt-in int8 vision tower through the full multimodal capture path:
    captures stay close to the fp32 run (W8A8 tolerance)."""
    import dataclasses

    from multimodal_sae_tpu.models.llava_next import LlavaNextModel
    from multimodal_sae_tpu.models.quant import (
        quantize_clip_params,
        quantize_llama_params,
    )

    _, cfg, params = tiny
    ref_model = LlavaNextModel(params, cfg)
    batch = ref_model.prepare_inputs(images=[images[0]], prompt_ids=[[1, IMG_TOKEN, 2]])
    ref = np.asarray(ref_model.capture(batch, ["model.layers.1"])["model.layers.1"])

    qparams = dict(params)
    qparams["language_model"] = quantize_llama_params(params["language_model"])
    qparams["vision_tower"] = quantize_clip_params(params["vision_tower"])
    qcfg = dataclasses.replace(
        cfg,
        text_config=dataclasses.replace(cfg.text_config, int8_matmul=True),
        vision_config=dataclasses.replace(cfg.vision_config, int8_matmul=True),
    )
    qmodel = LlavaNextModel(qparams, qcfg)
    got = np.asarray(qmodel.capture(batch, ["model.layers.1"])["model.layers.1"])
    rel = np.linalg.norm(got.astype(np.float32) - ref) / np.linalg.norm(ref)
    assert np.isfinite(got).all() and rel < 0.15, rel


def test_capture_roundtrips_caller_spelling(tiny, images):
    """Captured keys must come back under the SPELLING the caller passed —
    'layers.N' worked on input (index-matched) but was returned only as
    'model.layers.N', breaking the capture(batch, [hook])[hook] pattern."""
    _, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    batch = model.prepare_inputs(images=[images[0]], prompt_ids=[[1, IMG_TOKEN]])
    caps_a = model.capture(batch, ["layers.1"])
    caps_b = model.capture(batch, ["model.layers.1"])
    assert list(caps_a) == ["layers.1"] and list(caps_b) == ["model.layers.1"]
    np.testing.assert_array_equal(
        np.asarray(caps_a["layers.1"]), np.asarray(caps_b["model.layers.1"])
    )


def test_maybe_prepare_strips_padding(tiny, images):
    """A raw pre-padded batch (input_ids + attention_mask + images) must
    capture identically to its unpadded form — re-preparing padded rows used
    to mark former pad tokens as real prompt tokens."""
    _, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    prompt = [1, IMG_TOKEN, 7, 8]
    ref = model.capture(
        {"input_ids": np.array([prompt]), "images": [images[0]]},
        ["model.layers.1"],
    )["model.layers.1"]
    padded = model.capture(
        {
            "input_ids": np.array([prompt + [0, 0, 0]]),
            "attention_mask": np.array([[1, 1, 1, 1, 0, 0, 0]]),
            "images": [images[0]],
        },
        ["model.layers.1"],
    )["model.layers.1"]
    np.testing.assert_allclose(
        np.asarray(padded), np.asarray(ref), rtol=1e-5, atol=1e-6
    )


def test_prepare_inputs_row_image_mismatch_raises(tiny, images):
    _, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    with pytest.raises(ValueError, match="one image per row"):
        model.prepare_inputs(
            images=[images[0]],
            prompt_ids=[[1, IMG_TOKEN], [2, IMG_TOKEN]],
        )


def test_clip_tower_honors_gelu_act():
    """hidden_act from the checkpoint config must be applied (exact erf
    'gelu' vs the quick_gelu CLIP-L default)."""
    from multimodal_sae_tpu.models.clip_vit import (
        ClipVisionConfig,
        clip_params_from_state_dict,
        clip_vision_forward,
    )

    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=48,
        intermediate_size=96,
        num_hidden_layers=3,
        num_attention_heads=4,
        image_size=32,
        patch_size=16,
        hidden_act="gelu",
    )
    torch.manual_seed(1)
    hf = transformers.CLIPVisionModel(hf_cfg).eval().to(torch.float32)
    cfg = ClipVisionConfig.from_hf(hf_cfg.to_dict())
    assert cfg.hidden_act == "gelu"
    params = clip_params_from_state_dict(hf.state_dict(), cfg, dtype=jnp.float32)
    pv = np.random.default_rng(3).normal(size=(1, 3, 32, 32)).astype(np.float32)
    with torch.no_grad():
        ref = hf(torch.from_numpy(pv), output_hidden_states=True).hidden_states[-2]
    got = clip_vision_forward(params, cfg, jnp.asarray(pv))["features"]
    np.testing.assert_allclose(
        np.asarray(got), ref.numpy(), rtol=2e-4, atol=2e-5
    )
    with pytest.raises(NotImplementedError):
        clip_vision_forward(
            params,
            ClipVisionConfig.from_hf({**hf_cfg.to_dict(), "hidden_act": "silu"}),
            jnp.asarray(pv),
        )


def test_capture_data_parallel_matches_single_device(tiny, images):
    """`--dp N` on the multimodal path: vision-tower geometry groups are
    sharded over the ('data',) mesh (padded commit — two images of distinct
    geometries make per-group sizes of 1, below the mesh size) and the
    language-model forward runs batch-sharded; captures must equal the
    unsharded model's exactly (fp32, CPU mesh)."""
    import jax

    from multimodal_sae_tpu.parallel import shard_subject_model_dp

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")

    _, cfg, params = tiny
    ref_model = LlavaNextModel(params, cfg)
    dp_model = LlavaNextModel(params, cfg)
    dp_model, _ = shard_subject_model_dp(dp_model, 2)

    prompt_ids = [[1, 2, IMG_TOKEN, 3], [4, IMG_TOKEN, 5]]  # ragged -> padding
    ref_batch = ref_model.prepare_inputs(images=images, prompt_ids=prompt_ids)
    dp_batch = dp_model.prepare_inputs(images=images, prompt_ids=prompt_ids)
    hook = ["layers.1"]
    ref = ref_model.capture(ref_batch, hook)["layers.1"]
    out = dp_model.capture(dp_batch, hook)["layers.1"]
    assert out.shape == ref.shape
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_forward_with_intervention_nondivisible_dp_rows(tiny, images):
    """Interventions are shaped to the true batch, so a `--dp` model must NOT
    row-pad an intervened batch that does not divide the mesh — it falls back
    to the unsharded path and matches the plain model exactly."""
    import jax

    from multimodal_sae_tpu.parallel import shard_subject_model_dp

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")

    _, cfg, params = tiny
    ref_model = LlavaNextModel(params, cfg)
    dp_model = LlavaNextModel(params, cfg)
    dp_model, _ = shard_subject_model_dp(dp_model, 2)

    prompt_ids = [[1, 2, IMG_TOKEN, 3]]  # B=1: does not divide the mesh
    batch = ref_model.prepare_inputs(images=images[:1], prompt_ids=prompt_ids)
    iv = {"layers.1": lambda h: h * 1.5}
    ref = ref_model.forward(batch, capture=["layers.0"], interventions=iv)
    out = dp_model.forward(
        dp_model.prepare_inputs(images=images[:1], prompt_ids=prompt_ids),
        capture=["layers.0"],
        interventions=iv,
    )
    np.testing.assert_allclose(
        np.asarray(out["logits"]), np.asarray(ref["logits"]), rtol=1e-6, atol=1e-6
    )


def test_prepare_inputs_threaded_matches_sequential(tiny, images):
    """The thread-pooled anyres preprocessing must be byte-identical to the
    sequential path, and duplicate image objects must share one result
    (feeding _embed_multimodal's id-keyed feature memo)."""
    import os

    _, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    # Duplicates of images[0] plus a distinct image; ragged prompts.
    imgs = [images[0], images[1], images[0]]
    prompts = [[1, IMG_TOKEN], [2, IMG_TOKEN, 3], [IMG_TOKEN, 4]]

    old = os.environ.get("MMSAE_PREP_WORKERS")
    try:
        os.environ["MMSAE_PREP_WORKERS"] = "4"
        threaded = model.prepare_inputs(images=imgs, prompt_ids=prompts)
        os.environ["MMSAE_PREP_WORKERS"] = "1"
        seq = model.prepare_inputs(images=imgs, prompt_ids=prompts)
    finally:
        if old is None:
            os.environ.pop("MMSAE_PREP_WORKERS", None)
        else:
            os.environ["MMSAE_PREP_WORKERS"] = old

    np.testing.assert_array_equal(threaded["input_ids"], seq["input_ids"])
    np.testing.assert_array_equal(
        threaded["attention_mask"], seq["attention_mask"]
    )
    assert threaded["image_sizes"] == seq["image_sizes"]
    for a, b in zip(threaded["pixel_values"], seq["pixel_values"]):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # Duplicate rows share ONE preprocessed array (memo input downstream).
    assert threaded["pixel_values"][0] is threaded["pixel_values"][2]


def test_text_only_prepare_inputs_pads_ragged_rows(tiny):
    """Review r5: text-only prepare_inputs with ragged prompt_ids (the
    attribution flow's call shape) used to return np.asarray(None); now it
    right-pads with a mask like the image path."""
    from multimodal_sae_tpu.models.llava_next import LlavaNextModel

    _, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    batch = model.prepare_inputs(images=None, prompt_ids=[[1, 2, 3], [4, 5]])
    assert batch["input_ids"].shape == (2, 3)
    np.testing.assert_array_equal(
        batch["attention_mask"], [[1, 1, 1], [1, 1, 0]]
    )


def test_jit_cache_lru_cap(tiny):
    """Review r5: the compiled-program cache is LRU-capped — churning
    closure interventions can no longer pin unbounded executables (and
    their captured arrays)."""
    from multimodal_sae_tpu.models.llava_next import LlavaNextModel

    _, cfg, params = tiny
    model = LlavaNextModel(params, cfg)
    model._jit_cache.clear()
    cap = model._JIT_CACHE_CAP
    try:
        LlavaNextModel._JIT_CACHE_CAP = 3
        for i in range(5):
            model._jit_cached(("k", i), lambda: object())
        assert len(model._jit_cache) == 3
        assert ("k", 4) in model._jit_cache and ("k", 0) not in model._jit_cache
        # Recency refresh: touching an old key saves it from eviction.
        model._jit_cached(("k", 2), lambda: object())
        model._jit_cached(("k", 5), lambda: object())
        assert ("k", 2) in model._jit_cache and ("k", 3) not in model._jit_cache
    finally:
        LlavaNextModel._JIT_CACHE_CAP = cap
        model._jit_cache.clear()
