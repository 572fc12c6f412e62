"""CLIP (vision tower, text tower, CLIP-Score) parity vs HF transformers and
torchmetrics semantics, with tiny random models."""

import numpy as np
import pytest

import jax.numpy as jnp

from multimodal_sae_tpu.models.clip_full import (
    ClipTextConfig,
    clip_model_params_from_state_dict,
    clip_score,
    preprocess_clip_image,
)
from multimodal_sae_tpu.models.clip_vit import ClipVisionConfig

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from PIL import Image


@pytest.fixture(scope="module")
def tiny_clip():
    cfg = transformers.CLIPConfig(
        text_config_dict=None,
        vision_config=transformers.CLIPVisionConfig(
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=16,
            projection_dim=32,
        ).to_dict(),
        text_config=transformers.CLIPTextConfig(
            vocab_size=99,
            hidden_size=40,
            intermediate_size=80,
            num_hidden_layers=2,
            num_attention_heads=4,
            max_position_embeddings=16,
            projection_dim=32,
            eos_token_id=98,
        ).to_dict(),
        projection_dim=32,
    )
    torch.manual_seed(0)
    hf = transformers.CLIPModel(cfg).eval().to(torch.float32)
    vision_cfg = ClipVisionConfig.from_hf(cfg.vision_config.to_dict())
    text_cfg = ClipTextConfig.from_hf(cfg.text_config.to_dict())
    params = clip_model_params_from_state_dict(
        dict(hf.state_dict()), vision_cfg, text_cfg
    )
    return hf, vision_cfg, text_cfg, params


def test_clip_embeddings_match_hf(tiny_clip):
    hf, vision_cfg, text_cfg, params = tiny_clip
    rng = np.random.default_rng(0)
    pv = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    ids = np.array([[1, 5, 9, 98], [2, 7, 98, 0]])  # 98 = max id = "EOT"

    with torch.no_grad():
        img_ref = hf.get_image_features(pixel_values=torch.tensor(pv))
        txt_ref = hf.get_text_features(input_ids=torch.tensor(ids))

    from multimodal_sae_tpu.models.clip_full import clip_embed_image, clip_embed_text

    img = clip_embed_image(params, vision_cfg, jnp.asarray(pv))
    txt = clip_embed_text(params, text_cfg, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(img), img_ref.numpy(), rtol=2e-4, atol=2e-5)
    np.testing.assert_allclose(np.asarray(txt), txt_ref.numpy(), rtol=2e-4, atol=2e-5)


def test_clip_score_semantics(tiny_clip):
    hf, vision_cfg, text_cfg, params = tiny_clip
    rng = np.random.default_rng(1)
    pv = rng.normal(size=(1, 3, 32, 32)).astype(np.float32)
    ids = np.array([[1, 5, 9, 98]])

    with torch.no_grad():
        img = hf.get_image_features(pixel_values=torch.tensor(pv))
        txt = hf.get_text_features(input_ids=torch.tensor(ids))
        img = img / img.norm(dim=-1, keepdim=True)
        txt = txt / txt.norm(dim=-1, keepdim=True)
        ref = max(float(100 * (img * txt).sum()), 0.0)

    ours = float(clip_score(params, vision_cfg, text_cfg, jnp.asarray(pv), jnp.asarray(ids))[0])
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)


def test_preprocess_clip_image_matches_hf():
    proc = transformers.CLIPImageProcessor(
        size={"shortest_edge": 32}, crop_size={"height": 32, "width": 32}
    )
    rng = np.random.default_rng(2)
    img = Image.fromarray(rng.integers(0, 255, size=(50, 70, 3), dtype=np.uint8))
    ref = proc(img, return_tensors="np")["pixel_values"][0]
    ours = preprocess_clip_image(img, 32)
    np.testing.assert_allclose(ours, ref, atol=2e-5)
