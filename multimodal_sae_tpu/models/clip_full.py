"""Full CLIP (text tower + projections) in JAX — the in-framework backend for
the CLIP-Score metric (reference clip_scorer.py uses torchmetrics' CLIPScore on
GPU; here the metric runs as a jitted TPU computation).

Numerics match HF `CLIPModel` (fp32): causal-masked text encoder with
quick_gelu MLPs, EOS pooling at the argmax token id, text/visual projections,
and score = max(0, 100 · cosine(image_emb, text_emb))."""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

from .clip_vit import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    ClipVisionConfig,
    clip_attention,
    clip_params_from_state_dict,
    clip_vision_forward,
    layer_norm,
    quick_gelu,
)



@dataclass(frozen=True)
class ClipTextConfig:
    vocab_size: int = 49408
    hidden_size: int = 512
    intermediate_size: int = 2048
    num_hidden_layers: int = 12
    num_attention_heads: int = 8
    max_position_embeddings: int = 77
    layer_norm_eps: float = 1e-5
    projection_dim: int = 512
    eos_token_id: int = 49407

    @classmethod
    def from_hf(cls, d: dict) -> "ClipTextConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


def clip_text_forward(params: dict, cfg: ClipTextConfig, input_ids: jax.Array):
    """Returns the pooled text embedding (B, D): final layer norm at the EOS
    position (HF pools at input_ids.argmax(-1), the highest token id == EOT)."""
    B, S = input_ids.shape
    h = params["token_embedding"][input_ids]
    h = h + params["position_embedding"][None, :S]

    neg = jnp.finfo(jnp.float32).min
    causal = jnp.where(
        jnp.arange(S)[None, :] <= jnp.arange(S)[:, None], 0.0, neg
    )[None, None]

    for lp in params["layers"]:
        residual = h
        x = layer_norm(h, lp["ln1"], lp["ln1_bias"], cfg.layer_norm_eps)
        h = residual + clip_attention(x, lp, cfg.num_attention_heads, mask=causal)
        residual = h
        x = layer_norm(h, lp["ln2"], lp["ln2_bias"], cfg.layer_norm_eps)
        x = quick_gelu(x @ lp["fc1"] + lp["fc1_bias"])
        h = residual + (x @ lp["fc2"] + lp["fc2_bias"])

    h = layer_norm(
        h, params["final_layer_norm"], params["final_layer_norm_bias"], cfg.layer_norm_eps
    )
    # HF pooling: legacy configs (eos_token_id == 2) pool at argmax(input_ids)
    # (the EOT token has the highest id); otherwise at the first eos_token_id.
    if cfg.eos_token_id == 2:
        pool_pos = jnp.argmax(input_ids, axis=-1)
    else:
        pool_pos = jnp.argmax(
            (input_ids == cfg.eos_token_id).astype(jnp.int32), axis=-1
        )
    pooled = h[jnp.arange(B), pool_pos]
    return pooled


def clip_embed_image(params: dict, vision_cfg: ClipVisionConfig, pixel_values: jax.Array):
    out = clip_vision_forward(params["vision"], vision_cfg, pixel_values)
    pooled = out["last"][:, 0]  # CLS after post_layernorm
    return pooled @ params["visual_projection"]


def clip_embed_text(params: dict, text_cfg: ClipTextConfig, input_ids: jax.Array):
    pooled = clip_text_forward(params["text"], text_cfg, input_ids)
    return pooled @ params["text_projection"]


def clip_score(
    params: dict,
    vision_cfg: ClipVisionConfig,
    text_cfg: ClipTextConfig,
    pixel_values: jax.Array,
    input_ids: jax.Array,
) -> jax.Array:
    """torchmetrics CLIPScore semantics: 100 * max(0, cos(img, txt)) per pair."""
    img = clip_embed_image(params, vision_cfg, pixel_values)
    txt = clip_embed_text(params, text_cfg, input_ids)
    img = img / jnp.linalg.norm(img, axis=-1, keepdims=True)
    txt = txt / jnp.linalg.norm(txt, axis=-1, keepdims=True)
    return jnp.maximum(100.0 * jnp.sum(img * txt, axis=-1), 0.0)


def clip_model_params_from_state_dict(
    sd: Dict, vision_cfg: ClipVisionConfig, text_cfg: ClipTextConfig, dtype=jnp.float32
) -> dict:
    """Map HF CLIPModel keys to our tree."""
    from .hf_loader import _np

    def t(key):
        return jnp.asarray(np.ascontiguousarray(_np(sd[key]).T), dtype=dtype)

    def v(key):
        return jnp.asarray(_np(sd[key]), dtype=dtype)

    vision = clip_params_from_state_dict(
        sd, vision_cfg, dtype=dtype, prefix="vision_model."
    )

    p = "text_model."
    layers = []
    for i in range(text_cfg.num_hidden_layers):
        lp = f"{p}encoder.layers.{i}."
        layers.append(
            {
                "ln1": v(lp + "layer_norm1.weight"),
                "ln1_bias": v(lp + "layer_norm1.bias"),
                "q_proj": t(lp + "self_attn.q_proj.weight"),
                "q_bias": v(lp + "self_attn.q_proj.bias"),
                "k_proj": t(lp + "self_attn.k_proj.weight"),
                "k_bias": v(lp + "self_attn.k_proj.bias"),
                "v_proj": t(lp + "self_attn.v_proj.weight"),
                "v_bias": v(lp + "self_attn.v_proj.bias"),
                "out_proj": t(lp + "self_attn.out_proj.weight"),
                "out_bias": v(lp + "self_attn.out_proj.bias"),
                "ln2": v(lp + "layer_norm2.weight"),
                "ln2_bias": v(lp + "layer_norm2.bias"),
                "fc1": t(lp + "mlp.fc1.weight"),
                "fc1_bias": v(lp + "mlp.fc1.bias"),
                "fc2": t(lp + "mlp.fc2.weight"),
                "fc2_bias": v(lp + "mlp.fc2.bias"),
            }
        )
    text = {
        "token_embedding": v(p + "embeddings.token_embedding.weight"),
        "position_embedding": v(p + "embeddings.position_embedding.weight"),
        "final_layer_norm": v(p + "final_layer_norm.weight"),
        "final_layer_norm_bias": v(p + "final_layer_norm.bias"),
        "layers": layers,
    }
    return {
        "vision": vision,
        "text": text,
        "visual_projection": t("visual_projection.weight"),
        "text_projection": t("text_projection.weight"),
    }


def preprocess_clip_image(image, image_size: int) -> np.ndarray:
    """CLIPImageProcessor: resize shortest edge, center crop, normalize."""
    from PIL import Image

    image = image.convert("RGB")
    w, h = image.size
    # HF get_resize_output_image_size: shortest edge -> size, the other
    # dimension int-truncated from the exact ratio.
    short, long = (w, h) if w <= h else (h, w)
    new_short, new_long = image_size, int(image_size * long / short)
    new_w, new_h = (new_short, new_long) if w <= h else (new_long, new_short)
    image = image.resize((new_w, new_h), Image.BICUBIC)
    w, h = image.size
    left = (w - image_size) // 2
    top = (h - image_size) // 2
    image = image.crop((left, top, left + image_size, top + image_size))
    arr = np.asarray(image, dtype=np.float32) / 255.0
    mean = np.asarray(OPENAI_CLIP_MEAN, dtype=np.float32)
    std = np.asarray(OPENAI_CLIP_STD, dtype=np.float32)
    return ((arr - mean) / std).transpose(2, 0, 1)


def jax_clip_metric(model_path: str, dtype=jnp.float32):
    """Build a `fn(pil_image, text) -> float` CLIP-Score metric from a local
    HF CLIPModel checkpoint — drop-in for the ClipScorer's torchmetrics
    backend (agents/scorers/clip/clip_scorer.py)."""
    from transformers import AutoTokenizer

    from .hf_loader import load_hf_config, load_hf_state_dict

    cfg = load_hf_config(model_path)
    vision_cfg = ClipVisionConfig.from_hf(cfg["vision_config"])
    text_cfg = ClipTextConfig.from_hf(cfg["text_config"])
    params = clip_model_params_from_state_dict(
        load_hf_state_dict(model_path), vision_cfg, text_cfg, dtype=dtype
    )
    tokenizer = AutoTokenizer.from_pretrained(model_path)

    # Params ride as a jit ARGUMENT, never a closure capture: closing over
    # them bakes the whole CLIP weight tree into the executable as constants
    # — a second on-device copy (~1.7 GB fp32 at CLIP-L) plus constant-fold
    # compile bloat, on chips already carrying an 8B subject (review r5;
    # same rule llama.py's _generate_fns documents).
    score_fn = jax.jit(
        lambda p, pv, ids: clip_score(p, vision_cfg, text_cfg, pv, ids)
    )

    def metric(image, text: str) -> float:
        pv = preprocess_clip_image(image, vision_cfg.image_size)[None]
        ids = tokenizer(
            [text],
            padding="max_length",
            max_length=text_cfg.max_position_embeddings,
            truncation=True,
            return_tensors="np",
        )["input_ids"]
        return float(score_fn(params, jnp.asarray(pv), jnp.asarray(ids))[0])

    return metric
