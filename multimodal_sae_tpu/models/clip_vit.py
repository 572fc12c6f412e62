"""CLIP ViT vision tower in JAX (the LLaVA-NeXT image encoder).

The reference gets this from HF `transformers` inside
`LlavaNextForConditionalGeneration` (reference features/cache.py:312-429).
Numerics match HF `CLIPVisionModel` (eager, fp32): patch conv as an unfold +
matmul on the MXU, quick_gelu MLPs, fp32 softmax attention, and the
`hidden_states` indexing convention (`hidden_states[-2]` = output of the
second-to-last encoder layer — LLaVA's `vision_feature_layer=-2`).
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Dict, List

import jax
import jax.numpy as jnp
import numpy as np

# OpenAI CLIP pixel normalization (HF CLIPImageProcessor defaults) — the
# single definition shared by the LLaVA anyres preprocessor and the
# CLIP-score image path; keep these in one place so a precision change
# cannot skew one consumer silently.
OPENAI_CLIP_MEAN = (0.48145466, 0.4578275, 0.40821073)
OPENAI_CLIP_STD = (0.26862954, 0.26130258, 0.27577711)


@dataclass(frozen=True)
class ClipVisionConfig:
    hidden_size: int = 1024
    intermediate_size: int = 4096
    num_hidden_layers: int = 24
    num_attention_heads: int = 16
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5
    projection_dim: int = 768
    hidden_act: str = "quick_gelu"
    """MLP activation from the checkpoint config: CLIP-L ships quick_gelu;
    some towers use exact 'gelu'. Anything else raises in `_activation`
    rather than silently running the wrong nonlinearity."""

    int8_matmul: bool = False
    """Run quantized tower weights through native int8xint8 MXU matmuls with
    dynamic per-token activation quant (same machinery as the subject,
    models/quant.py).  Opt-in: W8A8 changes numerics.  Ignored for
    unquantized weights."""

    @property
    def num_patches(self) -> int:
        return (self.image_size // self.patch_size) ** 2

    @classmethod
    def from_hf(cls, d: dict) -> "ClipVisionConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})


def layer_norm(x, weight, bias, eps):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mean) * jax.lax.rsqrt(var + eps) * weight + bias


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def _activation(name: str):
    """hidden_act -> callable (HF ACT2FN parity for the variants CLIP towers
    use: 'gelu' is the exact erf GELU there, not jax.nn.gelu's tanh
    default)."""
    if name == "quick_gelu":
        return quick_gelu
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name in ("gelu_new", "gelu_pytorch_tanh"):
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise NotImplementedError(
        f"hidden_act {name!r} is not implemented; activations would be "
        "silently wrong with a substitute"
    )


def _patchify(pixel_values: jax.Array, patch: int) -> jax.Array:
    """(B, 3, H, W) -> (B, (H/p)*(W/p), 3*p*p) with (channel, ph, pw) ordering
    matching conv2d weight layout (out, in, kh, kw)."""
    B, C, H, W = pixel_values.shape
    gh, gw = H // patch, W // patch
    x = pixel_values.reshape(B, C, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # (B, gh, gw, C, ph, pw)
    return x.reshape(B, gh * gw, C * patch * patch)


def clip_attention(x, lp, num_heads, mask=None, int8=False):
    from .quant import qmatmul

    B, S, D = x.shape
    hd = D // num_heads
    q = qmatmul(x, lp["q_proj"], int8=int8) + lp["q_bias"]
    k = qmatmul(x, lp["k_proj"], int8=int8) + lp["k_bias"]
    v = qmatmul(x, lp["v_proj"], int8=int8) + lp["v_bias"]
    q = q.reshape(B, S, num_heads, hd).transpose(0, 2, 1, 3) * (hd**-0.5)
    k = k.reshape(B, S, num_heads, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, num_heads, hd).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(B, S, D)
    return qmatmul(out, lp["out_proj"], int8=int8) + lp["out_bias"]


def clip_vision_forward(
    params: dict,
    cfg: ClipVisionConfig,
    pixel_values: jax.Array,
    *,
    feature_layer: int = -2,
) -> Dict[str, jax.Array]:
    """Returns {"features": hidden_states[feature_layer] (B, 1+P, D),
    "last": post-layernormed final hidden}.

    hidden_states[i] follows HF: index 0 is the pre-encoder embedding output,
    index i+1 is encoder layer i's output."""
    from .quant import leaf_dtype, qmatmul

    B = pixel_values.shape[0]
    i8 = cfg.int8_matmul
    dtype = leaf_dtype(params["patch_embedding"])

    patches = _patchify(pixel_values.astype(dtype), cfg.patch_size)
    patch_embeds = qmatmul(patches, params["patch_embedding"], int8=i8)  # (B, P, D)
    cls = jnp.broadcast_to(
        params["class_embedding"][None, None, :], (B, 1, cfg.hidden_size)
    )
    h = jnp.concatenate([cls, patch_embeds], axis=1)
    h = h + params["position_embedding"][None]
    h = layer_norm(
        h, params["pre_layrnorm"], params["pre_layrnorm_bias"], cfg.layer_norm_eps
    )

    act = _activation(cfg.hidden_act)
    hidden_states: List[jax.Array] = [h]
    for lp in params["layers"]:
        residual = h
        x = layer_norm(h, lp["ln1"], lp["ln1_bias"], cfg.layer_norm_eps)
        h = residual + clip_attention(x, lp, cfg.num_attention_heads, int8=i8)
        residual = h
        x = layer_norm(h, lp["ln2"], lp["ln2_bias"], cfg.layer_norm_eps)
        x = act(qmatmul(x, lp["fc1"], int8=i8) + lp["fc1_bias"])
        h = residual + (qmatmul(x, lp["fc2"], int8=i8) + lp["fc2_bias"])
        hidden_states.append(h)

    last = layer_norm(
        hidden_states[-1],
        params["post_layernorm"],
        params["post_layernorm_bias"],
        cfg.layer_norm_eps,
    )
    return {"features": hidden_states[feature_layer], "last": last}


def clip_params_from_state_dict(
    sd: Dict, cfg: ClipVisionConfig, dtype=jnp.float32, prefix: str = "vision_model."
) -> dict:
    """Map HF CLIPVisionModel keys to our tree (weights transposed to (in, out))."""
    from .hf_loader import _np

    def t(key):
        return jnp.asarray(np.ascontiguousarray(_np(sd[prefix + key]).T), dtype=dtype)

    def v(key):
        return jnp.asarray(_np(sd[prefix + key]), dtype=dtype)

    conv = _np(sd[prefix + "embeddings.patch_embedding.weight"])  # (D, 3, p, p)
    patch_w = jnp.asarray(
        np.ascontiguousarray(conv.reshape(conv.shape[0], -1).T), dtype=dtype
    )  # (3*p*p, D)

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"encoder.layers.{i}."
        layers.append(
            {
                "ln1": v(p + "layer_norm1.weight"),
                "ln1_bias": v(p + "layer_norm1.bias"),
                "q_proj": t(p + "self_attn.q_proj.weight"),
                "q_bias": v(p + "self_attn.q_proj.bias"),
                "k_proj": t(p + "self_attn.k_proj.weight"),
                "k_bias": v(p + "self_attn.k_proj.bias"),
                "v_proj": t(p + "self_attn.v_proj.weight"),
                "v_bias": v(p + "self_attn.v_proj.bias"),
                "out_proj": t(p + "self_attn.out_proj.weight"),
                "out_bias": v(p + "self_attn.out_proj.bias"),
                "ln2": v(p + "layer_norm2.weight"),
                "ln2_bias": v(p + "layer_norm2.bias"),
                "fc1": t(p + "mlp.fc1.weight"),
                "fc1_bias": v(p + "mlp.fc1.bias"),
                "fc2": t(p + "mlp.fc2.weight"),
                "fc2_bias": v(p + "mlp.fc2.bias"),
            }
        )
    return {
        "class_embedding": v("embeddings.class_embedding"),
        "patch_embedding": patch_w,
        "position_embedding": v("embeddings.position_embedding.weight"),
        "pre_layrnorm": v("pre_layrnorm.weight"),
        "pre_layrnorm_bias": v("pre_layrnorm.bias"),
        "post_layernorm": v("post_layernorm.weight"),
        "post_layernorm_bias": v("post_layernorm.bias"),
        "layers": layers,
    }
