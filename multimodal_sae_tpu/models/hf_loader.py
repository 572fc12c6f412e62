"""HF-checkpoint → JAX parameter conversion.

The reference gets its subject models for free from `transformers`
(reference train/sae/sae/__main__.py:66-97, sae_auto_interp/utils.py).  Here
HF weights (local `config.json` + `*.safetensors`, or an in-memory torch
state_dict for tests) are mapped into our transposed (in, out) param trees for
LLaMA (models/llama.py), CLIP-ViT (models/clip_vit.py) and LLaVA-NeXT
(models/llava_next.py).
"""

from __future__ import annotations

import json
import os
from pathlib import Path
from typing import Dict

import jax.numpy as jnp
import numpy as np

from .llama import LlamaConfig


def _np(t) -> np.ndarray:
    """torch tensor / numpy array -> numpy (bf16 via ml_dtypes)."""
    if isinstance(t, np.ndarray):
        return t
    import ml_dtypes
    import torch

    if t.dtype == torch.bfloat16:
        return t.detach().view(torch.uint16).cpu().numpy().view(ml_dtypes.bfloat16)
    return t.detach().cpu().numpy()


def load_hf_state_dict(path: str) -> Dict[str, np.ndarray]:
    """Read all *.safetensors files of a local HF checkpoint dir."""
    from safetensors import safe_open

    tensors = {}
    files = sorted(Path(path).glob("*.safetensors"))
    if not files:
        raise FileNotFoundError(f"no safetensors files under {path}")
    for f in files:
        with safe_open(str(f), framework="np") as sf:
            for k in sf.keys():
                tensors[k] = sf.get_tensor(k)
    return tensors


def load_hf_config(path: str) -> dict:
    with open(os.path.join(path, "config.json")) as f:
        return json.load(f)


def _t(sd, key, dtype):
    """Fetch + transpose a (out, in) torch Linear weight to (in, out)."""
    return jnp.asarray(np.ascontiguousarray(_np(sd[key]).T), dtype=dtype)


def _v(sd, key, dtype):
    return jnp.asarray(_np(sd[key]), dtype=dtype)


def llama_params_from_state_dict(
    sd: Dict, cfg: LlamaConfig, dtype=jnp.float32, prefix: str = "model."
) -> dict:
    """Map HF LlamaForCausalLM/LlamaModel keys to our tree.

    `prefix` is "model." for LlamaForCausalLM, "" for a bare LlamaModel,
    "language_model.model." inside LLaVA-NeXT checkpoints."""
    sd = {k: v for k, v in sd.items()}
    layers = []
    for i in range(cfg.num_hidden_layers):
        p = f"{prefix}layers.{i}."
        layers.append(
            {
                "input_layernorm": _v(sd, p + "input_layernorm.weight", dtype),
                "q_proj": _t(sd, p + "self_attn.q_proj.weight", dtype),
                "k_proj": _t(sd, p + "self_attn.k_proj.weight", dtype),
                "v_proj": _t(sd, p + "self_attn.v_proj.weight", dtype),
                "o_proj": _t(sd, p + "self_attn.o_proj.weight", dtype),
                "post_attention_layernorm": _v(
                    sd, p + "post_attention_layernorm.weight", dtype
                ),
                "gate_proj": _t(sd, p + "mlp.gate_proj.weight", dtype),
                "up_proj": _t(sd, p + "mlp.up_proj.weight", dtype),
                "down_proj": _t(sd, p + "mlp.down_proj.weight", dtype),
            }
        )
    params = {
        "embed_tokens": _v(sd, f"{prefix}embed_tokens.weight", dtype),
        "layers": layers,
        "norm": _v(sd, f"{prefix}norm.weight", dtype),
    }
    # The head lives beside (not under) the decoder: drop the prefix's LAST
    # dotted segment, whatever it is. A fixed `[:-len("model.")]` strip is
    # wrong for the post-4.52 nested layout "model.language_model." (it
    # chopped 6 chars out of "language_model.", yielding the garbage sibling
    # "model.language_"), and a plain .replace() would strip every
    # occurrence (review r5).
    parts = prefix.rstrip(".").split(".") if prefix else []
    sibling = ".".join(parts[:-1]) + "." if len(parts) > 1 else ""
    head_key = None
    for cand in (
        "lm_head.weight",
        sibling + "lm_head.weight",
        prefix + "lm_head.weight",
    ):
        if cand in sd:
            head_key = cand
            break
    if not cfg.tie_word_embeddings:
        if head_key is None:
            # Hard error, not a warning: silently reusing embed_tokens for
            # an UNTIED head makes every logit-reading flow (steering,
            # attribution metrics, generation) numerically wrong with no
            # further signal (review r5) — the same reasoning behind the
            # NotImplementedError for unsupported rope_scaling above.
            raise KeyError(
                f"untied checkpoint (tie_word_embeddings=false) but no "
                f"lm_head.weight found beside prefix {prefix!r} "
                f"(tried bare/sibling/nested candidates); refusing to "
                "fall back to embed_tokens — logits would be wrong"
            )
        params["lm_head"] = _t(sd, head_key, dtype)
    return params


def load_llama(path: str, dtype=jnp.float32):
    """Local HF LLaMA checkpoint dir -> (params, cfg)."""
    cfg = LlamaConfig.from_hf(load_hf_config(path))
    sd = load_hf_state_dict(path)
    prefix = "model." if any(k.startswith("model.") for k in sd) else ""
    return llama_params_from_state_dict(sd, cfg, dtype=dtype, prefix=prefix), cfg


def torch_module_state_dict(module) -> Dict:
    """Convenience for tests: state_dict of an in-memory torch module."""
    return {k: v for k, v in module.state_dict().items()}
