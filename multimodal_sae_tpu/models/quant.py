"""Weight-only int8 quantization for frozen subject models.

The reference loads the subject model 8-bit via bitsandbytes
(reference train/sae/sae/__main__.py:66-97) and runs attribution backward on
an fp8-Quanto LLaVA (reference sae_auto_interp/utils.py:91-103) because a
full-precision 8B subject + backward does not fit one accelerator.  The
TPU-shaped equivalent is per-output-channel symmetric int8 *weights* with
dequant-on-use: the matmul runs `x @ q8.astype(x.dtype)` on the MXU (int8
magnitudes <= 127 are exactly representable in bf16) and the per-channel
scale is applied to the f32 accumulator output — one fused multiply, no
dequantized weight copy ever materializes in HBM.  Halves subject-model HBM
(16 GB -> ~8.5 GB for LLaMA-3-8B), which is what lets attribution backward
fit a single 16 GB v5e chip.

Activations stay bf16 throughout; gradients flow through the dequantized
matmul to the *inputs* (all the SAE/attribution paths need — subject weights
are frozen), so `jax.grad` works unchanged.

A quantized weight is a plain dict `{"q8": int8 (in, out), "scale": f32
(out,)}` — a regular pytree node, so `stack_layer_params`/`lax.scan`/`pjit`
shardings compose without special casing.
"""

from __future__ import annotations

from typing import Any, Union

import jax
import jax.numpy as jnp

QuantizedArray = dict  # {"q8": int8 (in, out), "scale": f32 (out,)}


def is_quantized(w: Any) -> bool:
    return isinstance(w, dict) and "q8" in w


def quantize_weight(w: jax.Array) -> QuantizedArray:
    """Per-output-channel symmetric int8: scale[j] = max_i |w[i, j]| / 127."""
    w32 = w.astype(jnp.float32)
    absmax = jnp.max(jnp.abs(w32), axis=0)  # (out,)
    scale = absmax / 127.0
    safe = jnp.where(scale == 0, 1.0, scale)
    q = jnp.clip(jnp.round(w32 / safe), -127, 127).astype(jnp.int8)
    return {"q8": q, "scale": scale}


def dequantize_weight(w: QuantizedArray, dtype=jnp.float32) -> jax.Array:
    return (w["q8"].astype(jnp.float32) * w["scale"]).astype(dtype)


def qmatmul(
    x: jax.Array,
    w: Union[jax.Array, QuantizedArray],
    preferred_element_type=None,
    int8: bool = False,
) -> jax.Array:
    """`x @ w` for dense or int8-quantized `w` (dequant fused into the
    matmul's epilogue: accumulate in f32, scale per output channel, cast).

    `int8=True` additionally quantizes the *activations* per token (dynamic
    symmetric absmax) and runs a native int8xint8->int32 MXU matmul — 2x the
    bf16 MXU rate on v5e-class chips, halving the frozen-subject forward
    where it is matmul-bound. W8A8 changes numerics (the reference's
    bitsandbytes path is also W8A8, reference train/sae/sae/__main__.py:66-97),
    so it is opt-in; gradients use a straight-through dequantized-weight
    matmul (exact for the W8A0 part, ignores activation rounding) so
    attribution/steering backward still flows to the inputs."""
    if not is_quantized(w):
        return jnp.dot(x, w, preferred_element_type=preferred_element_type)
    if int8:
        out = _int8_matmul(x, w["q8"], w["scale"])
        return out.astype(preferred_element_type or x.dtype)
    acc = jnp.dot(x, w["q8"].astype(x.dtype), preferred_element_type=jnp.float32)
    out = acc * w["scale"]
    return out.astype(preferred_element_type or x.dtype)


@jax.custom_vjp
def _int8_matmul(x: jax.Array, q8: jax.Array, scale: jax.Array) -> jax.Array:
    """f32 = ((round(x/sx) int8) @ q8 int8 -> int32) * sx * scale, with sx the
    per-row activation absmax / 127. Exact when x rows are already
    int8-scaled; otherwise introduces the standard W8A8 rounding error."""
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.float32)
    sx = jnp.max(jnp.abs(x2), axis=-1, keepdims=True) / 127.0
    safe = jnp.where(sx == 0, 1.0, sx)
    xq = jnp.clip(jnp.round(x2 / safe), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(
        xq, q8, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    out = acc.astype(jnp.float32) * sx * scale
    return out.reshape(*lead, q8.shape[-1])


def _int8_matmul_fwd(x, q8, scale):
    return _int8_matmul(x, q8, scale), (jnp.zeros((0,), x.dtype), q8, scale)


def _int8_matmul_bwd(res, g):
    xproto, q8, scale = res
    lead = g.shape[:-1]
    g2 = g.reshape(-1, g.shape[-1]).astype(jnp.float32) * scale
    # dx = g @ (q8 * scale).T computed as (g * scale) @ q8.T; bf16 operands
    # keep the backward on the fast MXU path (int8 columns are exact in bf16).
    gx = jnp.dot(
        g2.astype(jnp.bfloat16),
        q8.T.astype(jnp.bfloat16),
        preferred_element_type=jnp.float32,
    )
    gx = gx.reshape(*lead, q8.shape[0]).astype(xproto.dtype)
    return gx, None, None


_int8_matmul.defvjp(_int8_matmul_fwd, _int8_matmul_bwd)


def qembed(w: Union[jax.Array, QuantizedArray], ids: jax.Array, dtype) -> jax.Array:
    """Embedding lookup for dense or quantized tables (gather int8 rows, then
    scale — the gather moves 2x less HBM than a bf16 table)."""
    if not is_quantized(w):
        return w[ids].astype(dtype)
    return (w["q8"][ids].astype(jnp.float32) * w["scale"]).astype(dtype)


def leaf_dtype(w: Union[jax.Array, QuantizedArray]):
    """Activation dtype implied by a (possibly quantized) weight."""
    if is_quantized(w):
        return jnp.bfloat16
    return w.dtype


_QUANT_KEYS = frozenset(
    {
        "q_proj",
        "k_proj",
        "v_proj",
        "o_proj",
        "gate_proj",
        "up_proj",
        "down_proj",
        "lm_head",
        "embed_tokens",
    }
)


def quantize_llama_params(
    params: dict,
    quantize_embeddings: bool = True,
    activation_dtype=jnp.bfloat16,
) -> dict:
    """Quantize the large 2D weights of a LLaMA param tree (per-layer dicts or
    stacked). Norms/biases are cast to `activation_dtype` (the dtype the
    quantized matmuls produce) so the whole forward runs in one dtype — a
    mixed f32/bf16 tree would break scan carries and waste HBM."""
    skip = set() if quantize_embeddings else {"embed_tokens", "lm_head"}

    def quant_entry(name: str, w):
        if is_quantized(w):
            return w
        if name not in _QUANT_KEYS or name in skip:
            return w.astype(activation_dtype) if jnp.issubdtype(
                jnp.asarray(w).dtype, jnp.floating
            ) else w
        if w.ndim == 2:
            return quantize_weight(w)
        if w.ndim == 3:  # stacked layers: quantize each layer's slice
            return jax.vmap(quantize_weight)(w)
        return w

    out = {}
    for name, v in params.items():
        if name == "layers":
            if isinstance(v, dict):
                out[name] = {k: quant_entry(k, a) for k, a in v.items()}
            else:
                out[name] = [
                    {k: quant_entry(k, a) for k, a in layer.items()} for layer in v
                ]
        else:
            out[name] = quant_entry(name, v)
    return out


_CLIP_QUANT_KEYS = frozenset(
    {"patch_embedding", "q_proj", "k_proj", "v_proj", "out_proj", "fc1", "fc2"}
)


def quantize_clip_params(params: dict, activation_dtype=jnp.bfloat16) -> dict:
    """Quantize the large 2D matmul weights of a CLIP vision-tower tree
    (models/clip_vit.py layout); norms/biases/embeddings cast to
    `activation_dtype` like `quantize_llama_params`."""

    def quant_entry(name: str, w):
        if is_quantized(w):
            return w
        if name in _CLIP_QUANT_KEYS and jnp.asarray(w).ndim == 2:
            return quantize_weight(w)
        return w.astype(activation_dtype) if jnp.issubdtype(
            jnp.asarray(w).dtype, jnp.floating
        ) else w

    out = {}
    for name, v in params.items():
        if name == "layers":
            out[name] = [
                {k: quant_entry(k, a) for k, a in layer.items()} for layer in v
            ]
        else:
            out[name] = quant_entry(name, v)
    return out
