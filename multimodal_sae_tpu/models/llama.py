"""LLaMA-3 decoder in pure JAX with a functional capture/intervention API.

The reference consumes LLaMA through HF `transformers` + forward hooks
(reference train/sae/sae/trainer.py:267-311, features/cache.py:178-204).  This
is a ground-up JAX implementation whose layer loop natively supports

* `capture`: hookpoint names ("layers.{i}") whose post-layer residual hidden
  states are returned (== the reference's forward-hook captures on
  `model.layers.{i}`), and
* `interventions`: {hookpoint: fn(hidden) -> hidden} applied to the layer
  output in place (== the reference's output-replacing hooks for steering /
  SAE splicing, reference features/steering.py:105-124,
  features/patching/utils.py:33-58) — jit- and grad-compatible.

Numerics match HF `LlamaModel` (fp32): RMSNorm in float32, RoPE cos/sin in
float32, softmax in float32, GQA key/value head repetition.  Weights are
stored transposed ((in, out)) for the x @ W convention; see hf_loader.py for
the HF-checkpoint mapping.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass
from typing import Any, Callable, Dict, List, NamedTuple, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .quant import is_quantized, leaf_dtype, qembed, qmatmul


@dataclass(frozen=True)
class LlamaConfig:
    vocab_size: int = 128256
    hidden_size: int = 4096
    intermediate_size: int = 14336
    num_hidden_layers: int = 32
    num_attention_heads: int = 32
    num_key_value_heads: int = 8
    head_dim: Optional[int] = None
    rms_norm_eps: float = 1e-5
    rope_theta: float = 500000.0
    max_position_embeddings: int = 8192
    tie_word_embeddings: bool = False
    rope_scaling: Optional[Tuple[Tuple[str, float], ...]] = None
    """HF rope_scaling config as a sorted (key, value) tuple (hashable; use
    `rope_scaling_dict`). Only the Llama-3.1 'llama3' variant is implemented;
    anything else raises in `from_hf` rather than silently using default RoPE."""

    int8_matmul: bool = False
    """Run quantized weights through native int8xint8 MXU matmuls with
    dynamic per-token activation quantization (models/quant.py qmatmul
    int8=True) — 2x the bf16 MXU rate. Opt-in: W8A8 changes numerics vs the
    weight-only dequant path. Ignored for unquantized weights."""

    remat: bool = False
    """Rematerialize each decoder layer in the backward pass
    (`jax.checkpoint`): keeps only the (B, S, D) layer inputs instead of the
    full attention tape — eager attention's saved (B, H, S, S) probs OOM a
    16 GB chip at ~2.4k-token attribution shapes (measured: 21.3 GB for 8
    above-splice layers) — at ~1.3-1.5x backward compute."""

    flash_attention: bool = False
    """Use the fused Pallas flash-attention kernel for no-KV-cache forwards
    (caching/training/attribution prefill). Eager attention materializes the
    (B, H, S, S) f32 score tensor per layer — ~3 GB/layer at S=2432 — which
    dominates long-sequence anyres forwards; the fused kernel never leaves
    VMEM. Opt-in: softmax reduction order differs from HF eager (bf16-level
    numerics), so the fp32 bit-parity cache path keeps eager. On non-TPU
    backends the pure-jnp `mha_reference` (same math as the kernel) runs
    instead, so tests exercise the exact wiring."""

    @property
    def head_dim_(self) -> int:
        return self.head_dim or self.hidden_size // self.num_attention_heads

    @property
    def rope_scaling_dict(self) -> Optional[dict]:
        return dict(self.rope_scaling) if self.rope_scaling else None

    @classmethod
    def from_hf(cls, d: dict) -> "LlamaConfig":
        names = {f.name for f in dataclasses.fields(cls)}
        kw = {k: v for k, v in d.items() if k in names}
        rs = d.get("rope_scaling")
        if rs is not None:
            # HF spells the variant 'rope_type' (new) or 'type' (legacy).
            rtype = rs.get("rope_type", rs.get("type"))
            if rtype != "llama3":
                raise NotImplementedError(
                    f"rope_scaling type {rtype!r} is not implemented; "
                    "activations would be silently wrong with default RoPE"
                )
            kw["rope_scaling"] = tuple(
                sorted((k, v) for k, v in rs.items() if isinstance(v, (int, float)))
            )
        if d.get("attention_bias") or d.get("mlp_bias"):
            # decoder_layer applies no projection biases and the loader
            # drops *.bias tensors — same loud-failure policy as the
            # rope_scaling check above.
            raise NotImplementedError(
                "attention_bias/mlp_bias checkpoints are not implemented; "
                "activations would be silently wrong without the biases"
            )
        return cls(**kw)


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    """HF LlamaRMSNorm: variance in fp32, scale applied in input dtype."""
    dtype = x.dtype
    x32 = x.astype(jnp.float32)
    var = jnp.mean(x32 * x32, axis=-1, keepdims=True)
    x32 = x32 * jax.lax.rsqrt(var + eps)
    return (x32.astype(dtype)) * weight


def rope_cos_sin(
    positions: jax.Array,
    head_dim: int,
    theta: float,
    rope_scaling: Optional[dict] = None,
):
    """HF LlamaRotaryEmbedding: fp32 cos/sin of shape (..., seq, head_dim)
    with the half-split frequency layout. `rope_scaling` (llama3 variant,
    Llama-3.1+) rescales low-frequency components per HF's
    `_compute_llama3_parameters`."""
    inv_freq = 1.0 / (
        theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim)
    )
    if rope_scaling:
        factor = rope_scaling["factor"]
        low = rope_scaling["low_freq_factor"]
        high = rope_scaling["high_freq_factor"]
        orig = rope_scaling["original_max_position_embeddings"]
        low_wavelen = orig / low
        high_wavelen = orig / high
        wavelen = 2 * jnp.pi / inv_freq
        scaled = inv_freq / factor
        smooth = (orig / wavelen - low) / (high - low)
        smoothed = (1 - smooth) / factor * inv_freq + smooth * inv_freq
        inv_freq = jnp.where(
            wavelen < high_wavelen,
            inv_freq,
            jnp.where(wavelen > low_wavelen, scaled, smoothed),
        )
    freqs = positions[..., None].astype(jnp.float32) * inv_freq  # (..., S, hd/2)
    emb = jnp.concatenate([freqs, freqs], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(q, k, cos, sin):
    """q, k: (B, H, S, hd); cos/sin: (B, S, hd) or (S, hd)."""
    cos = cos[..., None, :, :]  # broadcast over heads
    sin = sin[..., None, :, :]
    q = (q * cos + _rotate_half(q) * sin).astype(q.dtype)
    k = (k * cos + _rotate_half(k) * sin).astype(k.dtype)
    return q, k


def _repeat_kv(x: jax.Array, n_rep: int) -> jax.Array:
    """(B, kvH, S, hd) -> (B, H, S, hd) by repeating each kv head."""
    if n_rep == 1:
        return x
    b, kvh, s, d = x.shape
    x = jnp.broadcast_to(x[:, :, None], (b, kvh, n_rep, s, d))
    return x.reshape(b, kvh * n_rep, s, d)


class KVCache(NamedTuple):
    """Static-shape KV cache for the jitted generation loop (the reference
    gets this from HF `generate`; SURVEY.md §7 hard part #6).  Stored stacked
    over layers so the scan-based decode path carries one array pair."""

    k: jax.Array  # (layers, B, kvH, max_len, hd)
    v: jax.Array
    length: jax.Array  # () int32 — tokens currently in the cache

    @staticmethod
    def init(cfg: LlamaConfig, batch: int, max_len: int, dtype=jnp.float32,
             kv_sharding=None, length_sharding=None):
        """`kv_sharding`/`length_sharding` allocate the buffers directly in
        the target layout — the cache is the generation loop's dominant live
        buffer, so materializing it unsharded and resharding after would
        transiently hold the FULL (layers, B, kvH, max_len, hd) pair on one
        device and OOM exactly the batches --dp exists to fit."""
        shape = (
            cfg.num_hidden_layers,
            batch,
            cfg.num_key_value_heads,
            max_len,
            cfg.head_dim_,
        )
        kw = {} if kv_sharding is None else {"device": kv_sharding}
        lkw = {} if length_sharding is None else {"device": length_sharding}
        return KVCache(
            k=jnp.zeros(shape, dtype, **kw),
            v=jnp.zeros(shape, dtype, **kw),
            length=jnp.zeros((), jnp.int32, **lkw),
        )


def pad_text_rows(rows) -> dict:
    """RIGHT-pad ragged token-id rows into a rectangular batch dict with an
    attention mask (none when already rectangular — an absent mask keeps the
    flash path's segment-id-free 512-wide blocks).  Shared by the text-only
    `prepare_inputs` of LlamaModel and LlavaNextModel; `_repack_left_padded`
    converts for last-position-logit readers."""
    rows = [np.asarray(r, dtype=np.int64).reshape(-1) for r in rows]
    width = max((len(r) for r in rows), default=0)
    if all(len(r) == width for r in rows):
        return {"input_ids": np.stack(rows) if rows else np.zeros((0, 0), np.int64)}
    ids = np.zeros((len(rows), width), dtype=np.int64)
    mask = np.zeros((len(rows), width), dtype=np.int64)
    for i, r in enumerate(rows):
        ids[i, : len(r)] = r
        mask[i, : len(r)] = 1
    return {"input_ids": ids, "attention_mask": mask}


def stack_layer_params(params: dict) -> dict:
    """Stack the per-layer param dicts into leading-axis arrays for
    `lax.scan` over layers (O(1) program size in depth — the unrolled loop's
    serialized program grows linearly with layers and can exceed compiler
    payload limits). Layout is detected by type: list = per-layer dicts,
    dict = stacked arrays."""
    layers = params["layers"]
    if isinstance(layers, dict):
        return params
    # Stack one parameter name at a time, dropping the per-layer references
    # as we go: a whole-tree tree_map(stack) holds list + stacked copies live
    # simultaneously (2x peak HBM — enough to OOM a 16 GB chip on an 8B
    # subject). Callers that keep their own reference to the per-layer list
    # still pay the 2x; pass an owned list for the frugal path.
    layers = [dict(l) for l in layers]
    stacked: dict = {}
    for name in list(layers[0].keys()):
        vals = [l.pop(name) for l in layers]
        if isinstance(vals[0], dict):  # int8-quantized {"q8", "scale"}
            stacked[name] = {k: jnp.stack([v[k] for v in vals]) for k in vals[0]}
        else:
            stacked[name] = jnp.stack(vals)
        del vals
    return {**params, "layers": stacked}


def _layer_slice(layers, i: int):
    """Per-layer param dict from either layout."""
    if isinstance(layers, dict):
        return jax.tree_util.tree_map(lambda a: a[i], layers)
    return layers[i]


def attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    mask: Optional[jax.Array],
    scale: float,
) -> jax.Array:
    """(B, H, S, hd) attention with fp32 softmax (HF eager parity)."""
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32
    ) * scale
    if mask is not None:
        scores = scores + mask
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v, preferred_element_type=q.dtype)


def flash_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    pad_mask: Optional[jax.Array],
    scale: float,
) -> jax.Array:
    """Causal flash attention, (B, H, S, hd) — fused Pallas kernel on TPU,
    `mha_reference` (identical math, pure jnp) elsewhere.  `pad_mask` (B, S)
    marks real tokens; pad *keys* are excluded everywhere via kv segment ids
    (pad queries still attend to real keys, matching the eager additive-mask
    path, so their outputs stay finite and get sliced off downstream).

    The TPU kernel requires the sequence length to divide its blocks; any S
    is padded up to the next block multiple here (pad query rows sliced
    off) so callers never see the constraint.  END-padding needs no key
    masking at all under causal attention: a real query at position
    i < orig_S can never attend a pad key at j >= orig_S, so segment ids
    are built only when the CALLER passes a pad_mask (whose zeros may sit
    anywhere, e.g. left padding).  The padding runs on every backend so
    CPU tests exercise the exact wiring.

    Block sizes: the kernel's 128-wide defaults run at ~10 TF/s at the
    anyres image shape (4, 32, 2432, 128) on v5e — the per-block softmax
    bookkeeping dominates 128^2 MXU tiles.  512-wide blocks measure
    5.8 ms/layer vs 19.7 (3.4x; the full sweep is in BASELINE.md), so for
    S >= 1024 without segment ids we pad to a 512 bucket instead of 128
    (the extra pad rows cost only attention FLOPs — callers' projections
    stay at the caller's S) and pass 512-wide BlockSizes.  With segment
    ids the 512-block compile HANGS the remote Mosaic compiler (measured
    >420 s on a tiny shape, r3), so masked batches stay on the 128
    defaults."""
    from jax.experimental.pallas.ops.tpu import flash_attention as _fa

    orig_S = q.shape[2]
    block = 512 if orig_S >= 1024 and pad_mask is None else 128
    pad = (-orig_S) % block
    if pad:
        zpad = ((0, 0), (0, 0), (0, pad), (0, 0))
        q, k, v = jnp.pad(q, zpad), jnp.pad(k, zpad), jnp.pad(v, zpad)
        if pad_mask is not None:
            pad_mask = jnp.pad(pad_mask.astype(jnp.int32), ((0, 0), (0, pad)))
        # pad_mask None: causality alone excludes the end-pad keys.
    if pad_mask is not None:
        q_seg = jnp.ones(q.shape[0:1] + q.shape[2:3], jnp.int32)
        kv_seg = pad_mask.astype(jnp.int32)
        segment_ids = _fa.SegmentIds(q=q_seg, kv=kv_seg)
    else:
        segment_ids = None
    # Fold the softmax scale into q (identical math): the reference impl's
    # backward rejects sm_scale != 1, and pre-scaling keeps both paths
    # differentiable — attribution backprops THROUGH the splice's attention.
    q = q * jnp.asarray(scale, q.dtype)
    if jax.default_backend() == "tpu":
        block_sizes = None
        if block == 512:  # only ever chosen with segment_ids None
            b = 512
            block_sizes = _fa.BlockSizes(
                block_q=b, block_k_major=b, block_k=b, block_b=1,
                block_q_major_dkv=b, block_k_major_dkv=b,
                block_k_dkv=b, block_q_dkv=b,
                block_k_major_dq=b, block_k_dq=b, block_q_dq=b,
            )
        out = _fa.flash_attention(
            q, k, v, segment_ids=segment_ids, causal=True, sm_scale=1.0,
            block_sizes=block_sizes,
        )
    else:
        out = _fa.mha_reference(
            q, k, v, None, segment_ids=segment_ids, causal=True, sm_scale=1.0
        )
    return out[:, :, :orig_S] if pad else out


def decoder_layer(
    layer_params: Dict[str, jax.Array],
    cfg: LlamaConfig,
    h: jax.Array,
    cos: jax.Array,
    sin: jax.Array,
    mask: Optional[jax.Array],
    kv: Optional[Tuple[jax.Array, jax.Array]] = None,
    cache_offset: Optional[jax.Array] = None,
    pad_mask: Optional[jax.Array] = None,
):
    """One decoder layer; returns (h_out, (k_full, v_full)) where k/v_full are
    the cache tensors to store when kv-caching."""
    B, S, D = h.shape
    H, kvH, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_

    i8 = cfg.int8_matmul

    residual = h
    x = rms_norm(h, layer_params["input_layernorm"], cfg.rms_norm_eps)
    q = qmatmul(x, layer_params["q_proj"], int8=i8).reshape(B, S, H, hd).transpose(0, 2, 1, 3)
    k = qmatmul(x, layer_params["k_proj"], int8=i8).reshape(B, S, kvH, hd).transpose(0, 2, 1, 3)
    v = qmatmul(x, layer_params["v_proj"], int8=i8).reshape(B, S, kvH, hd).transpose(0, 2, 1, 3)
    q, k = apply_rope(q, k, cos, sin)

    if kv is not None:
        k_cache, v_cache = kv
        k_full = jax.lax.dynamic_update_slice(
            k_cache, k.astype(k_cache.dtype), (0, 0, cache_offset, 0)
        )
        v_full = jax.lax.dynamic_update_slice(
            v_cache, v.astype(v_cache.dtype), (0, 0, cache_offset, 0)
        )
        k_att, v_att = k_full, v_full
    else:
        k_full = v_full = None
        k_att, v_att = k, v

    k_att = _repeat_kv(k_att, H // kvH)
    v_att = _repeat_kv(v_att, H // kvH)
    if cfg.flash_attention and kv is None and S > 1:
        attn = flash_attention(q, k_att, v_att, pad_mask, scale=hd**-0.5)
    else:
        attn = attention(q, k_att, v_att, mask, scale=hd**-0.5)
    attn = attn.transpose(0, 2, 1, 3).reshape(B, S, H * hd)
    h = residual + qmatmul(attn, layer_params["o_proj"], int8=i8)

    residual = h
    x = rms_norm(h, layer_params["post_attention_layernorm"], cfg.rms_norm_eps)
    gate = jax.nn.silu(qmatmul(x, layer_params["gate_proj"], int8=i8))
    up = qmatmul(x, layer_params["up_proj"], int8=i8)
    h = residual + qmatmul(gate * up, layer_params["down_proj"], int8=i8)
    return h, (k_full, v_full)


def causal_mask(
    S_q: int, S_k: int, attention_mask: Optional[jax.Array] = None, offset: int = 0
):
    """Additive mask (B, 1, S_q, S_k), always float32 (it is added to the
    f32 attention scores): causal plus optional padding mask.  `offset` =
    number of cached tokens before the query block."""
    q_pos = jnp.arange(S_q)[:, None] + offset
    k_pos = jnp.arange(S_k)[None, :]
    causal = k_pos <= q_pos  # (S_q, S_k)
    neg = jnp.finfo(jnp.float32).min
    mask = jnp.where(causal, 0.0, neg)[None, None]
    if attention_mask is not None:
        pad = jnp.where(attention_mask[:, None, None, :].astype(bool), 0.0, neg)
        mask = mask + pad
    return mask


InterventionFn = Callable[[jax.Array], jax.Array]


class Intervention(NamedTuple):
    """A jit-cache-stable intervention: `fn(args, h, *static) -> h`.

    `fn` must be a module-level (identity-stable) callable, `args` a pytree of
    arrays that flows through jit boundaries as *arguments*, and `static` a
    hashable tuple folded into `greedy_generate`'s executable-cache key.

    Interventions may also be plain callables `h -> h` everywhere (the
    original API); those still work, but a closure (a) bakes any captured
    arrays into the compiled program as constants and (b) defeats
    `greedy_generate`'s executable cache unless the very same object is
    reused — the steering fleet's per-chunk closures recompiled the full
    prefill+decode program every sweep before this existed."""

    fn: Callable
    args: Any = ()
    static: tuple = ()

    def __call__(self, h: jax.Array) -> jax.Array:
        return self.fn(self.args, h, *self.static)


def _iv_callable(v) -> InterventionFn:
    if isinstance(v, Intervention):
        return lambda h, _v=v: _v.fn(_v.args, h, *_v.static)
    return v


def llama_forward(
    params: dict,
    cfg: LlamaConfig,
    input_ids: Optional[jax.Array] = None,
    *,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    position_ids: Optional[jax.Array] = None,
    capture: Sequence[str] = (),
    interventions: Optional[Dict[str, InterventionFn]] = None,
    cache: Optional[KVCache] = None,
    return_logits: bool = True,
    return_hidden: bool = False,
    start_layer: int = 0,
):
    """Full forward.

    Returns a dict with optional keys: "logits", "hidden" (final, post-norm
    input), "captured" {hookpoint: (B, S, D)}, "cache" (updated KVCache).

    `start_layer > 0` resumes mid-stack: `inputs_embeds` is then the hidden
    state ENTERING layer `start_layer` (i.e. the output of layer
    `start_layer-1`), and only layers [start_layer, num_hidden_layers) run.
    This is the suffix half of attribution patching's prefix/suffix split
    (features/patching/attribution.py): everything below the SAE splice
    point is feature-independent, so the per-feature fwd+bwd only needs the
    layers above it.

    Capture-only forwards need no explicit early-exit: with
    `return_logits=False` and no `return_hidden`, the layers ABOVE the last
    hookpoint feed nothing in the returned dict and XLA dead-code-eliminates
    them (verified: capture at layer 2 of 16 compiles to exactly 3 layers'
    dots and runs ~5x faster than capture at 14) — so `Llama.capture` at
    layers.24 of a 32-layer subject already pays for only 25 layers."""
    assert start_layer == 0 or (
        cache is None and inputs_embeds is not None
    ), "start_layer requires inputs_embeds and no KV cache"
    if interventions:
        interventions = {k: _iv_callable(v) for k, v in interventions.items()}
    if inputs_embeds is None:
        inputs_embeds = qembed(
            params["embed_tokens"], input_ids, leaf_dtype(params["embed_tokens"])
        )
    h = inputs_embeds
    B, S, _ = h.shape

    offset = cache.length if cache is not None else 0
    if position_ids is None:
        position_ids = jnp.arange(S)[None, :] + offset
    cos, sin = rope_cos_sin(
        position_ids, cfg.head_dim_, cfg.rope_theta, cfg.rope_scaling_dict
    )

    if cache is not None:
        S_k = cache.k.shape[3]
        kv_valid = jnp.arange(S_k)[None, :] < (offset + S)
        amask = kv_valid.astype(jnp.int32)
        if attention_mask is not None:
            if attention_mask.shape[1] == S_k:
                # Full-cache-length mask (greedy_generate threads this).
                pad = attention_mask.astype(jnp.int32)
            elif attention_mask.shape[1] == S:
                # Mask covers only the current block: place it at the block's
                # cache offset, leave every other position allowed (kv_valid
                # already bounds the live region).
                pad = jnp.ones((B, S_k), dtype=jnp.int32)
                pad = jax.lax.dynamic_update_slice(
                    pad, attention_mask.astype(jnp.int32), (0, offset)
                )
            else:
                raise ValueError(
                    f"attention_mask length {attention_mask.shape[1]} matches "
                    f"neither the input block ({S}) nor the cache ({S_k})"
                )
            amask = amask * pad
        mask = causal_mask(S, S_k, amask, offset=offset)
        pad_mask = None
    elif cfg.flash_attention and S > 1:
        # Flash path: causality and pad-key exclusion happen inside the
        # kernel via segment ids — the (B, 1, S, S) additive mask is never
        # built (95 MB at S=2432 before the per-layer score tensors it feeds).
        mask = None
        pad_mask = (
            jnp.asarray(attention_mask) if attention_mask is not None else None
        )
    else:
        mask = causal_mask(S, S, attention_mask)
        pad_mask = None

    layers = params["layers"]
    stacked = isinstance(layers, dict)
    captured: Dict[str, jax.Array] = {}
    layer_fn = (
        jax.checkpoint(decoder_layer, static_argnums=(1,))
        if cfg.remat
        else decoder_layer
    )

    if stacked and not capture:
        # Scan path: one traced layer body regardless of depth. Interventions
        # become lax.cond on the layer index (only the taken branch executes).
        iv_by_idx = (
            {_hookpoint_layer_idx(k): fn for k, fn in interventions.items()}
            if interventions
            else {}
        )
        cache_offset = offset if cache is not None else None

        def body(h, xs):
            lp, kc, vc, idx = xs
            kv = (kc, vc) if cache is not None else None
            h, (k_full, v_full) = layer_fn(
                lp,
                cfg,
                h,
                cos,
                sin,
                mask,
                kv=kv,
                cache_offset=cache_offset,
                pad_mask=pad_mask,
            )
            for i_target, fn in iv_by_idx.items():
                h = jax.lax.cond(idx == i_target, fn, lambda x: x, h)
            ys = (k_full, v_full) if cache is not None else None
            return h, ys

        idxs = jnp.arange(start_layer, cfg.num_hidden_layers)
        if start_layer:
            layers = jax.tree_util.tree_map(lambda x: x[start_layer:], layers)
        if cache is not None:
            h, (new_k, new_v) = jax.lax.scan(
                body, h, (layers, cache.k, cache.v, idxs)
            )
        else:
            n_run = cfg.num_hidden_layers - start_layer
            zero_kv = (jnp.zeros((n_run, 0)), jnp.zeros((n_run, 0)))
            h, _ = jax.lax.scan(body, h, (layers, *zero_kv, idxs))
            new_k = new_v = None
    else:
        # Key both interventions and capture by layer INDEX so either
        # spelling ('layers.24' or the reference's 'model.layers.24') works —
        # the scan path above already parses indices the same way; a
        # spelling-sensitive match here silently dropped hooks.
        iv_by_idx = (
            {_hookpoint_layer_idx(k): fn for k, fn in interventions.items()}
            if interventions
            else {}
        )
        cap_by_idx = {_hookpoint_layer_idx(c): c for c in capture}
        new_k_list, new_v_list = [], []
        for i in range(start_layer, cfg.num_hidden_layers):
            kv = (cache.k[i], cache.v[i]) if cache is not None else None
            h, (k_full, v_full) = layer_fn(
                _layer_slice(layers, i),
                cfg,
                h,
                cos,
                sin,
                mask,
                kv=kv,
                cache_offset=offset if cache is not None else None,
                pad_mask=pad_mask,
            )
            if i in iv_by_idx:
                h = iv_by_idx[i](h)
            if i in cap_by_idx:
                captured[cap_by_idx[i]] = h
            if cache is not None:
                new_k_list.append(k_full)
                new_v_list.append(v_full)
        if cache is not None:
            new_k, new_v = jnp.stack(new_k_list), jnp.stack(new_v_list)

    out = {"captured": captured}
    if cache is not None:
        out["cache"] = KVCache(new_k, new_v, offset + S)
    h_final = rms_norm(h, params["norm"], cfg.rms_norm_eps)
    if return_hidden:
        out["hidden"] = h_final
    if return_logits:
        out["logits"] = lm_head_logits(params, cfg, h_final)
    return out


def lm_head_logits(params: dict, cfg: LlamaConfig, h_final: jax.Array) -> jax.Array:
    """Project post-norm hidden states to vocabulary logits, handling the
    tied-embedding and quantized-table variants."""
    lm_head = params.get("lm_head")
    if lm_head is None:
        emb = params["embed_tokens"]
        if is_quantized(emb):
            # Tied head with a quantized table: scale is per hidden dim
            # (= the matmul's *input* dim after transpose), so fold it
            # into the activations before the int8 matmul.
            return jnp.dot(
                (h_final.astype(jnp.float32) * emb["scale"]).astype(h_final.dtype),
                emb["q8"].T.astype(h_final.dtype),
            )
        return h_final @ emb.T
    return qmatmul(h_final, lm_head, int8=cfg.int8_matmul)


def _hookpoint_layer_idx(hookpoint: str) -> int:
    """'model.layers.24' / 'layers.24' -> 24 (loud on anything else)."""
    tail = hookpoint.rsplit(".", 1)[-1]
    if not tail.isdigit():
        raise ValueError(
            f"unsupported hookpoint {hookpoint!r}: only decoder-layer outputs "
            "('layers.N' / 'model.layers.N') can be captured or intervened on"
        )
    return int(tail)


def suffix_params_above(params: dict, layer_idx: int) -> dict:
    """Host-side slice of the weights the suffix forward needs: the layers
    above `layer_idx`, plus final norm and LM head (unsliced leaves alias
    the live buffers).  Shared by LlamaModel and LlavaNextModel — see
    LlamaModel.suffix_params for the 16 GB memory rationale."""
    out = {k: v for k, v in params.items() if k != "layers"}
    layers = params["layers"]
    if isinstance(layers, dict):  # stacked
        out["layers"] = jax.tree_util.tree_map(lambda x: x[layer_idx + 1 :], layers)
    else:
        out["layers"] = layers[layer_idx + 1 :]
    return out


def forward_from_layer_above(
    params: dict,
    cfg: LlamaConfig,
    hidden: jax.Array,
    layer_idx: int,
    attention_mask=None,
    last_logit_only: bool = True,
    suffix: Optional[dict] = None,
):
    """Resume the decoder forward from layer `layer_idx`'s output (the
    suffix half of attribution's prefix/suffix split; traceable).  With
    `suffix` (from `suffix_params_above`) only the above-splice weights ride
    jit arguments; `last_logit_only` projects just the final position."""
    if suffix is None:
        run_params, start = params, layer_idx + 1
        run_cfg = cfg
    else:
        run_params, start = suffix, 0
        run_cfg = dataclasses.replace(
            cfg, num_hidden_layers=cfg.num_hidden_layers - layer_idx - 1
        )
    out = llama_forward(
        run_params,
        run_cfg,
        inputs_embeds=hidden,
        attention_mask=(
            jnp.asarray(attention_mask) if attention_mask is not None else None
        ),
        start_layer=start,
        return_logits=not last_logit_only,
        return_hidden=last_logit_only,
    )
    if last_logit_only:
        h = out["hidden"]
        if attention_mask is not None:
            # Per-row LAST attended position: [:, -1] is only correct for
            # left-padded (or dense) rows; a right-padded batch would read
            # pad-position logits. argmax over the reversed mask finds the
            # last 1 regardless of padding side.
            am = jnp.asarray(attention_mask)
            last = am.shape[1] - 1 - jnp.argmax(am[:, ::-1], axis=1)
            h = jnp.take_along_axis(
                h, last[:, None, None].astype(jnp.int32), axis=1
            )
        else:
            h = h[:, -1:]
        return lm_head_logits(run_params, run_cfg, h)
    return out["logits"]


def init_llama_params(key: jax.Array, cfg: LlamaConfig, dtype=jnp.float32) -> dict:
    """Random init (scaled normal) — for tests/benchmarks without checkpoints."""
    D, I, V = cfg.hidden_size, cfg.intermediate_size, cfg.vocab_size
    H, kvH, hd = cfg.num_attention_heads, cfg.num_key_value_heads, cfg.head_dim_
    keys = iter(jax.random.split(key, 4 + 10 * cfg.num_hidden_layers))

    def mat(shape, scale=None):
        k = next(keys)
        scale = scale if scale is not None else (shape[0] ** -0.5)
        return (jax.random.normal(k, shape, jnp.float32) * scale).astype(dtype)

    layers = []
    for _ in range(cfg.num_hidden_layers):
        layers.append(
            {
                "input_layernorm": jnp.ones((D,), dtype),
                "q_proj": mat((D, H * hd)),
                "k_proj": mat((D, kvH * hd)),
                "v_proj": mat((D, kvH * hd)),
                "o_proj": mat((H * hd, D)),
                "post_attention_layernorm": jnp.ones((D,), dtype),
                "gate_proj": mat((D, I)),
                "up_proj": mat((D, I)),
                "down_proj": mat((I, D)),
            }
        )
    params = {
        "embed_tokens": mat((V, D), scale=0.02),
        "layers": layers,
        "norm": jnp.ones((D,), dtype),
    }
    if not cfg.tie_word_embeddings:
        params["lm_head"] = mat((D, V), scale=0.02)
    return params


class LlamaModel:
    """Object shell implementing the ActivationSource protocol plus
    generation (see models/api.py)."""

    def __init__(self, params: dict, cfg: LlamaConfig):
        # Stack per-layer params once: `greedy_generate` scans over depth, and
        # stacking inside it would re-copy the whole model on EVERY call
        # (~8.6 GB device traffic per steering sweep at 8B scale). The
        # unrolled capture path slices layers back out inside jit, where the
        # slices are trace-time views.
        self.params = stack_layer_params(params)
        self.cfg = cfg
        self._capture_jit = {}

    def hookpoint_names(self) -> List[str]:
        return [f"layers.{i}" for i in range(self.cfg.num_hidden_layers)]

    def layers_name(self) -> str:
        return "layers"

    def resolve_widths(self, hookpoints: List[str]) -> Dict[str, int]:
        return {h: self.cfg.hidden_size for h in hookpoints}

    def capture(self, batch: dict, hookpoints: List[str]) -> Dict[str, jax.Array]:
        key = tuple(sorted(hookpoints))
        if key not in self._capture_jit:
            cfg = self.cfg

            @jax.jit
            def run(params, input_ids, attention_mask):
                out = llama_forward(
                    params,
                    cfg,
                    input_ids,
                    attention_mask=attention_mask,
                    capture=key,
                    return_logits=False,
                )
                return out["captured"]

            self._capture_jit[key] = run
        ids = jnp.asarray(batch["input_ids"])
        amask = batch.get("attention_mask")
        # Keep a missing (or all-ones) mask as None: fabricating ones forces
        # the flash path through segment ids, which bars its fast 512-wide
        # blocks (see flash_attention).
        if amask is not None:
            amask_np = np.asarray(amask)
            amask = None if amask_np.all() else jnp.asarray(amask_np)
        sharding = getattr(self, "batch_sharding", None)
        if sharding is not None:
            # In-process data parallelism (`--dp N`): commit the rows sharded
            # over the ('data',) mesh so GSPMD partitions the forward along
            # the batch with zero collectives (parallel/data_parallel.py).
            # Row-independent math: pad rows are sliced off, the rest are
            # bitwise what a single-device run computes.
            from ..parallel.data_parallel import place_rows_padded

            ids, n_rows = place_rows_padded(ids, sharding)
            if amask is not None:
                amask, _ = place_rows_padded(amask, sharding)
            out = self._capture_jit[key](self.params, ids, amask)
            return {k: v[:n_rows] for k, v in out.items()}
        return self._capture_jit[key](self.params, ids, amask)

    def prepare_inputs(self, images=None, input_ids=None, prompt_ids=None):
        """Text-only analogue of LlavaNextModel.prepare_inputs (review r5:
        the attribution flow calls this uniformly on any subject — it used
        to crash with AttributeError on plain-LLaMA checkpoints).  Ragged
        rows are RIGHT-padded with an attention mask, like the LLaVA path;
        rectangular input gets no mask (keeps the flash fast path)."""
        if images is not None:
            raise ValueError(
                "LlamaModel is text-only; image inputs need a LLaVA "
                "checkpoint (LlavaNextModel)"
            )
        rows = input_ids if input_ids is not None else prompt_ids
        return pad_text_rows(rows)

    def forward(
        self,
        batch: dict,
        capture: Sequence[str] = (),
        interventions: Optional[Dict[str, InterventionFn]] = None,
        return_logits: bool = True,
    ):
        """Traceable full forward with capture/interventions — the generic
        SAE-splice path's entry point (features/patching/utils.py calls
        `model.forward` inside its own jit/value_and_grad, so no jit here;
        mirrors LlavaNextModel.forward's contract).  Review r5: LlamaModel
        previously lacked this, so the multi-hookpoint attribution path only
        worked on LLaVA subjects (tests papered over it with a local
        wrapper)."""
        amask = batch.get("attention_mask")
        return llama_forward(
            self.params,
            self.cfg,
            jnp.asarray(batch["input_ids"]),
            attention_mask=None if amask is None else jnp.asarray(amask),
            capture=tuple(capture),
            interventions=interventions,
            return_logits=return_logits,
        )

    def suffix_params(self, hookpoint: str) -> dict:
        """Host-side slice of the weights `forward_from_layer` needs (the
        layers above `hookpoint`, plus final norm and LM head — unsliced
        leaves alias the live buffers).  Thread THIS through jitted suffix
        calls instead of the full tree: an in-program `layers[start:]` slice
        materializes a per-program copy of the suffix weights (~1.9 GB at
        8B/hook-24) that tips a 16 GB chip (measured: the F=2 long-shape
        attribution OOMed by exactly that margin)."""
        return suffix_params_above(self.params, _hookpoint_layer_idx(hookpoint))

    def forward_from_layer(
        self, hidden, hookpoint: str, batch: dict, last_logit_only: bool = True,
        suffix: Optional[dict] = None,
    ):
        """Resume the forward from a hookpoint's captured output: `hidden` is
        the (possibly spliced) output of `hookpoint` and only the layers
        above it run.  Traceable — called inside the caller's jit (the
        attribution suffix, features/patching/attribution.py); pass
        `suffix=self.suffix_params(hookpoint)` there so only the above-splice
        weights ride jit arguments (memory note on suffix_params).

        `last_logit_only` projects just the final position to vocabulary —
        the logit-diff metric never reads the rest, and the full (S, 128k)
        f32 logits plus their backward are multi-GB at real prompt shapes."""
        return forward_from_layer_above(
            self.params,
            self.cfg,
            hidden,
            _hookpoint_layer_idx(hookpoint),
            attention_mask=batch.get("attention_mask"),
            last_logit_only=last_logit_only,
            suffix=suffix,
        )

    # ---- generation ------------------------------------------------------
    def generate(
        self,
        input_ids,
        max_new_tokens: int = 512,
        interventions: Optional[Dict[str, InterventionFn]] = None,
        intervene_prefill_only: bool = True,
        eos_token_id: Union[int, Sequence[int], None] = None,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: Optional[float] = None,
        prng_key=None,
    ):
        """Greedy (default) or sampled generation with a jitted decode loop
        (the reference calls HF `generate`, which honors the checkpoint's
        generation_config sampling, reference features/steering.py:72-75;
        sampling knobs here mirror HF's temperature + nucleus warpers).

        `intervene_prefill_only` mirrors the reference steering hook's
        "skip decode-phase len-1 sequences" condition
        (reference features/steering.py:113-114).

        `eos_token_id` accepts an int or a list of stop ids (Llama-3 ships
        [eot, eos]); when omitted it defaults from the checkpoint's
        generation_config (attached by launch.utils.load_subject_model), so
        every caller stops at end-of-turn like HF `generate` without
        threading the id explicitly."""
        if eos_token_id is None:
            eos_token_id = (getattr(self, "generation_config", None) or {}).get(
                "eos_token_id"
            )
        attention_mask = None
        if isinstance(input_ids, dict):
            attention_mask = input_ids.get("attention_mask")
            input_ids = input_ids["input_ids"]
        import numpy as _np

        input_ids = _np.asarray(input_ids)
        return greedy_generate(
            self.params,
            self.cfg,
            jnp.asarray(input_ids),
            max_new_tokens=max_new_tokens,
            interventions=interventions,
            intervene_prefill_only=intervene_prefill_only,
            eos_token_id=eos_token_id,
            attention_mask=attention_mask,
            do_sample=do_sample,
            temperature=temperature,
            top_p=top_p,
            prng_key=prng_key,
            batch_sharding=getattr(self, "batch_sharding", None),
        )


def greedy_generate(
    params,
    cfg: LlamaConfig,
    input_ids: jax.Array,
    max_new_tokens: int,
    interventions=None,
    intervene_prefill_only: bool = True,
    eos_token_id: Union[int, Sequence[int], None] = None,
    inputs_embeds: Optional[jax.Array] = None,
    attention_mask: Optional[jax.Array] = None,
    do_sample: bool = False,
    temperature: float = 1.0,
    top_p: Optional[float] = None,
    prng_key: Optional[jax.Array] = None,
    batch_sharding=None,
):
    """Greedy (default) or sampled decode: jitted prefill + `lax.while_loop`
    decode with a static KV cache.

    `do_sample=True` enables temperature + nucleus sampling with HF
    `generate(do_sample=True)` warper semantics (the reference inherits the
    subject's generation_config through HF generate, reference
    features/steering.py:72-75): logits are divided by `temperature`, the
    smallest set of tokens whose cumulative probability reaches `top_p` is
    kept (at least one token survives), and the next token is drawn
    categorically.  `temperature`/`top_p` flow as traced scalars, so sweeps
    share one compiled program; the PRNG key threads through the decode loop
    (one split per step).  Greedy stays bit-identical to before.

    `attention_mask` supports batched *left-padded* prompts (HF's decoder-only
    generation convention, and what the collator emits — reference
    train/sae/data.py pad handling): pad positions are masked out of attention
    for the whole generation, position ids follow the real tokens
    (cumsum(mask) - 1, like HF), and the next-token logit is taken at the last
    column, which left-padding guarantees is the final real token.
    Right-padded batches are rejected up front rather than silently attending
    to pad tokens.

    `batch_sharding` (a NamedSharding over a ('data',) mesh, set on the model
    by `--dp N` — parallel/data_parallel.py) row-shards the whole generation:
    ids/embeds/masks AND the KV cache commit with the batch axis partitioned,
    so each chip prefills and decodes only its rows — zero collectives, and
    per-chip cache memory drops to B/N rows. Rows are independent (steering
    rides features on the batch axis), so outputs are unchanged. Batches that
    do not divide the mesh (e.g. the B=1 unsteered baseline) fall back to the
    unsharded path rather than padding: padded rows would burn a full decode
    loop per pad, and the steering controller already tops its chunks up to a
    mesh multiple where that trade is worth it."""
    B, S = input_ids.shape[0], input_ids.shape[1]
    max_len = S + max_new_tokens
    dtype = leaf_dtype(params["embed_tokens"])
    # Stacked layers → the forward scans over depth, keeping the decode-loop
    # program O(1) in layer count (unrolled 8+-layer generate graphs exceed
    # compiler payload limits on some platforms).
    params = stack_layer_params(params)
    dp_active = (
        batch_sharding is not None
        and B % batch_sharding.mesh.devices.size == 0
    )
    if dp_active:
        from jax.sharding import NamedSharding, PartitionSpec as P

        _mesh, _axis = batch_sharding.mesh, batch_sharding.spec[0]
        # Allocate the cache's batch dim (dim 1 of (layers, B, kvH, len, hd))
        # sharded from the start: each chip only ever holds its rows' slice.
        _kv_spec = NamedSharding(_mesh, P(None, _axis, None, None, None))
        cache = KVCache.init(
            cfg, B, max_len, dtype=dtype,
            kv_sharding=_kv_spec,
            length_sharding=NamedSharding(_mesh, P()),
        )
    else:
        cache = KVCache.init(cfg, B, max_len, dtype=dtype)

    if attention_mask is not None:
        import numpy as _np

        am = _np.asarray(attention_mask).astype(_np.int32)
        if am.shape != (B, S):
            raise ValueError(f"attention_mask shape {am.shape} != {(B, S)}")
        if am.all():
            attention_mask = None  # dense mask: fall through to the fast path
        elif not (_np.diff(am, axis=1) >= 0).all():
            raise ValueError(
                "batched generation requires LEFT-padded inputs (pad tokens "
                "first); right padding would take the next-token logit from "
                "a pad position"
            )
    if attention_mask is not None:
        lengths = jnp.asarray(am.sum(axis=1), jnp.int32)  # real tokens per row
        # One mask covering the whole cache: prompt pads stay masked for
        # every decode step; generated slots are always live.
        full_mask = jnp.concatenate(
            [jnp.asarray(am), jnp.ones((B, max_new_tokens), jnp.int32)], axis=1
        )
        prefill_pos = jnp.maximum(jnp.cumsum(jnp.asarray(am), axis=1) - 1, 0)
    else:
        lengths = jnp.full((B,), S, jnp.int32)
        full_mask = None
        prefill_pos = None

    if eos_token_id is not None:
        # HF checkpoints may define several stop ids (Llama-3: eot + eos);
        # normalize to a hashable tuple so the executable-cache key is
        # stable across list/int spellings. An empty list means no-eos
        # (eos_token_id[0] is used as the fill value below).
        eos_token_id = (
            tuple(int(e) for e in eos_token_id)
            if isinstance(eos_token_id, (list, tuple))
            else (int(eos_token_id),)
        ) or None
    if dp_active:
        from ..parallel.data_parallel import place_rows

        input_ids = place_rows(input_ids, batch_sharding)
        if inputs_embeds is not None:
            inputs_embeds = place_rows(inputs_embeds, batch_sharding)
        if full_mask is not None:
            full_mask = place_rows(full_mask, batch_sharding)
            prefill_pos = place_rows(prefill_pos, batch_sharding)
        lengths = place_rows(lengths, batch_sharding)
    iv_spec, iv_args = _split_interventions(interventions)
    has_top_p = do_sample and top_p is not None and top_p < 1.0
    prefill_fn, decode_fn = _generate_fns(
        cfg,
        max_new_tokens,
        eos_token_id,
        iv_spec,
        intervene_prefill_only,
        do_sample=do_sample,
        has_top_p=has_top_p,
    )
    if do_sample:
        if float(temperature) <= 0:
            # HF generate raises the same; logits/0 would sample garbage.
            raise ValueError(
                "do_sample=True requires temperature > 0; use "
                "do_sample=False for greedy decoding"
            )
        key = prng_key if prng_key is not None else jax.random.PRNGKey(0)
        sample_args = (
            jnp.asarray(temperature, jnp.float32),
            jnp.asarray(top_p if has_top_p else 1.0, jnp.float32),
            key,
        )
    else:
        # Static placeholders keep the greedy program's signature stable.
        sample_args = (
            jnp.asarray(1.0, jnp.float32),
            jnp.asarray(1.0, jnp.float32),
            jax.random.PRNGKey(0),
        )

    cache, first = prefill_fn(
        params, cache, input_ids, inputs_embeds, full_mask, prefill_pos, iv_args,
        sample_args,
    )
    if max_new_tokens == 1:
        new_tokens = first[:, None]
    else:
        new_tokens = decode_fn(
            params, cache, first, full_mask, lengths, iv_args, sample_args
        )
    return jnp.concatenate([input_ids, new_tokens.astype(input_ids.dtype)], axis=1)


def top_p_filter(logits: jax.Array, top_p: jax.Array) -> jax.Array:
    """Nucleus filtering with HF `TopPLogitsWarper` semantics, replicated
    exactly: sort ASCENDING (stable), remove tokens whose bottom-up
    cumulative mass is <= 1 - top_p (always keeping the top token), and
    scatter the mask back through the inverse permutation.  The sorted-mask
    scatter — rather than a threshold compare against the boundary logit —
    matters for ties at the nucleus boundary: HF keeps the higher-index
    members of a tie class, and a threshold compare would keep the whole
    class (on a flat distribution that disables top_p entirely)."""
    order = jnp.argsort(logits, axis=-1)  # ascending; stable, ties by index
    sorted_logits = jnp.take_along_axis(logits, order, axis=-1)
    cum = jnp.cumsum(jax.nn.softmax(sorted_logits, axis=-1), axis=-1)
    remove_sorted = cum <= (1.0 - top_p)
    remove_sorted = remove_sorted.at[..., -1].set(False)  # min_tokens_to_keep=1
    inv = jnp.argsort(order, axis=-1)
    remove = jnp.take_along_axis(remove_sorted, inv, axis=-1)
    return jnp.where(remove, -jnp.inf, logits)


def _make_next_token_fn(do_sample: bool, has_top_p: bool):
    """(logits (B, V), sample_args) -> next token ids (B,).  Sampling runs in
    fp32 (HF warps in fp32 regardless of model dtype)."""

    def next_token(logits, sample_args):
        if not do_sample:
            return jnp.argmax(logits, axis=-1)
        temperature, top_p, key = sample_args
        logits = logits.astype(jnp.float32) / temperature
        if has_top_p:
            logits = top_p_filter(logits, top_p)
        return jax.random.categorical(key, logits, axis=-1)

    return next_token


def _split_interventions(interventions):
    """-> (hashable spec, {name: args pytree}).  `Intervention` values split
    into an identity-stable (name, fn, static) key part and a traced-args
    part; plain callables key by object identity (same-object reuse still
    hits the executable cache; fresh closures retrace, as before the cache
    existed)."""
    if not interventions:
        return None, {}
    spec, args = [], {}
    for name in sorted(interventions):
        v = interventions[name]
        if isinstance(v, Intervention):
            spec.append((name, v.fn, v.static))
            args[name] = v.args
        else:
            spec.append((name, v))
    return tuple(spec), args


def _rebuild_interventions(spec, args):
    if spec is None:
        return None
    out = {}
    for entry in spec:
        if len(entry) == 3:
            name, fn, static = entry
            out[name] = Intervention(fn, args.get(name, ()), static)
        else:
            name, fn = entry
            out[name] = fn
    return out


_GENERATE_CACHE: Dict[tuple, tuple] = {}
_GENERATE_CACHE_CAP = 64


def _generate_fns(
    cfg,
    max_new_tokens,
    eos_token_id,
    iv_spec,
    intervene_prefill_only,
    do_sample=False,
    has_top_p=False,
):
    """Jitted (prefill, decode_loop) pair, cached across `greedy_generate`
    calls.  Without this cache the pair was rebuilt — and the full
    prefill+decode program re-traced and re-compiled — on EVERY call, so the
    steering fleet paid a 32-layer compile per feature chunk.  Arrays
    (params, masks, intervention args, temperature/top_p/PRNG key) flow as
    jit *arguments*, so jit's own shape-keyed retrace handles varying
    batch/prompt shapes under one cache entry, and no weights are baked into
    the program as constants."""
    key = (
        cfg,
        max_new_tokens,
        eos_token_id,
        iv_spec,
        intervene_prefill_only,
        do_sample,
        has_top_p,
    )
    fns = _GENERATE_CACHE.get(key)
    if fns is not None:
        # Refresh recency: dicts evict in insertion order, so without this a
        # hot steering configuration would be FIFO-evicted while cold
        # one-shot entries survive.
        _GENERATE_CACHE[key] = _GENERATE_CACHE.pop(key)
        return fns

    decode_spec = None if intervene_prefill_only else iv_spec
    next_token = _make_next_token_fn(do_sample, has_top_p)

    @jax.jit
    def prefill(
        params, cache, input_ids, inputs_embeds, full_mask, prefill_pos, iv_args,
        sample_args,
    ):
        out = llama_forward(
            params,
            cfg,
            input_ids,
            inputs_embeds=inputs_embeds,
            attention_mask=full_mask,
            position_ids=prefill_pos,
            cache=cache,
            capture=(),
            interventions=_rebuild_interventions(iv_spec, iv_args),
            return_logits=False,
            return_hidden=True,
        )
        temperature, top_p, key = sample_args
        # Project ONLY the last position (left-padding guarantees it is the
        # final real token): full-sequence vocab logits are a (B, S, V)
        # transient — ~4.9 GB bf16 at B=8, S~2400 — plus wasted MXU work.
        last_logits = lm_head_logits(params, cfg, out["hidden"][:, -1:, :])
        # Step-0 subkey; decode steps fold in their own step index below.
        next_tok = next_token(
            last_logits[:, 0, :],
            (temperature, top_p, jax.random.fold_in(key, 0)),
        )
        return out["cache"], next_tok

    @jax.jit
    def decode_loop(params, cache, first_tok, full_mask, lengths, iv_args, sample_args):
        B = first_tok.shape[0]
        decode_iv = _rebuild_interventions(decode_spec, iv_args)
        temperature, top_p, base_key = sample_args
        tokens0 = jnp.zeros((B, max_new_tokens), dtype=jnp.int32)
        tokens0 = tokens0.at[:, 0].set(first_tok.astype(jnp.int32))
        if eos_token_id is not None:
            eos_arr = jnp.asarray(eos_token_id, jnp.int32)  # static tuple
            done0 = (first_tok[:, None] == eos_arr[None, :]).any(-1)
        else:
            done0 = jnp.zeros((B,), bool)

        def cond(state):
            i, cache, tokens, done = state
            return jnp.logical_and(i < max_new_tokens, ~jnp.all(done))

        def body(state):
            i, cache, tokens, done = state
            cur = jax.lax.dynamic_slice(tokens, (0, i - 1), (B, 1))
            # Generated token i-1 follows the row's real tokens directly:
            # position = real_length + (i - 1), regardless of left padding.
            pos = (lengths + i - 1)[:, None] if full_mask is not None else None
            out = llama_forward(
                params,
                cfg,
                cur,
                attention_mask=full_mask,
                position_ids=pos,
                cache=cache,
                interventions=decode_iv,
            )
            nxt = next_token(
                out["logits"][:, -1, :],
                (temperature, top_p, jax.random.fold_in(base_key, i)),
            ).astype(jnp.int32)
            if eos_token_id is not None:
                nxt = jnp.where(done, eos_token_id[0], nxt)
                done = jnp.logical_or(
                    done, (nxt[:, None] == eos_arr[None, :]).any(-1)
                )
            tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, i))
            return i + 1, out["cache"], tokens, done

        i_fin, cache, tokens, _ = jax.lax.while_loop(
            cond, body, (jnp.asarray(1), cache, tokens0, done0)
        )
        if eos_token_id is not None:
            # Early all-done exit leaves the tail of the buffer at its
            # zeros init — token id 0 is a REAL vocab token ('!' in
            # Llama-3) that would decode as trailing babble; fill with the
            # primary stop id like HF's pad fill (pad == eos for Llama-3).
            tokens = jnp.where(
                jnp.arange(max_new_tokens)[None, :] >= i_fin,
                jnp.asarray(eos_token_id[0], jnp.int32),
                tokens,
            )
        return tokens

    if len(_GENERATE_CACHE) >= _GENERATE_CACHE_CAP:
        evicted = next(iter(_GENERATE_CACHE))
        _GENERATE_CACHE.pop(evicted)
        # A fleet mixing many (shape, max_new_tokens) pairs can thrash this
        # LRU silently — each miss is a full 32-layer recompile, so say so.
        from ..logger import logger

        logger.warning(
            f"generate executable cache full ({_GENERATE_CACHE_CAP}): evicting "
            f"max_new_tokens={evicted[1]} entry; recurring evictions mean "
            "the workload mixes too many generate configurations "
            "(consider bucketing max_new_tokens)"
        )
    _GENERATE_CACHE[key] = (prefill, decode_loop)
    return prefill, decode_loop
