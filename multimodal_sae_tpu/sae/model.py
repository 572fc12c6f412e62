"""TopK sparse autoencoder — functional JAX core.

One SAE core for both training and interpretation, replacing the reference's
two byte-identical copies (reference sae_auto_interp/sae/sae.py ==
train/sae/sae/sae.py).  Parameters are a plain pytree dict so they compose
directly with optax/jit/pjit:

    params = {
        "W_enc": (d_in, L),   # encoder weight, stored transposed vs torch
        "b_enc": (L,),
        "W_dec": (L, d_in),
        "b_dec": (d_in,),
    }

Math matches the reference exactly:
  * pre_acts  = relu((x - b_dec) @ W_enc + b_enc)            (reference sae.py:172-177)
  * encode    = top-k of pre_acts                             (reference sae.py:179-185)
  * decode    = sparse_decode(acts, idx, W_dec) + b_dec       (reference sae.py:187-191)
  * forward   = fvu + AuxK dead-latent loss + Multi-TopK fvu  (reference sae.py:193-247)
  * unit-norm decoder renorm                                  (reference sae.py:249-255)
  * grad projection off decoder directions                    (reference sae.py:257-271)

The hot paths are expressed TPU-first: wide top-k via the blockwise reduction
in ops/topk.py, and a dense threshold-mask decode (`topk_mask_decode`) in the
training forward so the whole step is matmuls on the MXU instead of
gather/scatter (see ops/sparse_decode.py for the trade-off discussion).
"""

from __future__ import annotations

from pathlib import Path
from typing import Dict, NamedTuple, Optional, Union

import jax
import jax.numpy as jnp

from ..config import SaeConfig
from ..ops import geometric_median  # re-exported for trainer convenience  # noqa: F401
from ..ops import kth_value, sparse_decode, top_k, topk_mask_decode
from ..utils import natsorted

Params = Dict[str, jax.Array]


class EncoderOutput(NamedTuple):
    top_acts: jax.Array
    """Activations of the top-k latents, (..., k)."""

    top_indices: jax.Array
    """Indices of the top-k features, (..., k)."""


class ForwardOutput(NamedTuple):
    sae_out: jax.Array

    latent_acts: Optional[jax.Array]
    """Activations of the top-k latents (None on the train fast path unless
    `return_topk=True`; training uses `fired` instead)."""

    latent_indices: Optional[jax.Array]
    """Indices of the top-k features (see `latent_acts`)."""

    fvu: jax.Array
    """Fraction of variance unexplained."""

    auxk_loss: jax.Array
    """AuxK loss, if applicable."""

    multi_topk_fvu: jax.Array
    """Multi-TopK FVU, if applicable."""

    fired: Optional[jax.Array] = None
    """(L,) bool — which latents fired anywhere in the batch (train fast path
    computes this directly from the dense mask; used for dead-feature
    bookkeeping instead of scattering latent_indices)."""


def init_params(
    key: jax.Array, d_in: int, cfg: SaeConfig, dtype=jnp.float32, decoder: bool = True
) -> Params:
    """Initialize like the reference (reference sae.py:54-66): encoder weight
    ~ U(-1/sqrt(d_in), 1/sqrt(d_in)) (torch nn.Linear default), zero biases,
    decoder = encoder-transpose clone, unit-norm rows if cfg.normalize_decoder.
    """
    num_latents = cfg.num_latents_for(d_in)
    bound = 1.0 / (d_in**0.5)
    W = jax.random.uniform(
        key, (num_latents, d_in), dtype=jnp.float32, minval=-bound, maxval=bound
    )
    params: Params = {
        "W_enc": W.T.astype(dtype),
        "b_enc": jnp.zeros((num_latents,), dtype=dtype),
        "b_dec": jnp.zeros((d_in,), dtype=dtype),
    }
    if decoder:
        W_dec = W.astype(dtype)
        params["W_dec"] = W_dec
        if cfg.normalize_decoder:
            params = set_decoder_norm_to_unit_norm(params)
    return params


def pre_acts(params: Params, x: jax.Array) -> jax.Array:
    """relu((x - b_dec) @ W_enc + b_enc) (reference sae.py:172-177).

    The matmul runs at HIGHEST precision: with float32 params the TPU default
    is a single bf16 MXU pass, which would make the "bit-stable fp32 cache"
    guarantee precision-lossy. bf16 params are unaffected by the setting.

    With an int8-quantized encoder (`quantize_encoder`, opt-in) the matmul
    runs on the native int8 MXU path instead — ~2x the bf16 rate on the
    cache step's dominant cost. W8A8 changes numerics (per-token activation
    quantization; top-k boundary ties can flip), so it is never used on the
    fp32 bit-parity path; inference-only (the int8 custom VJP carries no
    weight gradients)."""
    W = params["W_enc"]
    from ..models.quant import is_quantized, qmatmul

    if is_quantized(W):
        dtype = params["b_enc"].dtype
        sae_in = x.astype(dtype) - params["b_dec"]
        out = qmatmul(sae_in, W, int8=True)
        return jax.nn.relu(out + params["b_enc"])
    dtype = W.dtype
    sae_in = x.astype(dtype) - params["b_dec"]
    out = jnp.dot(
        sae_in,
        W,
        preferred_element_type=dtype,
        precision=jax.lax.Precision.HIGHEST,
    )
    return jax.nn.relu(out + params["b_enc"])


def quantize_encoder(params: Params) -> Params:
    """Opt-in W8A8 encoder for the frozen-SAE caching/interp paths: replaces
    W_enc with a per-output-channel symmetric int8 dict (models/quant.py),
    which `pre_acts` routes through the native int8 MXU matmul.  The decoder
    and biases are untouched (decode is a k-row gather, not matmul-bound).
    Inference-only: do not train through a quantized encoder."""
    from ..models.quant import quantize_weight

    out = dict(params)
    out["W_enc"] = quantize_weight(params["W_enc"])
    return out


def select_topk(latents: jax.Array, k: int) -> EncoderOutput:
    """Select the top-k latents (reference sae.py:179-181).

    Latents are post-ReLU (finite by construction), so the wide-top-k filter
    may skip its -inf defense clamp."""
    return EncoderOutput(*top_k(latents, k, assume_finite=True))


def encode(params: Params, x: jax.Array, cfg: SaeConfig) -> EncoderOutput:
    """Encode the input and select the top-k latents (reference sae.py:183-185)."""
    return select_topk(pre_acts(params, x), cfg.k)


def decode(params: Params, top_acts: jax.Array, top_indices: jax.Array) -> jax.Array:
    """Sparse decode + decoder bias (reference sae.py:187-191)."""
    assert "W_dec" in params, "Decoder weight was not initialized."
    y = sparse_decode(top_indices, top_acts.astype(params["W_dec"].dtype), params["W_dec"])
    return y + params["b_dec"]


def forward(
    params: Params,
    x: jax.Array,
    cfg: SaeConfig,
    dead_mask: Optional[jax.Array] = None,
    *,
    fast: bool = True,
    return_topk: bool = False,
    approx_topk: bool = False,
) -> ForwardOutput:
    """Full training forward (reference sae.py:193-247).

    `fast=True` (default) uses the dense threshold-mask decode: one extra
    (N, L) @ (L, d) matmul instead of gather/scatter sparse ops — the right
    trade on TPU where the MXU is idle during scatters. `fast=False` routes
    through `sparse_decode` (gather + custom VJP), matching the reference's
    TritonDecoder data path shape-for-shape.
    """
    assert not isinstance(params["W_enc"], dict), (
        "training forward requires a dense encoder — quantize_encoder is "
        "inference-only (its int8 VJP carries no weight gradients)"
    )
    dtype = params["W_enc"].dtype
    x = x.astype(dtype)
    pre = pre_acts(params, x)
    W_dec, b_dec = params["W_dec"], params["b_dec"]

    if fast:
        # approx_topk (training-only opt-in, TrainConfig.approx_topk): the
        # selection threshold comes from approx_max_k's ~0.95-recall pass
        # instead of the exact wide top-k — see topk_mask_decode.
        y, dense, sel_mask = topk_mask_decode(pre, W_dec, cfg.k, approx=approx_topk)
        sae_out = y + b_dec
        # Fired = selected AND positive. `sel_mask` alone (pre >= kth) is
        # wrong when any row has fewer than k positive pre-activations: its
        # k-th value is 0 and the >= 0 threshold marks ALL post-ReLU latents
        # of that row as fired, wiping the dead-feature bookkeeping (and with
        # it the AuxK loss). The reference scatters did_fire from its k
        # arbitrary tie-broken indices (reference trainer.py:334-339), whose
        # zero-valued picks are noise; counting only positive selections is
        # the deliberate, deterministic difference.
        fired = jnp.any(
            jnp.logical_and(sel_mask, pre > 0),
            axis=tuple(range(sel_mask.ndim - 1)),
        )
        if return_topk:
            # Parity with the reference output type; skipped by default on the
            # train path since `fired` covers the dead-feature bookkeeping.
            top_acts, top_indices = select_topk(jax.lax.stop_gradient(pre), cfg.k)
        else:
            top_acts = top_indices = None
    else:
        top_acts, top_indices = select_topk(pre, cfg.k)
        sae_out = decode(params, top_acts, top_indices)
        fired = None

    e = sae_out - x
    total_variance = jnp.sum((x - x.mean(axis=0)) ** 2)
    l2_loss = jnp.sum(e * e)
    fvu = l2_loss / total_variance

    # AuxK loss on dead latents (reference sae.py:207-227). Static-shape
    # reformulation: always select k_aux = d_in // 2 candidates among dead
    # latents; when fewer than k_aux are dead the threshold degenerates to
    # -inf and the mask keeps exactly the dead set. scale = min(dead/k_aux, 1)
    # zeroes the loss (and its gradient) when nothing is dead.
    if dead_mask is not None:
        d_in = x.shape[-1]
        k_aux = d_in // 2
        num_dead = dead_mask.sum().astype(dtype)
        scale = jnp.minimum(num_dead / k_aux, 1.0)

        neg_inf = jnp.array(-jnp.inf, dtype=pre.dtype)
        scores = jnp.where(dead_mask, pre, neg_inf)
        # k_aux = d_in/2 is far too large for block-max filtering; the exact
        # k-th value via bitwise search costs O(width) independent of k.
        kth = kth_value(scores, min(k_aux, scores.shape[-1] - 1))
        kth = jax.lax.stop_gradient(kth)
        aux_mask = jnp.logical_and(dead_mask, pre >= kth)
        dense_aux = jnp.where(aux_mask, pre, jnp.zeros_like(pre))
        e_hat = jnp.dot(dense_aux, W_dec, preferred_element_type=dtype) + b_dec
        auxk_loss = jnp.sum((e_hat - e) ** 2)
        auxk_loss = scale * auxk_loss / total_variance
    else:
        auxk_loss = jnp.zeros((), dtype=dtype)

    if cfg.multi_topk:
        y4, dense4, sel4 = topk_mask_decode(pre, W_dec, 4 * cfg.k)
        sae_out4 = y4 + b_dec
        multi_topk_fvu = jnp.sum((sae_out4 - x) ** 2) / total_variance
        # Reference quirk kept for parity (reference sae.py:232-238): with
        # multi_topk on, the returned sae_out/latents are the 4k versions
        # (sae_out is reassigned before constructing ForwardOutput) — which
        # also makes the trainer's did_fire track the 4k selection.
        sae_out = sae_out4
        if fired is not None:
            # Same positive-and-selected rule as above (4k selection makes a
            # zero k-th value — and the all-True mask hazard — more likely).
            fired = jnp.any(
                jnp.logical_and(sel4, pre > 0),
                axis=tuple(range(sel4.ndim - 1)),
            )
        if top_acts is not None:
            top_acts, top_indices = select_topk(
                jax.lax.stop_gradient(pre), 4 * cfg.k
            )
    else:
        multi_topk_fvu = jnp.zeros((), dtype=dtype)

    return ForwardOutput(
        sae_out, top_acts, top_indices, fvu, auxk_loss, multi_topk_fvu, fired
    )


def set_decoder_norm_to_unit_norm(params: Params) -> Params:
    """Renormalize decoder rows to unit norm (reference sae.py:249-255)."""
    W_dec = params["W_dec"]
    eps = jnp.finfo(W_dec.dtype).eps
    norm = jnp.linalg.norm(W_dec, axis=1, keepdims=True)
    return {**params, "W_dec": W_dec / (norm + eps)}


def remove_gradient_parallel_to_decoder_directions(
    params: Params, grads: Params
) -> Params:
    """Project the decoder gradient off the decoder directions
    (reference sae.py:257-271), keeping unit-norm rows stable under Adam."""
    W_dec, g = params["W_dec"], grads["W_dec"]
    parallel = jnp.einsum("ld,ld->l", g, W_dec)
    g = g - parallel[:, None] * W_dec
    return {**grads, "W_dec": g}


class Sae:
    """Convenience wrapper bundling (params, cfg, d_in) with the reference's
    object API (reference sae.py:44-271): `pre_acts`, `select_topk`, `encode`,
    `decode`, `forward`, `save_to_disk`, `load_from_disk/hub`, `load_many`.

    The functional module-level API is the one used inside jit/pjit code;
    this class is the ergonomic shell for scripts and tools.
    """

    def __init__(
        self,
        d_in: int,
        cfg: SaeConfig,
        dtype=jnp.float32,
        *,
        decoder: bool = True,
        params: Optional[Params] = None,
        key: Optional[jax.Array] = None,
    ):
        self.cfg = cfg
        self.d_in = d_in
        self.num_latents = cfg.num_latents_for(d_in)
        if params is None:
            key = key if key is not None else jax.random.PRNGKey(0)
            params = init_params(key, d_in, cfg, dtype=dtype, decoder=decoder)
        self.params = params

    # --- compute -----------------------------------------------------------
    @property
    def dtype(self):
        from ..models.quant import leaf_dtype

        return leaf_dtype(self.params["W_enc"])

    def pre_acts(self, x: jax.Array) -> jax.Array:
        return pre_acts(self.params, x)

    def select_topk(self, latents: jax.Array) -> EncoderOutput:
        return select_topk(latents, self.cfg.k)

    def encode(self, x: jax.Array) -> EncoderOutput:
        return encode(self.params, x, self.cfg)

    def decode(self, top_acts: jax.Array, top_indices: jax.Array) -> jax.Array:
        return decode(self.params, top_acts, top_indices)

    def quantize_encoder(self) -> "Sae":
        """In-place opt-in int8 encoder (see module-level quantize_encoder);
        returns self for chaining."""
        self.params = quantize_encoder(self.params)
        return self

    def forward(self, x: jax.Array, dead_mask=None, **kw) -> ForwardOutput:
        return forward(self.params, x, self.cfg, dead_mask, **kw)

    __call__ = forward

    # --- serialization (format-compatible with the reference) ---------------
    def save_to_disk(self, path: Union[Path, str]):
        from .serde import save_sae_to_disk

        save_sae_to_disk(self.params, self.cfg, self.d_in, path)

    @staticmethod
    def load_from_disk(
        path: Union[Path, str], dtype=None, *, decoder: bool = True
    ) -> "Sae":
        from .serde import load_sae_from_disk

        params, cfg, d_in = load_sae_from_disk(path, dtype=dtype, decoder=decoder)
        return Sae(d_in, cfg, params=params, decoder=decoder)

    @staticmethod
    def load_from_hub(
        name: str, hookpoint: Optional[str] = None, dtype=None, *, decoder: bool = True
    ) -> "Sae":
        from .serde import resolve_hub_path

        repo_path = resolve_hub_path(name, hookpoint)
        return Sae.load_from_disk(repo_path, dtype=dtype, decoder=decoder)

    @staticmethod
    def load_many(
        name: str,
        local: bool = False,
        layers: Optional[list] = None,
        dtype=None,
        *,
        decoder: bool = True,
        pattern: Optional[str] = None,
    ) -> Dict[str, "Sae"]:
        """Load SAEs for multiple hookpoints (reference sae.py:68-100):
        directory-per-hookpoint layout, natsorted."""
        from fnmatch import fnmatch

        from .serde import resolve_hub_path

        if local:
            repo_path = Path(name)
        else:
            # Hookpoint dirs nest the actual files, so the download filter
            # needs the reference's '/*' suffix (reference sae.py:79-83);
            # the raw pattern still matches directory names below.
            repo_path = Path(
                resolve_hub_path(
                    name,
                    None,
                    allow_patterns=pattern + "/*" if pattern is not None else None,
                    require_cfg=False,
                )
            )

        if layers is not None:
            return {
                layer: Sae.load_from_disk(repo_path / layer, dtype=dtype, decoder=decoder)
                for layer in natsorted(layers)
            }
        dirs = [
            f
            for f in repo_path.iterdir()
            if f.is_dir() and (pattern is None or fnmatch(f.name, pattern))
        ]
        return {
            f.name: Sae.load_from_disk(f, dtype=dtype, decoder=decoder)
            for f in natsorted(dirs, key=lambda f: f.name)
        }
