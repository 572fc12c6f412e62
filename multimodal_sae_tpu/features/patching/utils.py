"""SAE-splice forward helpers (reference features/patching/utils.py:9-79).

The reference's `get_model_forward_cache_with_sae` replaces each hooked
layer's output with the SAE reconstruction via forward hooks, optionally
ablating one feature with a multiplicative mask, and retains grads on the
cached outputs for attribution (reference utils.py:21-70 + attribution.py:165-172).
Here the splice is an intervention function and the gradient w.r.t. the
spliced output falls out of `jax.vjp` on a zero "delta" added at the splice
point — no retain_grad machinery."""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp

from ...sae import Sae
from ...sae.model import decode as sae_decode, pre_acts as sae_pre_acts, select_topk


def get_logit_diff(logits: jax.Array, answer_token_indices: jax.Array) -> jax.Array:
    """Final-token correct-vs-baseline logit margin
    (reference patching/utils.py:9-18). answer_token_indices: (B, 2)."""
    if logits.ndim == 3:
        logits = logits[:, -1, :]
    correct = jnp.take_along_axis(logits, answer_token_indices[:, 0:1], axis=1)
    incorrect = jnp.take_along_axis(logits, answer_token_indices[:, 1:2], axis=1)
    return (correct - incorrect).mean()


def sae_splice_intervention(
    sae: Sae, off_feature: Optional[jax.Array] = None
) -> Callable:
    """Intervention replacing a layer output with its SAE reconstruction,
    optionally ablating `off_feature` via a multiplicative mask
    (reference patching/utils.py:33-58)."""
    params, cfg = sae.params, sae.cfg

    def intervention(h: jax.Array) -> jax.Array:
        shape = h.shape
        flat = h.reshape(-1, shape[-1])
        latents = sae_pre_acts(params, flat)
        if off_feature is not None:
            mask = jnp.ones_like(latents).at[:, off_feature].set(0.0)
            latents = latents * mask
        top_acts, top_indices = select_topk(latents, cfg.k)
        out = sae_decode(params, top_acts, top_indices)
        return out.reshape(shape).astype(h.dtype)

    return intervention


def spliced_forward_with_delta(
    model,
    batch: dict,
    sae_dict: Dict[str, Sae],
    deltas: Dict[str, jax.Array],
    off_feature: Optional[jax.Array] = None,
):
    """Forward with SAE splices; each splice output gets `deltas[name]` added.

    Returns (logits, {name: spliced output *including* delta}).  Taking the
    gradient of a metric w.r.t. `deltas` at zero yields d(metric)/d(layer
    output) — the reference's retain_grad+backward
    (reference attribution.py:160-182)."""
    interventions = {}
    for name, sae in sae_dict.items():
        base = sae_splice_intervention(sae, off_feature)
        delta = deltas[name]

        def iv(h, base=base, delta=delta):
            return base(h) + delta.astype(h.dtype)

        interventions[name] = iv
    out = model.forward(
        batch, capture=tuple(sae_dict.keys()), interventions=interventions
    )
    return out["logits"], out["captured"]
