"""Subject-model protocol: the functional replacement for forward hooks.

The reference reaches inside HF models with `register_forward_hook` to
capture (reference train/sae/sae/trainer.py:267-273, features/cache.py:178-204),
replace (reference features/steering.py:105-124) or splice
(reference features/patching/utils.py:33-58) layer outputs.  None of that
exists in JAX — and it doesn't need to: a subject model here is a pure
function whose layer loop accepts

* `capture`: a set of hookpoint names whose hidden states are returned, and
* `interventions`: {hookpoint: fn(hidden) -> hidden} applied in place of the
  layer output,

which covers capture (cache/training), replace (steering), splice+ablate
(attribution) — and is jit-able, grad-able (`jax.vjp` through an intervention
replaces `retain_grad`), and usable inside the generation loop
(SURVEY.md §7 design stance).

`ActivationSource` is the minimal surface the trainer and cache need.
"""

from __future__ import annotations

from typing import Dict, List, Protocol, runtime_checkable

import jax
import jax.numpy as jnp


@runtime_checkable
class ActivationSource(Protocol):
    """What SaeTrainer / FeatureCache require of a subject model."""

    def hookpoint_names(self) -> List[str]:
        """All hookable module names, e.g. ["layers.0", ..., "layers.31"]."""
        ...

    def layers_name(self) -> str:
        """Prefix for layer-index hookpoints (reference get_layer_list,
        sae_auto_interp/sae/utils.py:65-75); e.g. "layers"."""
        ...

    def resolve_widths(self, hookpoints: List[str]) -> Dict[str, int]:
        """Output dim per hookpoint (reference resolve_widths,
        sae/utils.py:78-104 — done there with a dummy forward + hooks; here
        models just know their dims)."""
        ...

    def capture(self, batch: dict, hookpoints: List[str]) -> Dict[str, jax.Array]:
        """Run the frozen forward, returning {hookpoint: (B, S, d)} hidden
        states. Must be safe to call under jit."""
        ...


class SyntheticActivationSource:
    """Deterministic fake subject model for tests/benchmarks: hidden states
    are produced by a fixed random projection of one-hot token ids, so runs
    are reproducible without any checkpoint."""

    def __init__(self, d_model: int = 64, n_layers: int = 4, vocab: int = 128, seed: int = 0):
        self.d_model = d_model
        self.n_layers = n_layers
        key = jax.random.PRNGKey(seed)
        self.embed = jax.random.normal(key, (vocab, d_model)) / (d_model**0.5)
        self._names = [f"layers.{i}" for i in range(n_layers)]

    @classmethod
    def from_spec(cls, uri: str) -> "SyntheticActivationSource":
        """Parse a `synthetic://dM,L,V` model spec (empty spec -> defaults).

        The single parser behind every CLI that accepts synthetic subjects
        (train `__main__`, launch cache/attribution/steering) — a format
        change lands in one place."""
        spec = uri[len("synthetic://"):] if uri.startswith("synthetic://") else uri
        if spec:
            d_model, n_layers, vocab = (int(x) for x in spec.split(","))
            return cls(d_model=d_model, n_layers=n_layers, vocab=vocab)
        return cls()

    def hookpoint_names(self) -> List[str]:
        return list(self._names)

    def layers_name(self) -> str:
        return "layers"

    def resolve_widths(self, hookpoints: List[str]) -> Dict[str, int]:
        return {h: self.d_model for h in hookpoints}

    def capture(self, batch: dict, hookpoints: List[str]) -> Dict[str, jax.Array]:
        ids = jnp.asarray(batch["input_ids"])
        h = self.embed[ids]
        out = {}
        for name in hookpoints:
            i = int(name.split(".")[-1])
            out[name] = h * (1.0 + 0.1 * i) + 0.01 * i
        return out
