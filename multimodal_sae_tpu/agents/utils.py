"""Shared explainer/scorer text utilities
(reference sae_auto_interp/agents/utils.py:9-63): `<<token>>` highlighting of
above-threshold spans, activation-tuple rendering, and 0-10 activation
normalization."""

from __future__ import annotations

from typing import List

import numpy as np

from ..features import Example, FeatureRecord


def highlight(index: int, example: Example, tokenizer, threshold: float) -> str:
    """Render an example with activating token spans wrapped in << >>."""
    result = f"Example {index}: "
    threshold = example.max_activation * threshold
    str_toks = tokenizer.batch_decode([[t] for t in np.asarray(example.tokens)])
    example.str_toks = str_toks
    activations = np.asarray(example.activations)

    def check(i):
        return activations[i] > threshold

    i = 0
    out = [result]
    while i < len(str_toks):
        if check(i):
            out.append("<<")
            while i < len(str_toks) and check(i):
                out.append(str_toks[i])
                i += 1
            out.append(">>")
        else:
            out.append(str_toks[i])
            i += 1
    return "".join(out)


def join_activations(example: Example, threshold: float) -> str:
    """`Activations: ("tok" : value), ...` for above-threshold tokens."""
    activations = []
    threshold = example.max_activation * threshold
    acts = np.asarray(example.activations)
    for i, normalized in enumerate(example.normalized_activations):
        if acts[i] > threshold:
            activations.append((example.str_toks[i], int(normalized)))
    acts_str = ", ".join(f'("{tok}" : {val})' for tok, val in activations)
    return "Activations: " + acts_str


def normalize_examples(record: FeatureRecord, train: List[Example]):
    """Quantize activations to 0-10 relative to the feature's max."""
    max_activation = record.examples[0].max_activation
    for example in train:
        example.normalized_activations = np.floor(
            10 * np.asarray(example.activations) / max_activation
        )
