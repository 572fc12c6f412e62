"""Feature statistics (reference sae_auto_interp/features/stats.py): direct
logit attribution, max-activating-token diversity, decoder cosine similarity
and decoder-space neighbors — as jnp/numpy functions."""

from __future__ import annotations

from collections import defaultdict
from math import floor
from typing import Dict, List

import jax.numpy as jnp
import numpy as np

from .features import FeatureRecord


def logits(
    records: List[FeatureRecord],
    W_U,
    W_dec,
    k: int = 10,
    tokenizer=None,
) -> List[List[str]]:
    """Top-k direct logit attribution `W_U @ W_dec[:, idx]` per record
    (reference stats.py:12-47).

    Args:
        W_U: (vocab, d) unembedding matrix.
        W_dec: (d, L) decoder matrix (feature columns).
    """
    feature_indices = [record.feature.feature_index for record in records]
    narrowed_logits = jnp.matmul(W_U, W_dec[:, jnp.asarray(feature_indices)])
    top_logits = jnp.argsort(-narrowed_logits, axis=0)[:k]  # (k, n_records)
    per_record = np.asarray(top_logits.T)

    decoded_top_logits = []
    for record_index in range(len(records)):
        decoded = tokenizer.batch_decode(per_record[record_index][:, None])
        decoded_top_logits.append(decoded)
        records[record_index].top_logits = decoded
    return decoded_top_logits


def unigram(
    record: FeatureRecord, k: int = 10, threshold: float = 0.0, negative_shift: int = 0
):
    """Max-activating-token diversity check (reference stats.py:50-73).

    Note: `threshold` is the FRACTION of examples to inspect, and the
    reference's own default of 0.0 inspects zero examples — returning
    (set(), nan). Pass a positive threshold (e.g. 0.3) for a meaningful
    verdict; the default is kept for reference parity."""
    avg_nonzero = []
    top_tokens = []
    n_examples = floor(len(record.examples) * threshold)
    for example in record.examples[:n_examples]:
        acts = np.asarray(example.activations)
        avg_nonzero.append(int(np.count_nonzero(acts)))
        index = int(np.argmax(acts)) - negative_shift
        if index < 0:
            continue
        top_tokens.append(int(np.asarray(example.tokens)[index]))

    if len(set(top_tokens)) < k:
        return set(top_tokens), float(np.mean(avg_nonzero))
    return -1, float(np.mean(avg_nonzero))


def cos(matrix, selected_features=(0,)):
    """Column-cosine similarity of selected columns vs all columns
    (reference stats.py:76-85). `matrix` is (d, L)."""
    matrix = jnp.asarray(matrix)
    sel = jnp.asarray(list(selected_features))
    a = matrix[:, sel]
    a = a / (jnp.linalg.norm(a, axis=0, keepdims=True) + 1e-12)
    b = matrix / (jnp.linalg.norm(matrix, axis=0, keepdims=True) + 1e-12)
    return a.T @ b


def get_neighbors(submodule_dict: Dict[str, object], feature_filter: Dict, k: int = 10):
    """Top-k decoder-space neighbors per selected feature
    (reference stats.py:88-120). `submodule_dict` maps hookpoint -> Sae."""
    neighbors_dict = defaultdict(dict)
    per_layer_features = {}

    for module_path, sae in submodule_dict.items():
        selected_features = feature_filter.get(module_path, False)
        # The reference tests `not selected_features` (stats.py:102) on its
        # list filters; our load_filter returns np.ndarray values, whose
        # truth value is ambiguous — test emptiness explicitly.
        if selected_features is False or len(selected_features) == 0:
            continue
        # (L, d) decoder rows -> column layout (d, L) like the reference.
        W_D = jnp.asarray(sae.params["W_dec"]).T
        cos_sim = cos(W_D, selected_features=selected_features)
        order = jnp.argsort(-cos_sim, axis=-1)[:, :k]
        values = jnp.take_along_axis(cos_sim, order, axis=-1)

        # Reference-pinned shape (reference stats.py:112-118): entries are
        # keyed by POSITION in the filter (not by feature id), and [1:]
        # drops the top-1 assuming it is the feature itself — with exactly
        # duplicated decoder rows a tie could drop a real neighbor instead.
        # Consumers map keys back through the filter's order, as the
        # reference's do.
        for i in range(order.shape[0]):
            neighbors_dict[module_path][i] = {
                "indices": np.asarray(order[i]).tolist()[1:],
                "values": np.asarray(values[i]).tolist()[1:],
            }
        per_layer_features[module_path] = np.unique(np.asarray(order)).tolist()

    return neighbors_dict, per_layer_features
