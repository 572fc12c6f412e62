"""Feature statistics (direct logit attribution, unigram diversity, decoder
cosine neighbors — reference features/stats.py) and the dependency-free PCA
dim reducer (reference features/dim_reduce/)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.config import SaeConfig
from multimodal_sae_tpu.features.dim_reduce import PcaReducer
from multimodal_sae_tpu.features.features import Example, Feature, FeatureRecord
from multimodal_sae_tpu.features.stats import cos, get_neighbors, logits, unigram
from multimodal_sae_tpu.sae import Sae


class StubTokenizer:
    def batch_decode(self, ids):
        return [f"tok{int(np.asarray(i).ravel()[0])}" for i in ids]


def _record(idx=0, module="layers.0"):
    return FeatureRecord(Feature(module, idx))


def test_logits_top_token_matches_numpy():
    rng = np.random.default_rng(0)
    W_U = rng.normal(size=(50, 8)).astype(np.float32)  # (vocab, d)
    W_dec = rng.normal(size=(8, 16)).astype(np.float32)  # (d, L)
    records = [_record(3), _record(7)]
    decoded = logits(records, jnp.asarray(W_U), jnp.asarray(W_dec), k=5,
                     tokenizer=StubTokenizer())
    assert len(decoded) == 2 and all(len(d) == 5 for d in decoded)
    for rec, dec in zip(records, decoded):
        dla = W_U @ W_dec[:, rec.feature.feature_index]
        assert dec[0] == f"tok{int(np.argmax(dla))}"
        assert rec.top_logits == dec


def test_unigram_flags_token_repetition():
    rec = _record()
    reps, diverse = [], []
    for i in range(10):
        acts = np.zeros(6, dtype=np.float32)
        acts[2] = 4.0
        toks = np.full(6, 9)
        reps.append(Example(tokens=toks, activations=acts))
        toks2 = np.arange(6) + 10 * i
        diverse.append(Example(tokens=toks2, activations=acts))
    rec.examples = reps
    top_tokens, avg_nz = unigram(rec, k=3, threshold=1.0)
    assert top_tokens == {9}  # one repeated max token -> flagged set
    assert avg_nz == 1.0
    rec.examples = diverse
    top_tokens, _ = unigram(rec, k=3, threshold=1.0)
    assert top_tokens == -1  # >=k distinct max tokens -> passes


def test_cos_identity_on_orthogonal_columns():
    m = jnp.eye(4)  # orthonormal columns
    sims = np.asarray(cos(m, selected_features=(0, 2)))
    np.testing.assert_allclose(sims[0], [1, 0, 0, 0], atol=1e-6)
    np.testing.assert_allclose(sims[1], [0, 0, 1, 0], atol=1e-6)


def test_get_neighbors_excludes_self_and_sorts():
    sae = Sae(8, SaeConfig(num_latents=32, k=4), key=jax.random.PRNGKey(0))
    neighbors, per_layer = get_neighbors(
        {"layers.0": sae, "layers.1": sae}, {"layers.0": [1, 5]}, k=6
    )
    assert set(neighbors) == {"layers.0"}  # unfiltered module skipped
    for i, sel in enumerate([1, 5]):
        entry = neighbors["layers.0"][i]
        assert len(entry["indices"]) == 5  # self (rank 0) dropped
        assert sel not in entry["indices"]
        assert entry["values"] == sorted(entry["values"], reverse=True)
        # Cross-check top neighbor against direct cosine computation.
        W = np.asarray(sae.params["W_dec"]).T  # (d, L)
        W = W / np.linalg.norm(W, axis=0, keepdims=True)
        sims = W[:, sel] @ W
        assert entry["indices"][0] == int(np.argsort(-sims)[1])
    assert set(per_layer) == {"layers.0"}


def test_pca_reducer_recovers_low_rank_structure():
    rng = np.random.default_rng(0)
    basis = rng.normal(size=(2, 16))
    X = rng.normal(size=(64, 2)) @ basis + 3.0  # rank-2 + offset
    red = PcaReducer(n_components=2)
    T = red.fit_transform(X)
    assert T.shape == (64, 2)
    recon = T @ np.asarray(red.components_) + np.asarray(red.mean_)
    np.testing.assert_allclose(recon, X, atol=1e-3)


def test_pca_fit_sae_list():
    saes = [
        Sae(8, SaeConfig(num_latents=16, k=4), key=jax.random.PRNGKey(i))
        for i in range(2)
    ]
    red = PcaReducer(n_components=3)
    red.fit_sae_list(saes)
    out = red.transform(np.asarray(saes[0].params["W_dec"]))
    assert out.shape == (16, 3)


def test_get_neighbors_accepts_ndarray_filters():
    """interp_utils.load_filter returns np.ndarray values; get_neighbors must
    not die on their ambiguous truth value, and must skip empty arrays
    (review r3)."""
    sae = Sae(8, SaeConfig(num_latents=32, k=4), key=jax.random.PRNGKey(0))
    neighbors, per_layer = get_neighbors(
        {"layers.0": sae, "layers.1": sae},
        {"layers.0": np.array([1, 5]), "layers.1": np.array([], dtype=np.int64)},
        k=6,
    )
    assert set(neighbors) == {"layers.0"}
    assert len(neighbors["layers.0"][0]["indices"]) == 5
