"""PCA reducer — a dependency-free (jnp SVD) DimReducer for decoder-direction
maps when `umap-learn` is unavailable."""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from ...sae import Sae
from .dim_reducer import DimReducer


class PcaReducer(DimReducer):
    def __init__(self, name: str = "pca", n_components: int = 2, **kwargs) -> None:
        super().__init__(name, n_components, **kwargs)
        self.mean_ = None
        self.components_ = None

    def fit(self, X, **kwargs):
        X = jnp.asarray(X, dtype=jnp.float32)
        self.mean_ = X.mean(axis=0)
        _, _, vt = jnp.linalg.svd(X - self.mean_, full_matrices=False)
        self.components_ = vt[: self.n_components]
        return self

    def transform(self, X, **kwargs):
        X = jnp.asarray(X, dtype=jnp.float32)
        return np.asarray((X - self.mean_) @ self.components_.T)

    def fit_sae_list(self, sae_list: List[Sae]):
        weights = np.concatenate(
            [np.asarray(sae.params["W_dec"]) for sae in sae_list], axis=0
        )
        return self.fit(weights)
