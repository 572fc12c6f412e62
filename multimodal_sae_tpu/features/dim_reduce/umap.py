"""UMAP over decoder directions (reference features/dim_reduce/umap.py:12-33).
Requires `umap-learn` (optional); see PcaReducer for a dependency-free
alternative."""

from __future__ import annotations

from typing import List

import numpy as np

from ...sae import Sae
from .dim_reducer import DimReducer


class UmapReducer(DimReducer):
    def __init__(self, name: str, n_components: int, **kwargs) -> None:
        super().__init__(name, n_components, **kwargs)
        from umap import UMAP  # optional dependency

        self.umap = UMAP(n_components=n_components, **kwargs)

    def fit(self, X, **kwargs):
        return self.umap.fit(np.asarray(X), **kwargs)

    def transform(self, X, **kwargs):
        return self.umap.transform(np.asarray(X), **kwargs)

    def fit_sae_list(self, sae_list: List[Sae]):
        """Concatenate W_dec of many SAEs and fit (reference umap.py:25-33)."""
        weights = np.concatenate(
            [np.asarray(sae.params["W_dec"]) for sae in sae_list], axis=0
        )
        return self.fit(weights)
