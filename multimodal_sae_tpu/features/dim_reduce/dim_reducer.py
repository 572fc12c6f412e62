"""Dimensionality-reduction base (reference features/dim_reduce/dim_reducer.py:6-33)."""

from __future__ import annotations

from abc import ABC, abstractmethod


class DimReducer(ABC):
    def __init__(self, name: str, n_components: int, **kwargs) -> None:
        super().__init__()
        self.name = name
        self.n_components = n_components

    @abstractmethod
    def fit(self, X, **kwargs):
        raise NotImplementedError

    @abstractmethod
    def transform(self, X, **kwargs):
        raise NotImplementedError

    def fit_transform(self, X, **kwargs):
        self.fit(X, **kwargs)
        return self.transform(X, **kwargs)
