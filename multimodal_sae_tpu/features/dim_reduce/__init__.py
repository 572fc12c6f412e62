"""Dimensionality reduction over SAE decoder directions (reference
features/dim_reduce/): UMAP when `umap-learn` is installed, plus a
dependency-free PCA."""

from .dim_reducer import DimReducer
from .pca import PcaReducer
from .umap import UmapReducer

__all__ = ["DimReducer", "UmapReducer", "PcaReducer"]
