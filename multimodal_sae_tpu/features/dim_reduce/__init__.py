from .dim_reducer import DimReducer
from .umap import UmapReducer
from .pca import PcaReducer

__all__ = ["DimReducer", "UmapReducer", "PcaReducer"]
