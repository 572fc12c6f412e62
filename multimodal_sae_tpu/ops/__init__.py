from .topk import (
    top_k,
    blockwise_top_k,
    blockmax_top_k,
    kth_value,
    kth_value_bitwise,
    kth_value_histogram,
    sort_pairs_by_index,
)
from .sparse_decode import (
    sparse_decode,
    eager_decode,
    gather_decode,
    topk_mask_decode,
)
from .geometric_median import geometric_median

__all__ = [
    "top_k",
    "kth_value",
    "kth_value_bitwise",
    "kth_value_histogram",
    "blockwise_top_k",
    "blockmax_top_k",
    "sparse_decode",
    "eager_decode",
    "gather_decode",
    "topk_mask_decode",
    "geometric_median",
]
