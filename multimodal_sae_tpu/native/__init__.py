from .coo import coo_extract_topk, coo_partition_splits, native_available

__all__ = ["coo_extract_topk", "coo_partition_splits", "native_available"]
