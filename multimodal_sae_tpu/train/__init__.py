from .data import MemmapDataset, chunk_and_tokenize, process_mm_data
from .trainer import SaeTrainer

__all__ = ["SaeTrainer", "chunk_and_tokenize", "process_mm_data", "MemmapDataset"]
