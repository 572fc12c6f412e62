from .label_refiner import LabelRefiner
from .segment_scorer import RandomSegmentScorer, SegmentScorer

__all__ = ["LabelRefiner", "SegmentScorer", "RandomSegmentScorer"]
