from .simple.simple_scorer import SimpleScorer, SimpleScorerResult
from .segment.segment_scorer import RandomSegmentScorer, SegmentScorer
from .segment.label_refiner import LabelRefiner
from .clip.clip_scorer import ClipScorer, GeneratedClipScorer

__all__ = [
    "SimpleScorer",
    "SimpleScorerResult",
    "SegmentScorer",
    "RandomSegmentScorer",
    "LabelRefiner",
    "ClipScorer",
    "GeneratedClipScorer",
]
