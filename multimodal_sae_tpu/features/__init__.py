from .features import (
    Example,
    Feature,
    FeatureRecord,
    ImageExample,
    prepare_examples,
    prepare_image_examples,
    upsample_mask,
)
from .cache import Cache, FeatureCache, FeatureImageCache
from .loader import BufferOutput, FeatureDataset, TensorBuffer

__all__ = [
    "Example",
    "ImageExample",
    "Feature",
    "FeatureRecord",
    "prepare_examples",
    "prepare_image_examples",
    "upsample_mask",
    "Cache",
    "FeatureCache",
    "FeatureImageCache",
    "BufferOutput",
    "TensorBuffer",
    "FeatureDataset",
]
