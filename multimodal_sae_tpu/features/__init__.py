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
from .constructors import (
    default_constructor,
    pool_max_activation_windows,
    pool_max_activations_windows_image,
    random_activation_windows,
    random_activations_image,
)
from .samplers import SkipRecord, sample, sample_with_explanation

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
    "default_constructor",
    "pool_max_activation_windows",
    "pool_max_activations_windows_image",
    "random_activation_windows",
    "random_activations_image",
    "sample",
    "sample_with_explanation",
]


def __getattr__(name):
    # Lazy to avoid importing jax-heavy modules for host-only consumers.
    if name == "SteeringController":
        from .steering import SteeringController

        return SteeringController
    if name == "Attribution":
        from .patching import Attribution

        return Attribution
    raise AttributeError(name)
