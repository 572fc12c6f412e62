"""multimodal_sae_tpu — a TPU-native framework for training and interpreting
sparse autoencoders (SAEs) on multimodal language models.

This is a ground-up JAX/XLA/Pallas re-design with the capabilities of the
reference framework (EvolvingLMMs-Lab/multimodal-sae): TopK-SAE training on
frozen LMM activations, large-scale activation caching, feature
auto-interpretation (explainers/scorers over LLM clients), steering, and
attribution patching — all built for TPU hardware: pjit/shard_map over device
meshes, functional capture/intervention instead of forward hooks, and
XLA/Pallas kernels for the hot ops.

Unlike the reference (which ships two near-duplicate `sae` packages, see
reference sae_auto_interp/sae/ vs train/sae/sae/), there is exactly one SAE
core here, consumed by both the trainer and the interpretation pipeline.
"""

__version__ = "0.1.0"

from .config import (
    CacheConfig,
    ExperimentConfig,
    FeatureConfig,
    SaeConfig,
    TrainConfig,
)
from .sae import Sae

__all__ = [
    "Sae",
    "SaeConfig",
    "TrainConfig",
    "CacheConfig",
    "FeatureConfig",
    "ExperimentConfig",
]
