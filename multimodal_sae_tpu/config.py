"""Configuration dataclasses for the whole framework.

Mirrors the reference's config surface (reference sae_auto_interp/config.py:8-139,
sae_auto_interp/sae/config.py:8-29, train/sae/sae/config.py:8-79) so that CLI
flags, defaults, and persisted `cfg.json` files are interchangeable.  The
reference uses `simple_parsing`; we use a small built-in dataclass→argparse
engine (`multimodal_sae_tpu.utils.cli`) with the same flag names.
"""

from __future__ import annotations

import dataclasses
from dataclasses import dataclass, field
from typing import List, Literal, Optional


@dataclass
class SaeConfig:
    """Configuration of a TopK sparse autoencoder.

    Field-for-field compatible with the reference `SaeConfig`
    (reference sae_auto_interp/sae/config.py:8-29) so that `cfg.json` files in
    released checkpoints (e.g. lmms-lab/llama3-llava-next-8b-hf-sae-131k) load
    unchanged.
    """

    expansion_factor: int = 32
    """Multiple of the input dimension to use as the SAE dimension."""

    normalize_decoder: bool = True
    """Normalize the decoder weights to have unit norm."""

    num_latents: int = 0
    """Number of latents to use. If 0, use `expansion_factor`."""

    k: int = 32
    """Number of nonzero features."""

    multi_topk: bool = False
    """Use Multi-TopK loss."""

    signed: bool = False
    """Legacy-checkpoint compatibility flag (reference sae/config.py:28-29)."""

    def to_dict(self) -> dict:
        return dataclasses.asdict(self)

    @classmethod
    def from_dict(cls, d: dict) -> "SaeConfig":
        """Build from a dict, ignoring unknown keys (forward/backward compat:
        the reference's two SaeConfig copies differ by `signed`/`mm_data`)."""
        names = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in names})

    def num_latents_for(self, d_in: int) -> int:
        return self.num_latents or d_in * self.expansion_factor


@dataclass
class TrainConfig:
    """SAE training configuration (reference train/sae/sae/config.py:29-79)."""

    sae: SaeConfig = field(default_factory=SaeConfig)

    batch_size: int = 8
    """Batch size measured in sequences."""

    grad_acc_steps: int = 1
    """Number of steps over which to accumulate gradients."""

    micro_acc_steps: int = 1
    """Chunk the activations into this number of microbatches for SAE training."""

    lr: Optional[float] = None
    """Base LR. If None, auto-chosen as 2e-4 / sqrt(num_latents / 2**14)
    (reference trainer.py:131)."""

    lr_warmup_steps: int = 1000

    auxk_alpha: float = 0.0
    """Weight of the auxiliary (dead-latent) loss term."""

    adam_8bit: bool = False
    """Store Adam moments in 8-bit blockwise-quantized form (ops/adam8bit.py)
    — the TPU equivalent of the reference's bitsandbytes Adam8bit (reference
    trainer.py:139-147), ~4x less optimizer HBM (4.3 GB -> 1.1 GB at 131k
    width). Explicit opt-in rather than the reference's silent
    import-success autodetect."""

    dead_feature_threshold: int = 10_000_000
    """Number of tokens after which a feature is considered dead."""

    sae_dtype: str = "float32"
    """Parameter dtype for freshly initialized SAEs ("float32" or
    "bfloat16").  bf16 halves SAE + grad-accumulator HBM (4.3 GB -> 2.15 GB
    each at 131k width) — the posture that fits the 131k train step beside
    an 8 GB int8 8B subject on one 16 GB chip.  float32 stays the default,
    matching the reference's torch training dtype.  Ignored on resume
    (checkpoints carry their own dtype)."""

    approx_topk: bool = False
    """Select training top-k via `approx_max_k`'s ~0.95-recall threshold
    instead of the exact wide top-k (ops/sparse_decode.topk_mask_decode).
    Training-only: slightly perturbs WHICH ~k latents fire each step (the
    reference's own training tolerates selection noise — torch.topk ties
    break arbitrarily); never used on the bit-parity caching path."""

    hookpoints: List[str] = field(default_factory=list)
    """List of hookpoints to train SAEs on (supports fnmatch wildcards)."""

    layers: List[int] = field(default_factory=list)
    """List of layer indices to train SAEs on."""

    layer_stride: int = 1
    """Stride between layers to train SAEs on."""

    distribute_modules: bool = False
    """Store a single copy of each SAE per device instead of replicating
    (reference trainer.py:495-538; here: a `module` mesh axis + all_to_all)."""

    save_every: int = 1000
    """Save SAEs every `save_every` optimizer steps."""

    log_to_wandb: bool = True
    run_name: Optional[str] = None
    wandb_log_frequency: int = 1

    mm_data: bool = False
    """Multimodal (image+conversation) training data (reference
    train/sae/sae/config.py:72)."""

    def __post_init__(self):
        assert not (
            self.layers and self.layer_stride != 1
        ), "Cannot specify both `layers` and `layer_stride`."


@dataclass
class RunConfig(TrainConfig):
    """`python -m multimodal_sae_tpu` CLI configuration
    (reference train/sae/sae/__main__.py:25-63)."""

    model: str = field(default="EleutherAI/pythia-160m", metadata={"positional": True})
    """Name or path of the subject model."""

    dataset: str = field(
        default="togethercomputer/RedPajama-Data-1T-Sample",
        metadata={"positional": True},
    )
    """Path to the dataset to use for training."""

    split: str = "train"
    """Dataset split to use for training."""

    ctx_len: int = 2048
    """Context length to use for training."""

    hf_token: Optional[str] = None
    """Huggingface API token for downloading models."""

    load_in_8bit: bool = False
    """Load the subject model in reduced precision."""

    int8_matmul: bool = False
    """Run the int8-quantized frozen subject through native int8 MXU matmuls
    (W8A8; implies load_in_8bit) — ~2x faster subject forward; SAE math is
    unaffected (it trains on the captured hiddens in full precision).
    Language model only; see CacheConfig.int8_vision for the CLIP tower."""

    int8_vision: bool = False
    """Extend W8A8 compute to the CLIP tower (measured 2x slower than bf16
    tower compute at anyres shapes — see CacheConfig.int8_vision)."""

    flash_attention: bool = False
    """Fused flash attention for the frozen-subject forward — removes the
    per-layer (B, H, S, S) f32 score materialization that dominates at
    ctx_len ~2k (models/llama.py LlamaConfig.flash_attention)."""

    tp: int = 0
    """Tensor-parallel degree for the frozen subject: megatron sharding over
    the first N local devices (parallel/tensor_parallel.py) — an 8B bf16
    subject exceeds one 16 GB v5e chip during training too.  Captured
    hiddens are resharded onto the trainer's data mesh on-device
    (train/trainer.py _globalize_hiddens)."""

    dp: int = 0
    """In-process data parallelism for the frozen subject's capture forward:
    replicate it over the first N local devices on a ('data',) mesh and
    row-shard each training batch (parallel/data_parallel.py) — for subjects
    that fit one chip (quantized 8B, or smaller), the zero-collective way to
    use the chips the SAE's own data mesh already spans. Captured hiddens
    reshard onto the trainer's mesh on-device like the TP case. Mutually
    exclusive with `tp` (see CacheConfig.dp)."""

    max_examples: Optional[int] = None
    """Maximum number of examples to use for training."""

    resume: bool = False
    """Whether to try resuming from the checkpoint present at `run_name`."""

    seed: int = 42
    """Random seed for shuffling the dataset."""

    data_preprocessing_num_proc: int = 1
    """Number of processes to use for preprocessing data."""

    truncate_layers: int = 0
    """Keep only the first N transformer layers of the subject resident
    (0 = all).  Training or caching at hookpoint `layers.K` never reads the
    layers above K — their compute is already dead-code-eliminated by the
    capture forward, but their WEIGHTS otherwise still occupy HBM
    (measured r5: the 7 layers above the flagship layers.24 hookpoint are
    1.5 GB of an int8 8B — the difference between the 131k composed train
    step fitting a 16 GB chip and OOMing).  Requires every trained/cached
    hookpoint to be below N; generation/logit flows (steering, attribution)
    need the full depth and must not truncate."""


@dataclass
class ExperimentConfig:
    """Interpretation-experiment configuration
    (reference sae_auto_interp/config.py:8-54)."""

    model: str = "EleutherAI/pythia-160m"
    """Name of the subject model."""

    dataset: str = "togethercomputer/RedPajama-Data-1T-Sample"
    """Path to the dataset."""

    sae_path: Optional[str] = None
    """Path to your trained sae. Should be local."""

    train_type: Literal["top", "random", "quantile"] = "top"
    """Type of sampler to use for training examples."""

    n_examples_train: int = 10
    """Number of examples to sample for training."""

    n_examples_test: int = 7
    """Number of examples to sample for testing."""

    n_quantiles: int = 10
    """Number of quantiles to sample."""

    n_random: int = 5
    """Number of random examples to sample."""

    explainer: str = "meta-llama/Meta-Llama-3.1-405B-Instruct-FP8"
    """The name of the explainer model."""

    explanation_dir: str = "./explanation_dir"
    """Dir to save your explanation result."""

    scores_dir: str = "./scores_dir"
    """Dir to save your scores result."""

    selected_layers: List[int] = field(default_factory=list)

    split: str = "train"
    """Dataset split to use."""

    save_dir: str = "./features_cache"
    """Save dir of previously cached features."""

    filters_path: Optional[str] = None
    """Json file mapping hookpoint -> list of feature indices to keep."""


@dataclass
class FeatureConfig:
    """Cached-feature dataset configuration (reference sae_auto_interp/config.py:57-72)."""

    width: int = 131072
    """Number of features in the autoencoder."""

    example_ctx_len: int = 64
    """Length of each example."""

    min_examples: int = 200
    """Minimum number of examples for a feature to be included."""

    max_examples: int = 10000
    """Maximum number of examples for a feature to be included."""

    n_splits: int = 2
    """Number of splits that features were divided into."""


@dataclass
class CacheConfig:
    """Activation-caching CLI configuration (reference sae_auto_interp/config.py:75-117)."""

    model: str = field(default="EleutherAI/pythia-160m", metadata={"positional": True})
    """Name of the subject model."""

    dataset: str = field(
        default="togethercomputer/RedPajama-Data-1T-Sample",
        metadata={"positional": True},
    )
    """Path to the dataset."""

    sae_path: Optional[str] = None
    """Path to the trained sae, local dir or hub name."""

    batch_size: int = 32
    """Number of sequences to process in a batch."""

    load_in_8bit: bool = False
    """Load the model in reduced precision."""

    int8_matmul: bool = False
    """Run the int8-quantized subject through native int8 MXU matmuls
    (W8A8, ~2x bf16 matmul rate; implies load_in_8bit). Opt-in: activation
    quantization changes numerics, so the bit-stable cache guarantee only
    holds within the same flag setting. Applies to the LANGUAGE MODEL; the
    CLIP tower keeps bf16 compute unless int8_vision is set (int8 compute
    is a measured 2x regression at the tower's d=1024 shapes, BASELINE.md)."""

    int8_vision: bool = False
    """Extend W8A8 int8-MXU compute to the CLIP vision tower's matmuls.
    Measured SLOWER than bf16 tower compute on v5e (2.05x at the anyres
    crop shapes) — exposed for parity probing, not recommended. Tower
    WEIGHTS are int8-quantized whenever load_in_8bit/int8_matmul is set,
    independent of this flag."""

    flash_attention: bool = False
    """Fused flash attention for the subject forward (models/llama.py):
    eager attention materializes ~3 GB of f32 scores per layer at anyres
    sequence lengths. Opt-in: softmax reduction order differs from HF eager
    at the bf16 level, so the fp32 bit-parity guarantee keeps eager."""

    truncate_layers: int = 0
    """Keep only the first N subject transformer layers resident (0 = all).
    Caching at `layers.K` never reads layers above K — truncation frees
    their HBM without changing a single cached byte (activations at K are a
    pure function of layers 0..K; see RunConfig.truncate_layers). Every
    cached hookpoint must be below N."""

    split: str = "train"
    """Dataset split to use."""

    n_splits: int = 2
    """Number of feature-axis splits to divide .safetensors into."""

    ctx_len: int = 2048
    """Context length. Each batch is shape (batch_size, ctx_len)."""

    hf_token: Optional[str] = None
    """Huggingface API token for downloading models."""

    save_dir: str = "./features_cache"
    """Save dir for the cached features."""

    verbosity: str = "INFO"
    """Verbosity level."""

    filters_path: Optional[str] = None
    """Json file mapping hookpoint -> list of feature indices to keep."""

    sae_int8: bool = False
    """Quantize each SAE's encoder to int8 and run the cache step's
    pre-activation matmul on the native int8 MXU path (~2x the bf16 rate on
    the dominant cost; sae/model.py quantize_encoder).  Opt-in: W8A8
    changes numerics (per-token activation quantization; top-k boundary
    ties can flip), so never combine with the fp32 bit-parity posture."""

    tp: int = 0
    """Tensor-parallel degree for the subject model: megatron column/row
    sharding over the first `tp` local devices on a ('model',) mesh
    (parallel/tensor_parallel.py). 0/1 = no sharding. The in-framework
    equivalent of the reference's sglang --tensor-parallel-size
    (reference clients/sglang.py:33-34); required posture for an 8B bf16
    subject on 16 GB v5e chips."""

    dp: int = 0
    """IN-PROCESS data parallelism for the cache: replicate the subject (and
    SAEs) over the first `dp` local devices on a ('data',) mesh and feed the
    device `dp x batch_size` rows per step, batch axis sharded — GSPMD
    partitions every forward along the batch with ZERO collectives
    (parallel/data_parallel.py). The single-process analogue of the
    reference's one-torchrun-rank-per-GPU caching (reference README.md:41-56)
    for the natural one-process-per-host JAX posture; output is byte-identical
    to a single-device run at batch_size = dp x batch_size. Requires the
    subject to fit one chip (quantized 8B, or smaller); mutually exclusive
    with `tp` in one process — compose DP over TP subjects across processes
    instead (docs/DISTRIBUTED.md)."""


@dataclass
class AttributionConfig:
    """Attribution-patching CLI configuration (reference sae_auto_interp/config.py:120-139)."""

    model: str = field(default="EleutherAI/pythia-160m", metadata={"positional": True})
    """Name of the subject model."""

    data_path: str = "./data/digit.json"
    """Path to the probing dataset, a json list of
    {"prompt", "answer", "baseline", "image"} dicts."""

    sae_path: Optional[str] = None
    """Path to the trained sae."""

    selected_sae: str = "layers.24"
    """Name of the selected sae hookpoint."""

    save_dir: str = "./attribution_cache"
    """Save dir for attribution results."""

    int8_matmul: bool = False
    """Native int8 MXU matmuls for the quantized subject (W8A8; implies
    load_in_8bit). Backward uses a straight-through dequantized-weight
    matmul, so attribution gradients still flow to the spliced hiddens.
    Applies to the language model; see CacheConfig.int8_vision."""

    int8_vision: bool = False
    """Extend W8A8 compute to the CLIP tower (measured 2x slower than bf16
    tower compute at anyres shapes — see CacheConfig.int8_vision)."""

    flash_attention: bool = False
    """Fused flash attention for the subject forward/backward — multimodal
    probing prompts run at anyres lengths (~2.3k tokens), where eager
    attention's per-layer f32 score tensors dominate."""

    remat: bool = False
    """Rematerialize decoder layers in the backward pass (jax.checkpoint):
    required for long-prompt attribution on 16 GB chips, where the eager
    attention tape alone exceeds HBM (models/llama.py LlamaConfig.remat)."""

    load_in_8bit: bool = False
    """Int8-quantize the subject model (the TPU analogue of the reference's
    fp8-Quanto backward model, reference utils.py:91-103) — halves subject
    HBM so 8B-scale attribution backward fits one 16 GB chip."""

    tp: int = 0
    """Tensor-parallel degree for the subject model (see CacheConfig.tp)."""

    dp: int = 0
    """In-process data parallelism over the first N local devices: the
    subject + SAE replicate on a ('data',) mesh and each vmapped feature
    chunk is committed P('data') — every chip runs its features' suffix
    fwd+bwd independently (features/patching/attribution.py). Because each
    chip carries only its own features' backward tape, the long-shape
    F=1-per-chip memory boundary becomes F=dp features per step. Mutually
    exclusive with `tp` in one process (see CacheConfig.dp)."""

    feature_batch: int = 0
    """Features attributed per compiled step (vmapped).  0 = auto: 32 for
    short prompts (S < 512; measured best at S=64 — 266 feat/s vs 204 at
    F=8), 1 for long ones (at the real ~2.4k-token multimodal shape the F=2
    backward tape exceeds a 16 GB chip even with the prefix/suffix split;
    BASELINE.md attribution row).  Explicit values are honored, with an
    automatic halve-and-retry on device OOM."""
