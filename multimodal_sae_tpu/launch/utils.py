"""Shared launch-script plumbing: subject-model loading (JAX weights + HF
tokenizer/processor from a local checkpoint dir) and dual-dataclass argument
parsing (the reference composes FeatureConfig+ExperimentConfig via
simple_parsing, e.g. reference launch/explain/explain_images.py:138-143)."""

from __future__ import annotations

import argparse
from typing import Optional, Tuple

import jax.numpy as jnp

from ..utils.cli import add_dataclass_args, dataclass_from_namespace


def _is_llava_checkpoint(model_name_or_path: str) -> bool:
    """LLaVA detection.  The reference tests `"llava" in model_name`
    (reference sae_auto_interp/utils.py:70) — fine for hub ids, but a local
    checkpoint path can contain "llava" in an ancestor directory (or a LLaVA
    checkpoint can live in a dir not named llava).  For local dirs, trust the
    checkpoint's own config.json `model_type`; fall back to the name
    heuristic otherwise."""
    import json
    import os

    cfg_file = os.path.join(model_name_or_path, "config.json")
    if os.path.isdir(model_name_or_path) and os.path.isfile(cfg_file):
        with open(cfg_file) as f:
            return "llava" in json.load(f).get("model_type", "")
    return "llava" in model_name_or_path


def load_subject_model(
    model_name_or_path: str,
    dtype=jnp.bfloat16,
    load_in_8bit: bool = False,
    int8_matmul: bool = False,
    int8_vision: bool = False,
    flash_attention: bool = False,
    remat: bool = False,
    tp: int = 0,
    dp: int = 0,
    hf_token: Optional[str] = None,
    truncate_layers: int = 0,
) -> Tuple[object, Optional[object], object]:
    """Load the frozen subject model (reference maybe_load_llava_model,
    sae_auto_interp/utils.py:68-88): LLaVA-NeXT when the checkpoint is one
    (config.json model_type, name substring for hub ids), plain LLaMA
    otherwise.  Returns (model, processor, tokenizer).  `hf_token`
    authenticates the tokenizer/processor fetch for gated hub repos
    (reference passes it to every from_pretrained, utils.py:71-84).

    `load_in_8bit` quantizes the language-model weights to per-channel int8
    with dequant-on-use (models/quant.py) — the TPU equivalent of the
    reference's bitsandbytes 8-bit load (reference __main__.py:66-97),
    halving subject HBM so 8B-scale attribution/training fits one v5e chip.

    `int8_matmul` (implies `load_in_8bit`) additionally runs the quantized
    LANGUAGE-MODEL matmuls as native int8xint8 MXU ops with dynamic
    per-token activation quantization — ~2x the bf16 matmul rate for the
    frozen-subject forward (W8A8 numerics; see models/quant.py qmatmul).

    `int8_vision` extends W8A8 compute to the CLIP tower's matmuls. Off by
    default even under `int8_matmul` because it is a MEASURED regression at
    the tower's d=1024 shapes (2.05x slower than bf16 compute, 75 -> 154 ms
    per 20-crop batch — XLA does not lower these to a profitable int8 MXU
    path the way it does the LM's d=4096 ones; BASELINE.md r4). The tower's
    WEIGHTS are still int8-quantized whenever the LM's are (HBM parity with
    the reference's whole-model Quanto fp8 posture, reference
    launch/utils.py:68-97) — dequant-on-use bf16 compute measures within
    noise of bf16 weights (77.1 vs 75.1 ms).

    `tp > 1` places the subject tensor-parallel over the first `tp` local
    devices (megatron column/row sharding on a `('model',)` mesh,
    parallel/tensor_parallel.py) — the sharding an 8B bf16 subject needs on
    16 GB v5e chips.  The model gains a `.mesh` attribute; co-resident SAEs
    must be replicated onto it (`parallel.replicate_on_mesh`).

    `dp > 1` instead replicates the subject over the first `dp` local devices
    on a ('data',) mesh and shards incoming batches along their row axis
    (parallel/data_parallel.py) — the zero-collective posture for forward-only
    caching when the subject fits one chip (quantized 8B, or smaller models).
    Mutually exclusive with `tp`: cross-process data parallelism over TP
    subjects is the multi-host composition (docs/DISTRIBUTED.md).

    `truncate_layers > 0` keeps only the first N transformer layers of the
    (LLaVA's language model / plain LLaMA) subject resident: hookpoints
    below N are bit-identical to the full model (a layer-K activation is a
    pure function of layers 0..K), and the dropped layers' weights never
    reach HBM (measured r5: layers 25..31 of an int8 8B are 1.5 GB — the
    margin that lets the 131k composed train step fit 16 GB). Capture-only
    flows (training, caching); generation/logit flows need full depth.

    `model_name_or_path` must be a local HF checkpoint directory (this
    environment has no network egress; pre-download checkpoints)."""
    import dataclasses

    if tp and tp > 1 and dp and dp > 1:
        raise ValueError(
            "--tp and --dp are mutually exclusive within one process; "
            "compose them as multi-process data parallelism over TP "
            "subjects (docs/DISTRIBUTED.md)"
        )

    from transformers import AutoTokenizer

    def _merge_flags(text_cfg):
        """OR the runtime flags into the LlamaConfig (idempotent replace —
        one merge shared by the LLaVA and plain-LLaMA branches so a new flag
        can't be threaded through one and forgotten in the other)."""
        return dataclasses.replace(
            text_cfg,
            int8_matmul=int8_matmul or text_cfg.int8_matmul,
            flash_attention=flash_attention or text_cfg.flash_attention,
            remat=remat or text_cfg.remat,
        )

    from ..models.quant import quantize_llama_params

    def _truncate_lm(lm_params: dict, lm_cfg):
        """Drop layers >= truncate_layers BEFORE quantization/stacking, so
        their weights never reach the device."""
        if not truncate_layers or truncate_layers <= 0:
            return lm_params, lm_cfg
        if truncate_layers > lm_cfg.num_hidden_layers:
            raise ValueError(
                f"--truncate_layers {truncate_layers} exceeds the subject's "
                f"{lm_cfg.num_hidden_layers} layers"
            )
        lm_params = dict(lm_params)
        lm_params["layers"] = list(lm_params["layers"][:truncate_layers])
        return lm_params, dataclasses.replace(
            lm_cfg, num_hidden_layers=truncate_layers
        )

    if _is_llava_checkpoint(model_name_or_path):
        from transformers import LlavaNextProcessor

        from ..models.llava_next import LlavaNextModel, load_llava_next

        params, cfg = load_llava_next(model_name_or_path, dtype=dtype)
        if truncate_layers:
            params = dict(params)
            params["language_model"], text_cfg = _truncate_lm(
                params["language_model"], cfg.text_config
            )
            cfg = dataclasses.replace(cfg, text_config=text_cfg)
        if load_in_8bit or int8_matmul:
            from ..models.quant import quantize_clip_params

            # The reference's llava 8-bit path quantizes the whole model
            # (Quanto fp8, reference launch/utils.py:68-97) — quantize the
            # vision tower alongside the language model.
            params = dict(params)
            params["language_model"] = quantize_llama_params(
                params["language_model"]
            )
            params["vision_tower"] = quantize_clip_params(params["vision_tower"])
        cfg = dataclasses.replace(
            cfg,
            text_config=_merge_flags(cfg.text_config),
            vision_config=dataclasses.replace(
                cfg.vision_config,
                int8_matmul=int8_vision or cfg.vision_config.int8_matmul,
            ),
        )
        model = LlavaNextModel(params, cfg)
        processor = LlavaNextProcessor.from_pretrained(
            model_name_or_path, token=hf_token
        )
    else:
        from ..models.hf_loader import load_llama
        from ..models.llama import LlamaModel

        params, cfg = load_llama(model_name_or_path, dtype=dtype)
        params, cfg = _truncate_lm(params, cfg)
        if load_in_8bit or int8_matmul:
            params = quantize_llama_params(params)
        cfg = _merge_flags(cfg)
        model = LlamaModel(params, cfg)
        processor = None
    if tp and tp > 1:
        from ..parallel import shard_subject_model

        model, _ = shard_subject_model(model, tp)
    elif dp and dp > 1:
        from ..parallel import shard_subject_model_dp

        model, _ = shard_subject_model_dp(model, dp)
    tokenizer = AutoTokenizer.from_pretrained(model_name_or_path, token=hf_token)
    model.generation_config = _load_generation_config(model_name_or_path)
    return model, processor, tokenizer


def _load_generation_config(model_name_or_path: str) -> dict:
    """Sampling knobs from the checkpoint's generation_config.json (the
    reference inherits these through HF `generate`, reference
    features/steering.py:72-75). Missing file -> {} (greedy)."""
    import json
    import os

    path = os.path.join(model_name_or_path, "generation_config.json")
    if not os.path.isfile(path):
        return {}
    with open(path) as f:
        raw = json.load(f)
    return {
        k: raw[k]
        for k in ("do_sample", "temperature", "top_p", "eos_token_id")
        if raw.get(k) is not None
    }


def prepare_prompt_batch(
    model,
    processor,
    tokenizer,
    text: Optional[str],
    image=None,
    use_chat_template: bool = True,
    raw_prompt: Optional[str] = None,
):
    """Build the (tok, prompt_ids, batch) triple shared by the probing and
    steering tools (tools/probe_activations.py, tools/model_steering.py):
    chat-template the text (+ optional image) through the processor — the
    tokenizer carries the template for text-only subjects — tokenize, and
    run `prepare_inputs` when an image is present.

    With `use_chat_template=False`, `raw_prompt` is tokenized verbatim."""
    if use_chat_template:
        conversation = [
            {"role": "user", "content": [{"type": "text", "text": text}]}
        ]
        if image is not None:
            conversation[0]["content"].append({"type": "image"})
        templater = processor if processor is not None else tokenizer
        prompt = templater.apply_chat_template(
            conversation, add_generation_prompt=True, tokenize=False
        )
    else:
        prompt = raw_prompt
    tok = getattr(processor, "tokenizer", tokenizer)
    prompt_ids = tok(prompt)["input_ids"]
    if image is not None:
        batch = model.prepare_inputs(images=[image], prompt_ids=[prompt_ids])
    else:
        batch = {"input_ids": [prompt_ids]}
    return tok, prompt_ids, batch


def load_any_dataset(name_or_path: str, split: str = "train"):
    """HF hub dataset, or a local `Dataset.save_to_disk` directory (the
    reference always pulls from the hub; this environment has no egress, so
    launch CLIs accept on-disk datasets too)."""
    import os

    from datasets import Dataset, load_dataset

    if os.path.isdir(name_or_path) and os.path.exists(
        os.path.join(name_or_path, "state.json")
    ):
        return Dataset.load_from_disk(name_or_path)
    return load_dataset(name_or_path, split=split, trust_remote_code=True)


def infer_n_splits(activation_dir: str, module: str) -> int:
    """Count the merged `{start}_{end}.safetensors` splits in a cache's
    module dir — the value every reader must agree on with the writer.
    Lets CLIs default to the cache's actual layout instead of a fixed
    number that silently disagrees with the cache CLI's default."""
    import os as _os
    import re as _re

    d = _os.path.join(activation_dir, module)
    if not _os.path.isdir(d):
        raise FileNotFoundError(
            f"no '{module}' module dir under {activation_dir} — cannot "
            "infer --n-splits; check --selected-layer / the cache path"
        )
    n = len(
        [
            f
            for f in _os.listdir(d)
            if _re.fullmatch(r"\d+_\d+\.safetensors", f)
        ]
    )
    if n == 0:
        raise FileNotFoundError(
            f"no merged '<start>_<end>.safetensors' splits in {d} — was the "
            "cache merged (concate_safetensors)? Unmerged Rank* shards "
            "cannot be scored"
        )
    return n


def validate_hookpoints(model, hookpoints) -> None:
    """Fail fast when a requested hookpoint does not exist on the subject
    (wrong prefix like `layers.24` vs `model.layers.24`, a layer index past
    the model's depth, or a layer dropped by --truncate_layers).  Without
    this, capture simply never returns the module and a full run ends in
    silently-empty shards / an untrained SAE (review r5)."""
    if not hasattr(model, "hookpoint_names"):
        return  # duck-typed test subjects; real models all implement it
    available = set(model.hookpoint_names())
    missing = [h for h in hookpoints if h not in available]
    if missing:
        sample = model.hookpoint_names()
        raise ValueError(
            f"hookpoint(s) {missing} not present on the subject model "
            f"(it exposes {sample[0]} .. {sample[-1]}; "
            f"--truncate_layers drops layers from the top)"
        )


def load_subject_or_synthetic(cfg):
    """`synthetic://dM,L,V` builds the deterministic test model (same scheme
    as the train CLI, __main__.py); anything else is a real checkpoint via
    load_subject_model.  Returns (model, processor, tokenizer)."""
    if cfg.model.startswith("synthetic://"):
        from ..models import SyntheticActivationSource

        return SyntheticActivationSource.from_spec(cfg.model), None, None
    return load_subject_model(
        cfg.model,
        load_in_8bit=cfg.load_in_8bit,
        int8_matmul=cfg.int8_matmul,
        int8_vision=getattr(cfg, "int8_vision", False),
        flash_attention=cfg.flash_attention,
        tp=getattr(cfg, "tp", 0),
        dp=getattr(cfg, "dp", 0),
        hf_token=getattr(cfg, "hf_token", None),
        truncate_layers=getattr(cfg, "truncate_layers", 0),
    )


def parse_feature_experiment(argv=None):
    """Parse FeatureConfig + ExperimentConfig from one flag namespace."""
    from ..config import ExperimentConfig, FeatureConfig

    parser = argparse.ArgumentParser()
    add_dataclass_args(parser, FeatureConfig)
    add_dataclass_args(parser, ExperimentConfig)
    ns = parser.parse_args(argv)

    class Args:
        pass

    args = Args()
    args.feature = dataclass_from_namespace(FeatureConfig, ns)
    args.experiment = dataclass_from_namespace(ExperimentConfig, ns)
    return args


def shard_info():
    """(rank, world) in the single-controller job."""
    import jax

    return jax.process_index(), jax.process_count()


def select_modules(save_dir: str, filters, selected_layers):
    """Module list for a cached-feature run: every module directory under the
    cache, narrowed to the filter keys or the selected layer indices
    (reference launch/explain/explain.py:43-54 and siblings).

    Deviation: the reference indexes `selected_layers` into a raw
    `os.listdir`, whose order is filesystem-enumeration-dependent — the
    same `--selected_layers 0` can process different layers on different
    machines. We natsort so the mapping is stable (layers.5 < layers.10)."""
    import os

    from ..utils import natsorted

    modules = natsorted(os.listdir(save_dir))
    if filters is not None:
        return [m for m in modules if m in filters]
    if selected_layers:
        return [m for i, m in enumerate(modules) if i in selected_layers]
    return modules


def build_feature_loader(args, constructor, sampler=None):
    """FeatureDataset + partial-applied load() for a launch script.

    `constructor` and `sampler` are already-bound callables taking
    (record, buffer_output) / (record). Returns (loader, modules)."""
    from functools import partial

    from ..features import FeatureDataset
    from ..interp_utils import load_filter

    filters = (
        load_filter(args.experiment.filters_path)
        if args.experiment.filters_path is not None
        else None
    )
    modules = select_modules(
        args.experiment.save_dir, filters, args.experiment.selected_layers
    )
    dataset = FeatureDataset(
        raw_dir=args.experiment.save_dir,
        cfg=args.feature,
        modules=modules,
        features=filters,
    )
    loader = partial(dataset.load, constructor=constructor, sampler=sampler)
    return loader, modules
