"""Text feature explanation CLI (reference launch/explain/explain.py:23-127):
cached COO splits → max-pooled example windows → SimpleExplainer over an
OpenAI-compatible endpoint → append {feature: explanation, prompt} lists to
`{module}.json`."""

from __future__ import annotations

import asyncio
import json
import os
from functools import partial

from ...agents.explainers import SimpleExplainer
from ...clients import SRT
from ...features import FeatureDataset
from ...features.constructors import pool_max_activation_windows
from ...features.samplers import sample
from ...interp_utils import load_filter
from ...logger import logger
from ...pipeline import Pipeline, process_wrapper
from ...train.data import chunk_and_tokenize
from ..utils import parse_feature_experiment


def main(args):
    from datasets import load_dataset
    from transformers import AutoTokenizer

    logger.info("Load tokenizer and dataset")
    tokenizer = AutoTokenizer.from_pretrained(args.experiment.model)
    tokens = load_dataset(args.experiment.dataset, split=args.experiment.split)

    logger.info(
        f"Chunking dataset into {args.feature.example_ctx_len} tokens per sample..."
    )
    tokens = chunk_and_tokenize(
        tokens, tokenizer, max_seq_len=args.feature.example_ctx_len
    )
    tokens = tokens["input_ids"]

    modules = os.listdir(args.experiment.save_dir)
    filters = (
        load_filter(args.experiment.filters_path)
        if args.experiment.filters_path is not None
        else None
    )
    if filters is not None:
        modules = [mod for mod in modules if mod in filters]
    elif args.experiment.selected_layers:
        modules = [
            mod for idx, mod in enumerate(modules) if idx in args.experiment.selected_layers
        ]
    logger.info(f"Module list : {modules}")

    dataset = FeatureDataset(
        raw_dir=args.experiment.save_dir,
        cfg=args.feature,
        modules=modules,
        features=filters,
    )

    loader = partial(
        dataset.load,
        constructor=partial(pool_max_activation_windows, tokens=tokens, cfg=args.feature),
        sampler=partial(sample, cfg=args.experiment),
    )

    logger.info("Setup server")
    client = SRT(model=args.experiment.explainer, tp=8)

    def explainer_postprocess(result):
        content, reps, result = result
        module_name = result.record.feature.module_name.replace(".", "_")
        output_path = f"{args.experiment.explanation_dir}/{module_name}.json"
        output_file = (
            json.load(open(output_path, "r")) if os.path.exists(output_path) else []
        )
        output_file.append(
            {f"{result.record.feature}": f"{result.explanation}", "prompt": content}
        )
        with open(output_path, "w") as f:
            json.dump(output_file, f, indent=4, ensure_ascii=False)
        return result

    os.makedirs(os.path.expanduser(args.experiment.explanation_dir), exist_ok=True)

    explainer_pipe = process_wrapper(
        SimpleExplainer(client=client, tokenizer=tokenizer, verbose=True, activations=True),
        postprocess=explainer_postprocess,
    )

    pipeline = Pipeline(loader, explainer_pipe)
    asyncio.run(pipeline.run(max_processes=4))
    client.clean()


if __name__ == "__main__":
    main(parse_feature_experiment())
