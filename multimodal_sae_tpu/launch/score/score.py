"""Text detection scoring CLI (reference launch/score/score.py:26-142):
sampled examples + saved explanations → SimpleScorer (threshold 0.5,
activations on) → per-feature `{scores_dir}/{module}/{feature}.json` with
{examples, scores, max_activations} rows."""

from __future__ import annotations

import asyncio
import json
import os
from functools import partial

from ...agents.scorers import SimpleScorer
from ...clients import SRT
from ...features import FeatureDataset
from ...features.constructors import pool_max_activation_windows
from ...features.samplers import sample_with_explanation
from ...interp_utils import load_explanation, load_filter
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
    if args.experiment.selected_layers:
        modules = [
            mod for idx, mod in enumerate(modules) if idx in args.experiment.selected_layers
        ]
    filters = (
        load_filter(args.experiment.filters_path)
        if args.experiment.filters_path is not None
        else None
    )
    logger.info(f"Module list : {modules}")

    dataset = FeatureDataset(
        raw_dir=args.experiment.save_dir,
        cfg=args.feature,
        modules=modules,
        features=filters,
    )

    explanations = load_explanation(args.experiment.explanation_dir)

    loader = partial(
        dataset.load,
        constructor=partial(pool_max_activation_windows, tokens=tokens, cfg=args.feature),
        sampler=partial(
            sample_with_explanation, cfg=args.experiment, explanations=explanations
        ),
    )

    logger.info("Setup server")
    client = SRT(model="meta-llama/Meta-Llama-3.1-70B-Instruct", tp=8)

    def scorer_postprocess(result):
        messages_list, resps_list, result = result
        module_name = result.record.feature.module_name.replace(".", "_")
        output_path = (
            f"{args.experiment.scores_dir}/{module_name}/{result.record.feature}.json"
        )
        os.makedirs(
            os.path.expanduser(f"{args.experiment.scores_dir}/{module_name}"),
            exist_ok=True,
        )
        result_data = [
            {
                "examples": messages,
                "scores": result.scores[idx],
                "max_activations": result.max_activations[idx],
            }
            for idx, messages in enumerate(messages_list)
        ]
        with open(output_path, "w") as f:
            json.dump(result_data, f, indent=4)
        return result

    os.makedirs(os.path.expanduser(args.experiment.scores_dir), exist_ok=True)

    scorer_pipe = process_wrapper(
        SimpleScorer(
            client=client,
            tokenizer=tokenizer,
            verbose=True,
            threshold=0.5,
            activations=True,
        ),
        postprocess=scorer_postprocess,
    )

    pipeline = Pipeline(loader, scorer_pipe)
    asyncio.run(pipeline.run(max_processes=4))
    client.clean()


if __name__ == "__main__":
    main(parse_feature_experiment())
