"""Regenerate example/activated images for already-explained features
(reference launch/features/image_activations.py:25-100)."""

from __future__ import annotations

import asyncio
import os
from functools import partial

from ...features import FeatureDataset
from ...features.constructors import pool_max_activations_windows_image
from ...features.features import FeatureRecord
from ...features.samplers import sample_with_explanation
from ...interp_utils import load_explanation, load_filter
from ...logger import logger
from ...pipeline import Pipeline
from ..utils import parse_feature_experiment


async def image_saver(record: FeatureRecord, save_dir: str):
    feature_name = f"{record.feature}"
    module_name = record.feature.module_name.replace(".", "_")
    save_dir = os.path.join(save_dir, module_name, feature_name)
    os.makedirs(save_dir, exist_ok=True)
    for idx, example in enumerate(record.examples):
        example.image.save(os.path.join(save_dir, f"examples_{idx}.jpg"))
        example.activation_image.save(
            os.path.join(save_dir, f"activated_examples_{idx}.jpg")
        )


def main(args):
    from datasets import load_dataset
    from transformers import AutoProcessor

    logger.info("Load dataset")
    tokens = load_dataset(args.experiment.dataset, split=args.experiment.split)
    processor = AutoProcessor.from_pretrained(args.experiment.model)

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
        constructor=partial(
            pool_max_activations_windows_image,
            tokens=tokens,
            cfg=args.feature,
            processor=processor,
        ),
        sampler=partial(
            sample_with_explanation, cfg=args.experiment, explanations=explanations
        ),
    )

    save_dir = os.path.join(args.experiment.explanation_dir, "images")
    os.makedirs(save_dir, exist_ok=True)

    saver = partial(image_saver, save_dir=save_dir)
    pipeline = Pipeline(loader, saver)
    asyncio.run(pipeline.run(max_processes=4))


if __name__ == "__main__":
    main(parse_feature_experiment())
