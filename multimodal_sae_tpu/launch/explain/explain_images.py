"""Image feature explanation CLI
(reference launch/explain/explain_images.py:27-143): cached COO splits →
base-image-token pooled top examples with highlight composites →
ImageExplainer over a multimodal endpoint → `{module}.json` append-lists plus
per-feature images/activated_images/masks directories (the layout the CLIP
scorer reads back, reference clip_scorer.py:68-75)."""

from __future__ import annotations

import asyncio
import json
import os
from functools import partial

from ...agents.explainers import ImageExplainer
from ...clients import SRT
from ...features import FeatureDataset
from ...features.constructors import pool_max_activations_windows_image
from ...features.samplers import sample
from ...interp_utils import load_filter
from ...logger import logger
from ...pipeline import Pipeline, process_wrapper
from ..utils import parse_feature_experiment


def main(args):
    from datasets import load_dataset
    from transformers import AutoProcessor

    logger.info("Load dataset")
    tokens = load_dataset(args.experiment.dataset, split=args.experiment.split)
    processor = AutoProcessor.from_pretrained(args.experiment.model)

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
        constructor=partial(
            pool_max_activations_windows_image,
            tokens=tokens,
            cfg=args.feature,
            processor=processor,
        ),
        sampler=partial(sample, cfg=args.experiment),
    )

    os.makedirs(os.path.expanduser(args.experiment.explanation_dir), exist_ok=True)

    logger.info("Setup server")
    client = SRT(
        model="lmms-lab/llava-onevision-qwen2-72b-ov",
        tp=8,
        base_url="http://localhost:12345",
    )

    def explainer_postprocess(result):
        content, reps, result = result
        record = result.record
        images = [train.image for train in record.train]
        masks = [train.mask for train in record.train]
        activated_images = [train.activation_image for train in record.train]
        module_name = record.feature.module_name.replace(".", "_")
        image_output_dir = (
            f"{args.experiment.explanation_dir}/images/{module_name}/{record.feature}"
        )
        os.makedirs(image_output_dir, exist_ok=True)
        output_path = f"{args.experiment.explanation_dir}/{module_name}.json"
        output_file = (
            json.load(open(output_path, "r")) if os.path.exists(output_path) else []
        )
        output_file.append({f"{record.feature}": f"{result.explanation}"})
        with open(output_path, "w") as f:
            json.dump(output_file, f, indent=4, ensure_ascii=False)

        os.makedirs(f"{image_output_dir}/images", exist_ok=True)
        os.makedirs(f"{image_output_dir}/activated_images", exist_ok=True)
        os.makedirs(f"{image_output_dir}/masks", exist_ok=True)
        for idx, (image, activated_image, mask) in enumerate(
            zip(images, activated_images, masks)
        ):
            image.save(f"{image_output_dir}/images/top_{idx}.png")
            activated_image.save(
                f"{image_output_dir}/activated_images/top{idx}_activated.jpg"
            )
            mask.save(f"{image_output_dir}/masks/{idx}_mask.jpg")
        return result

    explainer_pipe = process_wrapper(
        ImageExplainer(client=client, verbose=True),
        postprocess=explainer_postprocess,
    )

    pipeline = Pipeline(loader, explainer_pipe)
    asyncio.run(pipeline.run(max_processes=4))
    client.clean()


if __name__ == "__main__":
    main(parse_feature_experiment())
