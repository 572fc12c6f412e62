#!/usr/bin/env python
"""FLUX.1-dev text→image generation per refined explanation, pushed as an HF
dataset for the GeneratedClipScorer (behavior of reference
tools/generate_dataset_flux.py:19-54).

External-model dependent (diffusers + an accelerator able to run FLUX.1-dev);
the interface is preserved and the script exits with a clear message when
diffusers is absent."""

import argparse
import json

GEN_SETTINGS = dict(
    height=512,
    width=512,
    guidance_scale=3.5,
    num_inference_steps=30,
    max_sequence_length=512,
)


def generate_images(pipe, explanations, seed: int = 0):
    import torch

    rows = {"feature": [], "image": []}
    for feature_name, label in explanations.items():
        if "Unable to produce descriptions" in label:
            continue
        generator = torch.Generator("cpu").manual_seed(seed)
        image = pipe(label, generator=generator, **GEN_SETTINGS).images[0]
        rows["feature"].append(feature_name)
        rows["image"].append(image)
    return rows


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--refined-explanation", type=str, help="The path of the refined explanation."
    )
    parser.add_argument("--hf-repo-id", type=str, help="The repo id of the hf dataset")
    args = parser.parse_args()

    try:
        import torch
        from diffusers import FluxPipeline
    except ImportError as e:
        raise SystemExit(
            "generate_dataset_flux requires the `diffusers` package and an "
            "accelerator capable of running FLUX.1-dev"
        ) from e

    from datasets import Dataset

    pipe = FluxPipeline.from_pretrained(
        "black-forest-labs/FLUX.1-dev", torch_dtype=torch.bfloat16
    )
    if torch.cuda.is_available():
        pipe = pipe.to("cuda")

    with open(args.refined_explanation, "r") as f:
        explanations = json.load(f)

    rows = generate_images(pipe, explanations)
    Dataset.from_dict(rows).push_to_hub(args.hf_repo_id)


if __name__ == "__main__":
    main()
