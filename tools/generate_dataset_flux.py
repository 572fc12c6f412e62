#!/usr/bin/env python
"""FLUX.1-dev text→image generation per refined explanation, pushed as an HF
dataset for the GeneratedClipScorer (reference tools/generate_dataset_flux.py:19-54).

External-model dependent (diffusers + GPU/TPU serving of FLUX); the interface
is kept and the script degrades with a clear error when diffusers is absent.
"""

import argparse
import json


def parse_argument():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--refined-explanation", type=str, help="The path of the refined explanation."
    )
    parser.add_argument("--hf-repo-id", type=str, help="The repo id of the hf dataset")
    return parser.parse_args()


def main():
    args = parse_argument()
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

    explanations = json.load(open(args.refined_explanation, "r"))
    df = {"feature": [], "image": []}
    for feature, explanation in explanations.items():
        if "Unable to produce descriptions" in explanation:
            continue
        image = pipe(
            explanation,
            height=512,
            width=512,
            guidance_scale=3.5,
            num_inference_steps=30,
            max_sequence_length=512,
            generator=torch.Generator("cpu").manual_seed(0),
        ).images[0]
        df["feature"].append(feature)
        df["image"].append(image)

    dataset = Dataset.from_dict(df)
    dataset.push_to_hub(args.hf_repo_id)


if __name__ == "__main__":
    main()
