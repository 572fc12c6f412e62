#!/usr/bin/env python
"""Probe which features activate on one input
(reference tools/probe_activations.py:13-176): top-k mean-activated features,
per-feature highlight PNGs, and a filters.json for downstream runs."""

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from multimodal_sae_tpu.features.features import upsample_mask
from multimodal_sae_tpu.interp_utils import load_single_sae
from multimodal_sae_tpu.launch.utils import load_subject_model, prepare_prompt_batch


def parse_argument():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--model", "-m", type=str, default="llava-hf/llama3-llava-next-8b-hf"
    )
    parser.add_argument("--sae-path", type=str)
    parser.add_argument("--module-name", type=str, default="model.layers.24")
    parser.add_argument("--image-path", "-i", type=str, default=None)
    parser.add_argument("--text", "-t", type=str, default=None)
    parser.add_argument("--top-k", "-k", type=int, default=10)
    parser.add_argument(
        "--interval",
        type=str,
        default=None,
        help="e.g. 1-10 probes features ranked 1..10",
    )
    parser.add_argument("--save-to", "-s", type=str, default="./results/probe_activations")
    return parser.parse_args()


def main():
    args = parse_argument()
    sae = load_single_sae(args.sae_path, args.module_name)
    model, processor, tokenizer = load_subject_model(args.model)

    from PIL import Image

    image = Image.open(args.image_path) if args.image_path is not None else None
    text = args.text
    assert image is not None or text is not None, "Image and text can not both be None"
    interval = (
        [int(i) for i in args.interval.split("-")] if args.interval else [0, args.top_k]
    )

    tok, _, batch = prepare_prompt_batch(
        model,
        processor,
        tokenizer,
        text,
        image,
        use_chat_template=text is not None,
        raw_prompt="<image>",
    )

    hiddens = model.capture(batch, [args.module_name])[args.module_name]
    latents = np.asarray(sae.pre_acts(hiddens))
    # Skip the leading BOS for image-only llama inputs
    # (reference probe_activations.py:119-121).
    if text is None and "llama" in getattr(tok, "name_or_path", ""):
        latents = latents[:, 1:, :]

    mean_acts = latents[0].mean(axis=0)
    topk_indices = np.argsort(-mean_acts)[: interval[1]][interval[0]:]
    topk_acts = latents[0][:, topk_indices].T  # (k, seq)

    os.makedirs(args.save_to, exist_ok=True)
    filters = {args.module_name: topk_indices.tolist()}

    if image is not None:
        base_img_tokens, patch_size, image_size = 576, 24, 336
        base_image_activations = [
            acts[:base_img_tokens].reshape(patch_size, patch_size) for acts in topk_acts
        ]
        upsampled = [
            upsample_mask(acts, (image_size, image_size))
            for acts in base_image_activations
        ]
        background = Image.new("L", (image_size, image_size), 0).convert("RGB")
        resized = image.resize((image_size, image_size))
        activation_images = [
            Image.composite(background, resized, mask).convert("RGB")
            for mask in upsampled
        ]
        image_dir = os.path.join(args.save_to, "images")
        os.makedirs(image_dir, exist_ok=True)
        for idx, im in zip(topk_indices, activation_images):
            im.save(os.path.join(image_dir, f"feat_{idx}.png"))

    with open(os.path.join(args.save_to, "filters.json"), "w") as f:
        json.dump(filters, f)


if __name__ == "__main__":
    main()
