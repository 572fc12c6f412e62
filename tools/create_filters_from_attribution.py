#!/usr/bin/env python
"""Turn attribution safetensors into feature filters + saliency visuals
(reference tools/create_filters_from_attribution.py:16-166): pool the
(feature, seq) attribution map over the image vs text spans, take the top-k
features of each, write `filters_top_{k}_{data}.json`, an HTML heatmap for
text spans, and highlighted-image PNGs for the image span."""

import argparse
import json
import os
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np
from PIL import Image

from multimodal_sae_tpu.features.features import upsample_mask
from multimodal_sae_tpu.interp_utils import get_llava_image_pos


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--filters-path", type=str, default="./filters")
    parser.add_argument("--attribution-path", type=str, default="./attribution_cache")
    parser.add_argument("--top_k", "-k", default=50, type=int)
    parser.add_argument("--pool", default="avg", choices=["max", "avg"])
    parser.add_argument("--image-only", action="store_true", default=False)
    parser.add_argument("--probing-data", type=str)
    parser.add_argument(
        "--tokenizer", type=str, default="llava-hf/llama3-llava-next-8b-hf"
    )
    return parser.parse_args()


def main():
    args = parse_args()
    from safetensors.numpy import load_file
    from transformers import AutoTokenizer

    attribution = load_file(args.attribution_path)
    tokenizer = AutoTokenizer.from_pretrained(args.tokenizer)
    probing_data = json.load(open(args.probing_data, "r"))[0]
    prompt = probing_data["prompt"]
    image = Image.open(probing_data["image"])
    tokens = tokenizer(prompt)["input_ids"][1:]
    tokens_str = [
        tokenizer.convert_tokens_to_string([tokenizer.convert_ids_to_tokens(token)])
        for token in tokens
    ]
    image_token = tokenizer.convert_tokens_to_ids("<image>")
    prev, after = get_llava_image_pos(tokens, image_token)
    completion_tokens = tokens_str[after:]
    # One condition for BOTH the token list and the activation columns: the
    # reference tested the whole prompt for the marker when trimming text_act
    # but only the completion span when trimming the tokens, so a prompt with
    # an <|eot_id|> BEFORE the image (any system turn) desynced the two by 4
    # and the saliency loop below crashed on the last tokens.
    trim_eot = "<|eot_id|>" in completion_tokens
    if trim_eot:
        completion_tokens = completion_tokens[:-4]

    pool = (lambda x: x.mean(axis=1)) if args.pool == "avg" else (lambda x: x.max(axis=1))

    filters_dict = {}
    save_dir = args.attribution_path.rsplit(".", 1)[0]
    os.makedirs(save_dir, exist_ok=True)
    os.makedirs(args.filters_path, exist_ok=True)
    for module_name, attribution_act in attribution.items():
        attribution_act = np.asarray(attribution_act)
        image_act = attribution_act[:, prev:after]
        text_act = attribution_act[:, after:]
        if trim_eot:
            text_act = text_act[:, :-4]

        image_attribution = pool(image_act)
        text_attribution = pool(text_act)
        image_top_k = np.argsort(-image_attribution)[: args.top_k].tolist()
        text_top_k = np.argsort(-text_attribution)[: args.top_k].tolist()

        filters_dict[module_name] = (
            image_top_k if args.image_only else image_top_k + text_top_k
        )

        # text saliency HTML
        activated_html = ""
        for i in text_top_k:
            acts = np.clip(text_act[i, :], 0, None)
            rng = acts.max() - acts.min() + 1e-5
            acts = (acts - acts.min()) / rng
            activated_html += f"<p>feature_{i}: </p>"
            for idx, token in enumerate(completion_tokens):
                c = float(acts[idx])
                color = f"rgb(255, {int(255 * (1 - c))}, {int(255 * (1 - c))})"
                activated_html += (
                    f"<span style='background-color: {color}; opacity: 0.8;'>{token}</span>"
                )
            activated_html += "<br>"
        with open(f"{module_name}_activations.html", "w") as file:
            file.write(activated_html)

        # image saliency PNGs (base 576-token grid)
        for rank, i in enumerate(image_top_k):
            grid = np.clip(attribution_act[i, prev : prev + 576], 0, None).reshape(24, 24)
            mask = upsample_mask(grid, (336, 336))
            background = Image.new("L", (336, 336), 0).convert("RGB")
            composite = Image.composite(
                background, image.resize((336, 336)), mask
            ).convert("RGB")
            composite.save(os.path.join(save_dir, f"top_{rank}_feature_{i}.png"))

    name = f"filters_top_{args.top_k}_{args.probing_data.split('/')[-1].split('.')[0]}.json"
    with open(os.path.join(args.filters_path, name), "w") as f:
        json.dump(filters_dict, f, indent=4)


if __name__ == "__main__":
    main()
