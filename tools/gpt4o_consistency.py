#!/usr/bin/env python
"""GPT-4o 0/1 consistency judging of activated images per concept label
(reference tools/gpt4o_consistency.py:13-135): samples up to 100 features per
label, sends the activated images + label, caches results json so reruns
resume."""

import argparse
import asyncio
import json
import os
import sys
from collections import defaultdict
from glob import glob

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from PIL import Image

from multimodal_sae_tpu.clients import OpenAIClient
from multimodal_sae_tpu.interp_utils import load_explanation
from multimodal_sae_tpu.prompt import GPT_CONSISTENCY_PROMPT


def parse_argument():
    parser = argparse.ArgumentParser()
    parser.add_argument("--explanation-dir", type=str)
    parser.add_argument("--label-file", type=str)
    parser.add_argument(
        "--save-path", type=str, help="Result path; doubles as resume cache"
    )
    return parser.parse_args()


def main():
    args = parse_argument()
    explanation = load_explanation(args.explanation_dir)
    with open(args.label_file, "r") as f:
        label_file = json.load(f)

    label_dict = defaultdict(list)
    for feature, label in label_file.items():
        label_dict[label].append(feature)

    # First 100 features per label, fixed sample (reference :86-89).
    sampled_features = []
    for label, features in label_dict.items():
        sampled_features.extend(features[:100])

    if os.path.exists(args.save_path):
        consistency_score = json.load(open(args.save_path, "r"))
    else:
        consistency_score = {}

    client = OpenAIClient(
        model="gpt-4o",
        azure_endpoint=os.getenv("OPENAI_API_ENDPOINT"),
        api_key=os.getenv("OPENAI_API_KEY"),
    )

    save_dir = os.path.dirname(args.save_path)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)

    def _messages(feature):
        image_folder = os.path.join(
            args.explanation_dir, "images", "model_layers_24", feature, "activated_images"
        )
        images = [Image.open(p) for p in glob(os.path.join(image_folder, "*.*"))]
        content = [
            {
                "type": "image_url",
                "image_url": {
                    "url": f"data:image/jpeg;base64,{client.encode_images(im)}"
                },
            }
            for im in images
        ]
        content.append(
            {
                "type": "text",
                "text": GPT_CONSISTENCY_PROMPT.format(label=explanation[feature]),
            }
        )
        return [{"role": "user", "content": content}]

    async def _process():
        sem = asyncio.Semaphore(1)

        async def _generate(feature):
            async with sem:
                try:
                    result = await client.generate(_messages(feature))
                except Exception:
                    result = -1
                return feature, result

        tasks = [
            asyncio.create_task(_generate(feature))
            for feature in sampled_features
            # Also retry features whose previous attempt failed (-1): a
            # transient API burst must not permanently poison the resume
            # cache (the -1 written below keeps mid-run crash progress).
            if consistency_score.get(feature, -1) == -1
        ]
        for completed in asyncio.as_completed(tasks):
            feature, result = await completed
            consistency_score[feature] = result
            # Atomic rewrite (review r5): dumping straight over save_path
            # leaves truncated JSON if the process dies mid-write, and the
            # next run's json.load crashes — breaking the resume this cache
            # exists for.
            tmp = args.save_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump(consistency_score, f, indent=4)
            os.replace(tmp, args.save_path)

    asyncio.run(_process())


if __name__ == "__main__":
    main()
