#!/usr/bin/env python
"""Concept-taxonomy labeling of refined explanations
(reference tools/label_explanation.py:22-59): scene/object/part/material/
texture/color labels via an LLM."""

import argparse
import asyncio
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_sae_tpu.clients import SRT
from multimodal_sae_tpu.prompt import CONCEPT_LABEL_PROMPT


def parse_argument():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--refined-explanation", type=str, help="The path of the refined explanation."
    )
    parser.add_argument("--save-path", type=str, help="The path to save your labels")
    return parser.parse_args()


def main():
    args = parse_argument()
    client = SRT("meta-llama/Llama-3.1-70B-Instruct", tp=8)
    explanations = json.load(open(args.refined_explanation, "r"))
    labels = {}
    kwargs = {"max_tokens": 16}

    async def _process():
        sem = asyncio.Semaphore(8)

        async def _worker(feature_name, prompt):
            async with sem:
                return feature_name, await client.generate(
                    CONCEPT_LABEL_PROMPT.format(description=prompt), **kwargs
                )

        tasks = [
            asyncio.create_task(_worker(feature_name, prompt))
            for feature_name, prompt in explanations.items()
            if "Unable to produce descriptions" not in prompt
        ]
        for completed_task in asyncio.as_completed(tasks):
            feature_name, result = await completed_task
            labels[feature_name] = result

    asyncio.run(_process())
    client.clean()

    with open(args.save_path, "w") as f:
        json.dump(labels, f, indent=4)


if __name__ == "__main__":
    main()
