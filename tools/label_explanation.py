#!/usr/bin/env python
"""Concept-taxonomy labeling of refined explanations (behavior of reference
tools/label_explanation.py:22-59): an LLM assigns each refined explanation one
of scene/object/part/material/texture/color; the "Unable to produce
descriptions" sentinel rows are skipped."""

import argparse
import asyncio
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_sae_tpu.clients import SRT
from multimodal_sae_tpu.prompt import CONCEPT_LABEL_PROMPT

CONCURRENCY = 8
GEN_KWARGS = {"max_tokens": 16}


async def label_all(client, explanations):
    semaphore = asyncio.Semaphore(CONCURRENCY)

    async def one(name, description):
        async with semaphore:
            reply = await client.generate(
                CONCEPT_LABEL_PROMPT.format(description=description), **GEN_KWARGS
            )
        return name, reply

    labels = {}
    pending = [
        asyncio.create_task(one(name, description))
        for name, description in explanations.items()
        if "Unable to produce descriptions" not in description
    ]
    for done in asyncio.as_completed(pending):
        name, reply = await done
        labels[name] = reply
    return labels


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--refined-explanation", type=str, help="The path of the refined explanation."
    )
    parser.add_argument("--save-path", type=str, help="The path to save your labels")
    parser.add_argument(
        "--base-url",
        type=str,
        default="http://localhost:8000",
        help="OpenAI-compatible endpoint of the labeling LLM",
    )
    args = parser.parse_args()

    with open(args.refined_explanation, "r") as f:
        explanations = json.load(f)

    client = SRT("meta-llama/Llama-3.1-70B-Instruct", tp=8, base_url=args.base_url)
    try:
        labels = asyncio.run(label_all(client, explanations))
    finally:
        client.clean()

    with open(args.save_path, "w") as f:
        json.dump(labels, f, indent=4)


if __name__ == "__main__":
    main()
