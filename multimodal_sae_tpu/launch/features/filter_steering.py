"""Steering-effect labeling CLI
(reference launch/features/filter_steering.py:29-64): an LLM labels each
steering result 1-4 via the steering-filter rubric, updating the json in
place."""

from __future__ import annotations

import argparse
import asyncio
import json

from ...clients import SRT
from ...interp_utils import load_explanation
from ...prompt import STEERING_FILTER_PROMPT


def parse_argument():
    parser = argparse.ArgumentParser()
    parser.add_argument("--explanation-dir", "-e", type=str)
    parser.add_argument("--steering-path", "-s", type=str)
    return parser.parse_args()


def main():
    args = parse_argument()

    explanations = load_explanation(args.explanation_dir)
    steering_result = json.load(open(args.steering_path, "r"))
    explanations = {k: v for k, v in explanations.items() if k in steering_result}
    for k, v in explanations.items():
        steering_result[k]["explanation"] = v
    client = SRT(model="meta-llama/Llama-3.1-70B-Instruct", tp=8)

    async def run():
        sem = asyncio.Semaphore(8)

        async def _process(prompt, key):
            async with sem:
                return key, await client.generate(prompt)

        tasks = []
        for k in steering_result.keys():
            prompt = STEERING_FILTER_PROMPT.format(
                label=steering_result[k].get("explanation", ""),
                original=steering_result[k]["original_resps"],
                steered=steering_result[k]["clamped_resps"],
            )
            tasks.append(asyncio.create_task(_process(prompt, k)))

        for completed_task in asyncio.as_completed(tasks):
            feature_name, result = await completed_task
            steering_result[feature_name]["category"] = result

    asyncio.run(run())
    with open(args.steering_path, "w", encoding="utf-8") as f:
        json.dump(steering_result, f, indent=4, ensure_ascii=False)
    client.clean()


if __name__ == "__main__":
    main()
