"""Label refiner (reference agents/scorers/segment/label_refiner.py:51-98):
rewrites verbose feature explanations into crisp entity labels suitable for a
zero-shot object detector.  Output contract preserved: replies are parsed
after an "[ANSWER]" marker, and the "Unable to produce descriptions" sentinel
passes through untouched."""

from __future__ import annotations

import asyncio
import json
import os
import re
from typing import Dict

PROMPT = """\
[GUIDELINES]
You are an AI assistant that turns free-form descriptions into short entity labels. Each description may mention one or more entities; rephrase it down to the key entity only. The cases you will meet, with examples, are below — follow them closely.

Always reply with "[ANSWER]" followed by the extracted entity. Thank you!

Case 1: Good Description
The description already names the entity directly.
Examples:

Description: The cell phone.
Output: [ANSWER] The cell phone

Description: The letters on the shipping containers.
Output: [ANSWER] The letters on the shipping containers

Case 2: Description includes additional words
The description wraps the entity in commentary; keep only the entity.
Examples:

Description: The images all display different models of Honda vehicles, suggesting the neuron is activated by the presence of Honda vehicles or the Honda logo.
Output: [ANSWER] Honda vehicles

Description: The neuron seems to be reacting to the word "ORD" on the billboard. It could be part of a larger word or phrase, but the neuron specifically highlights the letters "ORD." This suggests that the neuron might be specialized in recognizing or processing certain words or characters in images.
Output: [ANSWER] The word "ORD"

Case 3: Bad Description
The description carries no usable information.
Examples:

Description: Unable to produce descriptions.
Output: Unable to produce descriptions


[Description]
{description}
"""


class LabelRefiner:
    def __init__(self, client, features: Dict[str, str], concurrency: int = 8):
        """`features` maps feature name -> raw explanation."""
        self.client = client
        self.features = features
        self.concurrency = max(1, concurrency)
        self.refine_features: Dict[str, str] = {}

    async def refine(self):
        sem = asyncio.Semaphore(self.concurrency)

        async def _generate(feature_name, prompt):
            async with sem:
                return feature_name, await self.client.generate(prompt)

        try:
            from tqdm import tqdm

            pbar = tqdm(total=len(self.features), desc="Refined...")
        except ImportError:
            pbar = None
        self.refine_features = {}
        tasks = [
            asyncio.create_task(
                _generate(feature_name, PROMPT.format(description=explanation))
            )
            for feature_name, explanation in self.features.items()
        ]
        for completed_task in asyncio.as_completed(tasks):
            feature_name, refined_result = await completed_task
            if pbar is not None:
                pbar.update(1)
            self.refine_features[feature_name] = self.parse_explanation(refined_result)

    def parse_explanation(self, text: str) -> str:
        try:
            match = re.search(r"\[ANSWER\]\s*(.*)", text, re.DOTALL)
            return (
                match.group(1).strip()
                if match
                else f"Response {text}. Explanation could not be parsed."
            )
        except Exception:
            return f"Response {text}. Explanation could not be parsed."

    def save_result(self, save_path):
        save_dir = os.path.dirname(save_path)
        if save_dir:
            os.makedirs(save_dir, exist_ok=True)
        with open(save_path, "w") as f:
            json.dump(self.refine_features, f, indent=4)
