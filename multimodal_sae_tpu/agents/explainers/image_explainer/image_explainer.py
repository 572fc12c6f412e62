"""Image feature explainer
(reference agents/explainers/image_explainer/image_explainer.py:16-66):
base64-encodes the top activation-highlight images, prompts a multimodal
explainer LLM, and parses the `[EXPLANATION]:` line."""

from __future__ import annotations

import re

from ....clients.client import encode_image_base64
from ....features import FeatureRecord
from ..explainer import Explainer, ExplainerResult
from .prompts import build_prompt


class ImageExplainer(Explainer):
    name = "Simple"

    def __init__(self, client, verbose: bool = False, **generation_kwargs):
        self.client = client
        self.verbose = verbose
        self.generation_kwargs = generation_kwargs

    async def __call__(self, record: FeatureRecord):
        images = [train.activation_image for train in record.train]
        encoded_images = [self.encode_images(image) for image in images]
        messages = build_prompt(encoded_images)
        response = await self.client.generate(messages, **self.generation_kwargs)

        explanation = self.parse_explanation(response)

        if self.verbose:
            return (
                messages[-1]["content"],
                response,
                ExplainerResult(record=record, explanation=explanation),
            )
        return ExplainerResult(record=record, explanation=explanation)

    def parse_explanation(self, text: str) -> str:
        try:
            match = re.search(r"\[EXPLANATION\]:\s*(.*)", text, re.DOTALL)
            return (
                match.group(1).strip()
                if match
                else f"Response {text}. Explanation could not be parsed."
            )
        except Exception:
            return f"Response {text}. Explanation could not be parsed."

    def encode_images(self, image):
        return encode_image_base64(image)
