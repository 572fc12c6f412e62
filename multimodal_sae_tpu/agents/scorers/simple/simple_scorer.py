"""Detection scorer (reference agents/scorers/simple/simple_scorer.py:26-118):
splits train examples into groups of 5, asks the judge LLM for a Python list
of 0-3 rubric scores per group, and silently drops malformed responses."""

from __future__ import annotations

import re
from ast import literal_eval
from typing import List, NamedTuple

from ....features.features import Example, FeatureRecord
from ...utils import highlight, join_activations, normalize_examples
from .prompt import prompt


class SimpleScorerResult(NamedTuple):
    record: FeatureRecord
    """Feature record passed through."""

    scores: List[List[int]]
    """Generated scores per example group."""

    max_activations: List[List[float]]
    """Max activation of each scored example."""


class SimpleScorer:
    name = "Simple"

    def __init__(
        self,
        client,
        tokenizer,
        verbose: bool = False,
        threshold: float = 0.6,
        activations: bool = False,
        **generation_kwargs,
    ):
        self.client = client
        self.tokenizer = tokenizer
        self.verbose = verbose
        self.threshold = threshold
        self.activations = activations
        self.generation_kwargs = generation_kwargs

    async def __call__(self, record: FeatureRecord):
        if self.activations:
            normalize_examples(record, record.train)

        splited_examples = [
            record.train[i : i + 5] for i in range(0, len(record.train), 5)
        ]

        scores_list, messages_list, response_list, max_activation_list = [], [], [], []
        for examples in splited_examples:
            messages = self._build_prompt(examples, record.explanation)
            response = await self.client.generate(messages, **self.generation_kwargs)
            scores = self.parse_scores(response)
            try:
                scores = literal_eval(scores)
                scores_list.append(scores)
                messages_list.append(messages[-1]["content"])
                response_list.append(response)
                max_activation_list.append(
                    [float(example.max_activation) for example in examples]
                )
            except Exception:
                # Malformed judge output; skip the group (reference
                # simple_scorer.py:73-78).
                continue

        result = SimpleScorerResult(
            record=record, scores=scores_list, max_activations=max_activation_list
        )
        if self.verbose:
            return messages_list, response_list, result
        return result

    def parse_scores(self, text: str) -> str:
        try:
            match = re.search(r"\[.*\]", text, re.DOTALL)
            return match.group(0).strip() if match else "Scores could not be parsed."
        except Exception:
            return "Scores could not be parsed."

    def _build_prompt(self, train_examples: List[Example], explanation: str):
        highlighted_examples = []
        for idx, example in enumerate(train_examples):
            highlighted_examples.append(
                highlight(idx, example, self.tokenizer, self.threshold)
            )
            if self.activations:
                highlighted_examples.append(
                    join_activations(example, self.threshold)
                )
        highlighted_examples = "\n".join(highlighted_examples)
        return prompt(examples=highlighted_examples, explanation=explanation)
