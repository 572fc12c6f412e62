"""Explainer base types and file-backed explanation loaders
(reference sae_auto_interp/agents/explainers/explainer.py:12-45)."""

from __future__ import annotations

import asyncio
import json
import os
import random
from abc import ABC, abstractmethod
from typing import NamedTuple

from ...features.features import FeatureRecord


class ExplainerResult(NamedTuple):
    record: FeatureRecord
    """Feature record passed through to scorer."""

    explanation: str
    """Generated explanation for feature."""


class Explainer(ABC):
    @abstractmethod
    def __call__(self, record: FeatureRecord) -> ExplainerResult:
        pass


async def _read(path: str) -> str:
    return await asyncio.to_thread(lambda: open(path).read())


async def explanation_loader(
    record: FeatureRecord, explanation_dir: str
) -> ExplainerResult:
    """Load a previously saved explanation for this feature."""
    explanation = json.loads(await _read(f"{explanation_dir}/{record.feature}.txt"))
    return ExplainerResult(record=record, explanation=explanation)


async def random_explanation_loader(
    record: FeatureRecord, explanation_dir: str
) -> ExplainerResult:
    """Control baseline: a random *other* feature's explanation."""
    explanations = [f for f in os.listdir(explanation_dir) if f.endswith(".txt")]
    own = f"{record.feature}.txt"
    if own in explanations:
        explanations.remove(own)
    pick = random.choice(explanations)
    explanation = json.loads(await _read(f"{explanation_dir}/{pick}"))
    return ExplainerResult(record=record, explanation=explanation)
