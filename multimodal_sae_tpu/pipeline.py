"""Async interpretation pipeline (reference sae_auto_interp/pipeline.py:8-62).

Hardware-agnostic orchestration: a generator of FeatureRecords is fanned
through pipes (explainers, scorers, postprocessors) under a concurrency
semaphore.  Behavior-identical to the reference: `process_wrapper` wraps a
pipe function with sync pre/post hooks, `Pipe` gathers parallel functions,
`Pipeline.run` walks the generator one buffer at a time.
"""

from __future__ import annotations

import asyncio
from functools import wraps
from typing import Callable


def process_wrapper(function, preprocess=None, postprocess=None):
    @wraps(function)
    async def wrapped(input):
        if preprocess is not None:
            input = preprocess(input)
        result = await function(input)
        if postprocess is not None:
            result = postprocess(result)
        return result

    return wrapped


class Pipe:
    """Parallel fan-out over several async functions, gathered."""

    def __init__(self, *functions: Callable):
        self.functions = functions

    async def __call__(self, input):
        tasks = [function(input) for function in self.functions]
        return await asyncio.gather(*tasks)


class Pipeline:
    def __init__(self, generator, *pipes):
        self.generator = generator
        self.pipes = pipes

    async def loop(self, input, pipes):
        if len(pipes) > 0:
            output = await pipes[0](input)
            return await self.loop(output, pipes[1:])
        return input

    async def run(self, max_processes: int = 100, collate: bool = False):
        sem = asyncio.Semaphore(max_processes)

        async def _process(record):
            async with sem:
                return await self.loop(record, self.pipes)

        for records in self.generator(collate):
            tasks = [asyncio.create_task(_process(record)) for record in records]
            try:
                from tqdm import tqdm

                pbar = tqdm(total=len(tasks), desc="Collected")
            except ImportError:
                pbar = None
            for completed_task in asyncio.as_completed(tasks):
                await completed_task
                if pbar is not None:
                    pbar.update(1)
