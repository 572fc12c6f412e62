"""Async interpretation pipeline (behavior of reference
sae_auto_interp/pipeline.py:8-62).

Hardware-agnostic orchestration: a generator of FeatureRecords fans out
through a sequence of pipes (explainers, scorers, postprocessors) under a
concurrency semaphore.  `process_wrapper` adds sync pre/post hooks around an
async pipe function; `Pipe` runs several functions on the same input and
gathers their results; `Pipeline.run` walks the generator one buffer at a
time, scheduling every record as its own task.
"""

from __future__ import annotations

import asyncio
from functools import wraps
from typing import Callable


def process_wrapper(
    function: Callable, preprocess: Callable = None, postprocess: Callable = None
):
    """Wrap an async pipe function with synchronous pre/post hooks."""

    @wraps(function)
    async def wrapped(record):
        value = record if preprocess is None else preprocess(record)
        result = await function(value)
        return result if postprocess is None else postprocess(result)

    return wrapped


class Pipe:
    """Fan one input out to several async functions and gather the results."""

    def __init__(self, *functions: Callable):
        self.functions = functions

    async def __call__(self, record):
        return await asyncio.gather(*(fn(record) for fn in self.functions))


class Pipeline:
    """Chain pipes over a record generator with bounded concurrency."""

    def __init__(self, generator, *pipes):
        self.generator = generator
        self.pipes = pipes

    async def _chain(self, record):
        value = record
        for pipe in self.pipes:
            value = await pipe(value)
        return value

    async def run(self, max_processes: int = 100, collate: bool = False):
        semaphore = asyncio.Semaphore(max_processes)

        async def bounded(record):
            async with semaphore:
                return await self._chain(record)

        source = self.generator(collate)
        # collate=True yields one flat list of records rather than a
        # per-buffer generator of lists; treat it as a single batch.
        buffers = [source] if collate else source
        for records in buffers:
            tasks = [asyncio.create_task(bounded(r)) for r in records]
            progress = _progress_bar(len(tasks))
            for finished in asyncio.as_completed(tasks):
                await finished
                if progress is not None:
                    progress.update(1)


def _progress_bar(total: int):
    try:
        from tqdm import tqdm

        return tqdm(total=total, desc="Collected")
    except ImportError:
        return None
