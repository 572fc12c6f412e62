"""Profiling hooks (SURVEY.md §5: the reference has no tracing at all — tqdm
only).  On TPU, `jax.profiler` traces are nearly free; every long-running
entry point honors MMSAE_PROFILE_DIR to capture one."""

from __future__ import annotations

import os
import time
from contextlib import contextmanager
from typing import Optional

from .misc import rank0_print


@contextmanager
def maybe_trace(name: str, log_dir: Optional[str] = None):
    """Capture a jax profiler trace if `log_dir` (or $MMSAE_PROFILE_DIR) is
    set; otherwise a no-op."""
    log_dir = log_dir or os.environ.get("MMSAE_PROFILE_DIR")
    if not log_dir:
        yield
        return
    import jax

    path = os.path.join(log_dir, name)
    os.makedirs(path, exist_ok=True)
    rank0_print(f"[profile] tracing to {path}")
    jax.profiler.start_trace(path)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
        rank0_print(f"[profile] trace written to {path}")


@contextmanager
def timed(label: str, sink=None):
    """Wall-clock span logging; `sink(label, seconds)` if given, else rank0
    stdout."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if sink is not None:
            sink(label, dt)
        else:
            rank0_print(f"[timing] {label}: {dt:.3f}s")
