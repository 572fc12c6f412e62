"""Small shared utilities.

The reference depends on `natsort` for ordering hookpoints
(reference sae_auto_interp/sae/sae.py:91,99; train/sae/sae/trainer.py:91) and on
torch.distributed rank checks for logging (reference sae_auto_interp/sae/utils.py:13-25).
We implement the tiny pieces we need directly.
"""

from __future__ import annotations

import re
from typing import Iterable, List, TypeVar

T = TypeVar("T")

_NUM_RE = re.compile(r"(\d+)")


def natsort_key(s: str):
    """Natural-sort key: "layers.2" < "layers.10"."""
    return tuple(int(p) if p.isdigit() else p for p in _NUM_RE.split(str(s)))


def natsorted(items: Iterable[T], key=None) -> List[T]:
    """Natural sort (equivalent to `natsort.natsorted` for our usage)."""
    if key is None:
        return sorted(items, key=natsort_key)
    return sorted(items, key=lambda x: natsort_key(key(x)))


def process_index() -> int:
    """This host's index in the multi-host JAX job (0 when single-host)."""
    try:
        import jax

        return jax.process_index()
    except Exception:  # pragma: no cover - jax always importable in this repo
        return 0


def process_count() -> int:
    """Number of hosts in the multi-host JAX job (1 when single-host)."""
    try:
        import jax

        return jax.process_count()
    except Exception:  # pragma: no cover - jax always importable in this repo
        return 1


def rank0_print(*args):
    """Print only on process 0 (reference sae/utils.py:13-18)."""
    if process_index() == 0:
        print(*args)


def rank_print(*args):
    """Print with the process index prefix (reference sae/utils.py:21-25)."""
    idx = process_index()
    print(f"Rank {idx}: ", *args)
