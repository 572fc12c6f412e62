"""Multi-host bring-up.

The reference initializes NCCL process groups from torchrun env vars with an
18,000 s timeout for slow model downloads (reference train/sae/sae/__main__.py:143-153,
launch/cache/cache_image.py:30-31).  The TPU-native equivalent is
`jax.distributed.initialize()` once per host; afterwards `jax.devices()` spans
the slice and a single global mesh covers every chip — all collectives are
compiled into programs, so no further process-group plumbing exists.
"""

from __future__ import annotations

import os
from typing import Optional


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX's multi-host runtime if this looks like a multi-host job.

    Safe to call unconditionally: single-host runs (no coordinator configured
    and no TPU metadata) are a no-op returning False.
    """
    import jax

    # Probe the distributed client WITHOUT touching the backend:
    # jax.process_count() would initialize XLA, after which
    # jax.distributed.initialize() refuses to run.
    from jax._src import distributed as _dist

    if getattr(_dist.global_state, "client", None) is not None:
        return True  # already initialized
    # Function arguments are a deliberate multi-host request; record that
    # BEFORE merging the env-var conveniences (a bare NUM_PROCESSES exported
    # by some unrelated scheduler must not turn a single-host run fatal).
    arg_explicit = (
        coordinator_address is not None
        or num_processes is not None
        or process_id is not None
    )
    coordinator_address = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    if num_processes is None and "NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["NUM_PROCESSES"])
    if process_id is None and "PROCESS_ID" in os.environ:
        process_id = int(os.environ["PROCESS_ID"])
    # "Explicit" = the user configured a multi-host job (function args, a
    # coordinator address, or a TPU slice spanning several workers); failing
    # to bring THAT up must raise — N independent world=1 processes would
    # stomp each other's output files.  A lone TPU_WORKER_HOSTNAMES entry is
    # just single-worker TPU-VM metadata (present even on this tunneled
    # single-chip host): worth an auto-probe, but a probe failure means
    # single-host, not danger.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    explicit = (
        arg_explicit
        or coordinator_address is not None
        or "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
        or len([h for h in hostnames.split(",") if h]) > 1
    )
    if not explicit and not hostnames:
        return False
    try:
        if "cpu" in os.environ.get("JAX_PLATFORMS", "").lower():
            # Cross-process collectives on the CPU backend need gloo (TPU
            # meshes ride ICI/DCN natively); must be set pre-backend-init.
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    except Exception as e:
        if explicit:
            # Continuing single-host after an explicitly configured
            # multi-host init fails would silently degrade the job; fail
            # loudly instead.
            raise RuntimeError(
                "jax.distributed.initialize failed for a configured "
                "multi-host job (coordinator unreachable, or JAX was "
                "already initialized before initialize_distributed); "
                "refusing to continue single-host"
            ) from e
        print(f"jax.distributed auto-probe failed ({e}); continuing single-host")
        return False


# Canonical helpers live in utils.misc (exception-safe: single-host fallback
# when jax is unusable); re-exported here so the parallel package keeps its
# historical import surface without a second implementation to keep in sync.
from ..utils.misc import process_count, process_index  # noqa: E402,F401
