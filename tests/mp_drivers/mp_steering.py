"""Two-process driver for the steering CLI merge: runs the REAL
`launch.features.steering.main` (argv-parsed) on a tiny fabricated text-only
checkpoint whose tokenizer carries a chat template, with injected skew on
rank 1 before the gather.  The per-rank result dicts (disjoint feature keys
from the array_split shard) must union into ONE `{module}.json` on rank 0.
With the env vars unset this doubles as the world=1 oracle.
argv: <ckpt_dir> <sae_dir> <filters_json> <save_dir>."""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from multimodal_sae_tpu.parallel import initialize_distributed  # noqa: E402


def main():
    ckpt_dir, sae_dir, filters_json, save_dir = sys.argv[1:5]
    initialize_distributed()
    import jax

    from multimodal_sae_tpu.launch.features import steering as steering_cli

    if jax.process_index() == 1:
        orig = steering_cli.gather_objects

        def late_gather(obj):
            time.sleep(3.0)
            return orig(obj)

        steering_cli.gather_objects = late_gather

    sys.argv = [
        "steering",
        "--model", ckpt_dir,
        "--text", "1 2 3",
        "--sae-path", sae_dir,
        "--filters", filters_json,
        "--save-dir", save_dir,
        "--feature-batch-size", "2",
        "--max-new-tokens", "4",
        "--dtype", "float32",
    ]
    steering_cli.main()


if __name__ == "__main__":
    main()
