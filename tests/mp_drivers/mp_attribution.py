"""Two-process driver for the attribution CLI merge: runs the REAL
`launch.features.attribution_patching.main` on a tiny fabricated LLaVA
checkpoint with injected skew on rank 1 (sleep before the gather), so the
rank-ordered concat must still reassemble the arange-split feature axis into
ONE `{model}_{sae}.safetensors`.  With the env vars unset this doubles as the
world=1 oracle.  argv: <ckpt_dir> <sae_dir> <probing_json> <save_dir>."""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from multimodal_sae_tpu.parallel import initialize_distributed  # noqa: E402


def main():
    ckpt_dir, sae_dir, probing_json, save_dir = sys.argv[1:5]
    initialize_distributed()
    import jax

    from multimodal_sae_tpu.config import AttributionConfig
    from multimodal_sae_tpu.launch.features import attribution_patching as ap

    if jax.process_index() == 1:
        # Injected skew: rank 1 reaches the gather SECONDS after rank 0 —
        # the merge must wait for (and correctly order) the late shard.
        orig = ap.all_gather_objects

        def late_gather(obj):
            time.sleep(3.0)
            return orig(obj)

        ap.all_gather_objects = late_gather

    ap.main(
        AttributionConfig(
            model=ckpt_dir,
            data_path=probing_json,
            sae_path=sae_dir,
            selected_sae="model.layers.1",
            save_dir=save_dir,
            feature_batch=4,
        )
    )


if __name__ == "__main__":
    main()
