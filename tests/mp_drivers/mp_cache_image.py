"""Two-process driver for the IMAGE cache CLI merge: runs the REAL
`launch.cache.cache_image.main` on a tiny fabricated LLaVA checkpoint with
an injected skew on rank 1 (sleep before save_splits), exercising the
anyres image path (BOS drop, streaming shards) under the same merge race
mp_cache.py covers for text.  argv: <ckpt_dir> <dataset_dir> <sae_dir>
<save_dir>."""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from multimodal_sae_tpu.parallel import initialize_distributed  # noqa: E402


def main():
    ckpt_dir, dataset_dir, sae_dir, save_dir = sys.argv[1:5]
    ok = initialize_distributed()
    # World=1 (no coordinator env) is a valid oracle run, like the sibling
    # drivers; only a CONFIGURED multi-process job may fail bring-up.
    assert ok or "NUM_PROCESSES" not in os.environ, "distributed bring-up failed"
    import jax

    from multimodal_sae_tpu.config import CacheConfig
    from multimodal_sae_tpu.features import cache as cache_mod
    from multimodal_sae_tpu.launch.cache import cache_image as cache_image_cli

    if jax.process_index() == 1:
        orig = cache_mod.FeatureCache.save_splits

        def slow_save_splits(self, *a, **kw):
            time.sleep(3.0)
            return orig(self, *a, **kw)

        cache_mod.FeatureCache.save_splits = slow_save_splits

    cache_image_cli.main(
        CacheConfig(
            model=ckpt_dir,
            dataset=dataset_dir,
            sae_path=sae_dir,
            save_dir=save_dir,
            batch_size=2,
            ctx_len=64,
            n_splits=2,
        )
    )


if __name__ == "__main__":
    main()
