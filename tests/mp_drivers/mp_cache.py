"""Two-process driver for the cache CLI merge race: runs the REAL
`launch.cache.cache.main` on a synthetic subject with an injected skew on
rank 1 (sleep before save_splits).  Without the pre-merge barrier, rank 0
merges before rank 1's shards land and silently drops its rows
(VERDICT r2 §2.7).  argv: <dataset_dir> <sae_dir> <save_dir>."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from multimodal_sae_tpu.parallel import initialize_distributed  # noqa: E402


def main():
    dataset_dir, sae_dir, save_dir = sys.argv[1:4]
    assert initialize_distributed(), "distributed bring-up failed"
    import jax

    rank = jax.process_index()

    from multimodal_sae_tpu.config import CacheConfig
    from multimodal_sae_tpu.features import cache as cache_mod
    from multimodal_sae_tpu.launch.cache import cache as cache_cli

    if rank == 1:
        # Injected skew: rank 1 finalizes its shards SECONDS after rank 0
        # reaches the merge point — the exact race the barrier must close.
        orig = cache_mod.FeatureCache.save_splits

        def slow_save_splits(self, *a, **kw):
            time.sleep(3.0)
            return orig(self, *a, **kw)

        cache_mod.FeatureCache.save_splits = slow_save_splits

    cfg = CacheConfig(
        model="synthetic://32,3,64",
        dataset=dataset_dir,
        sae_path=sae_dir,
        save_dir=save_dir,
        batch_size=2,
        ctx_len=8,
        n_splits=2,
    )
    cache_cli.main(cfg)


if __name__ == "__main__":
    main()
