"""Two-process x in-process-DP driver: each process owns TWO virtual CPU
devices and runs the REAL `launch.cache.cache.main` with `dp=2` — the
documented composition (docs/DISTRIBUTED.md: process-sharded dataset outside,
GSPMD row-sharding inside).  Rank 1 gets the usual 3-second skew before
save_splits.  argv: <ckpt_dir> <dataset_dir> <sae_dir> <save_dir>."""

import os
import sys
import time

# Must precede any jax import (the parallel package imports jax): give THIS
# process a 2-device virtual platform so dp=2 has chips to shard over.
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from multimodal_sae_tpu.parallel import initialize_distributed  # noqa: E402


def main():
    ckpt_dir, dataset_dir, sae_dir, save_dir = sys.argv[1:5]
    ok = initialize_distributed()
    # World=1 (no coordinator env) is the solo oracle posture.
    assert ok or "NUM_PROCESSES" not in os.environ, "distributed bring-up failed"
    import jax

    from multimodal_sae_tpu.config import CacheConfig
    from multimodal_sae_tpu.features import cache as cache_mod
    from multimodal_sae_tpu.launch.cache import cache as cache_cli

    assert len(jax.local_devices()) >= 2, "driver needs 2 local devices"

    if jax.process_index() == 1:
        orig = cache_mod.FeatureCache.save_splits

        def slow_save_splits(self, *a, **kw):
            time.sleep(3.0)
            return orig(self, *a, **kw)

        cache_mod.FeatureCache.save_splits = slow_save_splits

    cache_cli.main(
        CacheConfig(
            model=ckpt_dir,
            dataset=dataset_dir,
            sae_path=sae_dir,
            save_dir=save_dir,
            batch_size=1,  # dp=2 -> 2 rows/step on the device
            ctx_len=8,
            n_splits=2,
            dp=2,
        )
    )


if __name__ == "__main__":
    main()
