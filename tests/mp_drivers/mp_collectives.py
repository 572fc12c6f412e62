"""Two-process driver: barrier + object gathers over gloo CPU collectives.

Launched by tests/test_multiprocess.py with COORDINATOR_ADDRESS /
NUM_PROCESSES / PROCESS_ID env vars.  argv: <out_dir>."""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from multimodal_sae_tpu.parallel import (  # noqa: E402
    all_gather_objects,
    barrier,
    gather_objects,
    initialize_distributed,
)


def main():
    out_dir = sys.argv[1]
    assert initialize_distributed(), "distributed bring-up failed"
    import jax

    rank = jax.process_index()
    assert jax.process_count() == int(os.environ["NUM_PROCESSES"])

    barrier("start")

    # Uneven payloads: rank 0 sends a small dict, rank 1 a large list.
    obj = {"rank": rank} if rank == 0 else list(range(10_000))
    everyone = all_gather_objects(obj)
    assert everyone[0] == {"rank": 0}
    assert everyone[1] == list(range(10_000))

    rooted = gather_objects({"r": rank})
    if rank == 0:
        assert rooted == [{"r": 0}, {"r": 1}]
    else:
        assert rooted is None

    # Chunked payload path: shrink the chunk size so a multi-chunk gather
    # (uneven lengths, final partial chunk) runs with real collectives.
    from multimodal_sae_tpu.parallel import collectives

    orig_chunk = collectives._CHUNK_BYTES
    collectives._CHUNK_BYTES = 4096
    try:
        big = bytes(range(256)) * (40 + 13 * rank)  # ~10/13 KB, rank-uneven
        chunked = all_gather_objects({"rank": rank, "blob": big})
        for r, got in enumerate(chunked):
            assert got["rank"] == r
            assert got["blob"] == bytes(range(256)) * (40 + 13 * r)
    finally:
        collectives._CHUNK_BYTES = orig_chunk

    # The attribution merge helper, end to end across processes.
    import numpy as np

    from multimodal_sae_tpu.launch.features.attribution_patching import (
        gather_and_merge,
    )

    local = {"layers.1": np.full((2, 4), rank, dtype=np.float32)}
    merged = gather_and_merge(local)
    if rank == 0:
        expect = np.concatenate(
            [np.zeros((2, 4), np.float32), np.ones((2, 4), np.float32)]
        )
        np.testing.assert_array_equal(merged["layers.1"], expect)
    else:
        assert merged is None

    barrier("end")
    with open(os.path.join(out_dir, f"ok.{rank}"), "w") as f:
        json.dump({"rank": rank}, f)


if __name__ == "__main__":
    main()
