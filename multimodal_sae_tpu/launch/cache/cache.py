"""Text activation caching CLI
(`python -m multimodal_sae_tpu.launch.cache.cache <model> <dataset> ...`;
reference launch/cache/cache.py:19-103).

Single-controller replacement for the reference's torchrun DDP bring-up: the
dataset is contiguously sharded over processes with directly computed global
row offsets (no all-gathered shard lengths), the frozen model forward runs on
the local mesh, and process 0 merges the per-process shard files."""

from __future__ import annotations

from ...config import CacheConfig
from ...features import FeatureCache
from ...interp_utils import load_filter, load_saes
from ...logger import logger
from ...parallel import barrier, initialize_distributed, shard_dataset_contiguous
from ...train.data import chunk_and_tokenize
from ...utils.cli import parse_dataclass
from ..utils import load_any_dataset, load_subject_or_synthetic, shard_info


def main(cfg: CacheConfig):
    initialize_distributed()
    rank, world = shard_info()

    logger.info(f"Load Model : {cfg.model}")
    model, _, tokenizer = load_subject_or_synthetic(cfg)

    logger.info(f"Load Dataset : {cfg.dataset}")
    dataset = load_any_dataset(cfg.dataset, cfg.split)

    if "input_ids" not in dataset.column_names:
        assert tokenizer is not None, "synthetic model needs a tokenized dataset"
        dataset = chunk_and_tokenize(dataset, tokenizer, max_seq_len=cfg.ctx_len)

    filters = load_filter(cfg.filters_path) if cfg.filters_path is not None else None

    dataset, shard_start = shard_dataset_contiguous(dataset, world, rank)

    logger.info(f"Load many sae from : {cfg.sae_path}")
    submodule_dict = load_saes(
        cfg.sae_path, filters=filters, int8_encoder=cfg.sae_int8
    )
    logger.info(f"Select {submodule_dict.keys()}")
    from ...parallel import replicate_saes

    replicate_saes(model, submodule_dict.values())

    hookpoints = list(submodule_dict.keys())
    from ..utils import validate_hookpoints

    validate_hookpoints(model, hookpoints)

    def capture_fn(batch):
        return model.capture(batch, hookpoints)

    cache = FeatureCache(
        capture_fn,
        submodule_dict,
        # --dp N feeds the device N x batch_size rows per step (each chip
        # computes batch_size of them); the drop-last boundary and global row
        # offsets then match a single-device run at that batch size, so the
        # merged cache is byte-identical (tests/test_launch_integration.py).
        batch_size=cfg.batch_size * max(1, cfg.dp),
        shard_size=shard_start,
        filters=filters,
    )
    # Persist split shards incrementally during the run (the buffered
    # partition+write-at-end path costs seconds of dead time at scale).
    cache.enable_streaming(cfg.save_dir, cfg.n_splits, rank=rank)
    logger.info("Start caching activations")
    cache.run(cfg.ctx_len, dataset)

    cache.save_splits(n_splits=cfg.n_splits, save_dir=cfg.save_dir, rank=rank)
    # Every rank's Rank{r}_* shards must exist before the rank-0 merge scans
    # the directory, or late ranks' rows are silently dropped (the reference
    # barriers here too, reference features/cache.py:230).
    barrier("cache_save_splits")
    if rank == 0:
        cache.concate_safetensors(n_splits=cfg.n_splits, save_dir=cfg.save_dir)
    # Hold non-zero ranks until the merge lands: exiting early tears down the
    # coordinator under rank 0, and downstream steps must see merged files.
    barrier("cache_merge_done")


if __name__ == "__main__":
    main(parse_dataclass(CacheConfig))
