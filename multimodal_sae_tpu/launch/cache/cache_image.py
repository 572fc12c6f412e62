"""Image activation caching CLI
(`python -m multimodal_sae_tpu.launch.cache.cache_image <model> <dataset> ...`;
reference launch/cache/cache_image.py:24-104).

Each image is fed through LLaVA-NeXT with the bare "<image>" prompt; the
leading BOS position is dropped before encoding (reference cache.py:402-409).
"""

from __future__ import annotations

from ...config import CacheConfig
from ...features import FeatureImageCache
from ...interp_utils import load_filter, load_saes
from ...logger import logger
from ...parallel import barrier, initialize_distributed, shard_dataset_contiguous
from ...utils.cli import parse_dataclass
from ..utils import load_any_dataset, load_subject_model, shard_info


def main(cfg: CacheConfig):
    initialize_distributed()
    rank, world = shard_info()

    logger.info(f"Load Model : {cfg.model}")
    model, processor, tokenizer = load_subject_model(
        cfg.model, load_in_8bit=cfg.load_in_8bit,
        int8_matmul=cfg.int8_matmul,
        int8_vision=cfg.int8_vision,
        flash_attention=cfg.flash_attention,
        tp=cfg.tp,
        dp=cfg.dp,
        hf_token=cfg.hf_token,
        truncate_layers=cfg.truncate_layers,
    )

    logger.info(f"Load Dataset : {cfg.dataset}")
    dataset = load_any_dataset(cfg.dataset, cfg.split)

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
    tokenizer_ids = tokenizer("<image>", add_special_tokens=True)["input_ids"]

    def capture_fn(batch):
        images = [im.convert("RGB") for im in batch["image"]]
        prompt_ids = [tokenizer_ids for _ in images]
        prepared = model.prepare_inputs(images=images, prompt_ids=prompt_ids)
        return model.capture(prepared, hookpoints)

    device_batch = cfg.batch_size * max(1, cfg.dp)
    if device_batch not in (1, 2, 4):
        # Measured compile hazard (BASELINE.md row 47): at the flagship anyres
        # shape on a 16 GB v5e, image batch 5 fits but compiled for 659 s
        # (vs the usual 27-80 s) and left the remote XLA compile service
        # degraded for subsequent fresh compiles; 6 and 8 OOM outright. B=4
        # is the measured optimum. Warn, don't refuse — other chips/shapes
        # may behave differently.
        logger.warning(
            f"image batch {device_batch} (batch_size x dp) is outside the "
            "validated widths (1, 2, 4): at the flagship anyres shape, B=5 "
            "measured a 659 s compile that degraded the compile service and "
            "B>=6 OOMs a 16 GB chip; B=4 is the measured throughput optimum "
            "(BASELINE.md row 47)"
        )

    cache = FeatureImageCache(
        capture_fn,
        submodule_dict,
        # --dp N feeds the device N x batch_size images per step (see
        # launch/cache/cache.py for the byte-parity rationale).
        batch_size=device_batch,
        shard_size=shard_start,
        filters=filters,
    )
    # Persist split shards incrementally during the run (the buffered
    # partition+write-at-end path costs seconds of dead time at scale).
    cache.enable_streaming(cfg.save_dir, cfg.n_splits, rank=rank)
    logger.info("Start caching activations")
    cache.run(cfg.ctx_len, dataset)

    cache.save_splits(n_splits=cfg.n_splits, save_dir=cfg.save_dir, rank=rank)
    # All ranks' shards must land before the rank-0 merge scans the directory
    # (reference features/cache.py:230 barriers here).
    barrier("cache_save_splits")
    if rank == 0:
        cache.concate_safetensors(n_splits=cfg.n_splits, save_dir=cfg.save_dir)
    barrier("cache_merge_done")


if __name__ == "__main__":
    main(parse_dataclass(CacheConfig))
