"""Attribution-patching CLI
(reference launch/features/attribution_patching.py:15-80): grad×activation
attribution for every (or sharded) SAE feature, saved as
`{model}_{sae}.safetensors` maps of (num_features·B, S) saliencies.

Feature-index sharding across processes matches the reference's DDP
arange-chunk; per-rank results are gathered (`parallel.all_gather_objects`,
replacing `dist.all_gather_object`, reference attribution_patching.py:50-60)
and rank 0 saves ONE safetensors file — the format
`tools/create_filters_from_attribution.py` consumes.  The reference's
fp8-quantized backward model (reference utils.py:91-103) maps to
`--load_in_8bit` here: per-channel int8 weights with dequant-on-use
(models/quant.py), halving subject HBM the same way."""

from __future__ import annotations

import os

import numpy as np

from ...config import AttributionConfig
from ...features.patching import Attribution
from ...logger import logger
from ...parallel import all_gather_objects, initialize_distributed
from ...utils.cli import parse_dataclass
from ..utils import load_subject_model, shard_info


def gather_and_merge(local: dict):
    """Rank-ordered gather reassembling the arange-split feature axis: each
    rank contributes {key: (n_local_features*B, S)}; rank 0 gets the
    concatenation in rank order (= global feature order) and everyone else
    gets None (reference all_gather_object merge + rank-0 save,
    reference launch/features/attribution_patching.py:50-75)."""
    import jax

    per_rank = all_gather_objects(local)
    if jax.process_index() != 0:
        return None
    merged = {}
    for part in per_rank:
        for key, arr in part.items():
            merged[key] = (
                arr
                if key not in merged
                else np.concatenate([merged[key], arr], axis=0)
            )
    return merged


def main(cfg: AttributionConfig):
    initialize_distributed()
    rank, world = shard_info()

    logger.info(f"Using model {cfg.model}")
    logger.info(f"Using sae {cfg.sae_path}")
    logger.info(f"Selecting sae layer {cfg.selected_sae}")

    import jax.numpy as jnp

    model, processor, tokenizer = load_subject_model(
        cfg.model,
        dtype=jnp.bfloat16,
        load_in_8bit=cfg.load_in_8bit,
        int8_matmul=cfg.int8_matmul,
        int8_vision=cfg.int8_vision,
        flash_attention=cfg.flash_attention,
        remat=cfg.remat,
        tp=cfg.tp,
        dp=cfg.dp,
    )
    attribution = Attribution(
        model,
        tokenizer,
        sae_path=cfg.sae_path,
        data_path=cfg.data_path,
        selected_sae=cfg.selected_sae,
        feature_batch=cfg.feature_batch,
    )
    from ..utils import validate_hookpoints

    # --selected_sae names the splice hookpoint; one the subject doesn't
    # expose must fail here, not deep inside suffix_params/capture
    # (review r5 silent-failure class).
    validate_hookpoints(model, list(attribution.sae_dict))
    from ...parallel import replicate_saes

    replicate_saes(model, attribution.sae_dict.values())

    saes = list(attribution.sae_dict.values())
    k = saes[0].cfg.num_latents_for(saes[0].d_in)
    indices = np.array_split(np.arange(k), world)[rank]

    attribution_dict = attribution.get_attribution(indices)

    logger.info("Save results")
    from safetensors.numpy import save_file

    local = {
        key: np.concatenate(v, axis=0) for key, v in attribution_dict.items()
    }
    merged = gather_and_merge(local)
    if merged is None:
        return
    os.makedirs(cfg.save_dir, exist_ok=True)
    output_file = os.path.join(
        cfg.save_dir,
        f"{cfg.model.split('/')[-1]}_{cfg.selected_sae.replace('.', '_')}.safetensors",
    )
    logger.info(output_file)
    save_file(merged, output_file)


if __name__ == "__main__":
    main(parse_dataclass(AttributionConfig))
