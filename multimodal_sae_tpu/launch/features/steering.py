"""Large-scale steering CLI (reference launch/features/steering.py:53-113):
every filtered feature gets a clamped generation; feature lists are split
across processes (the reference's DDP tensor_split) and per-rank result
dicts are gathered so process 0 writes ONE merged `{module}.json`
(reference gather_object + rank-0 save, launch steering.py:92-106).
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

from ...features.steering import SteeringController
from ...interp_utils import load_filter, load_saes
from ...parallel import gather_objects, initialize_distributed
from ..utils import load_subject_model, shard_info


def parse_argument():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--model",
        "-m",
        type=str,
        default="llava-hf/llama3-llava-next-8b-hf",
        help="The model name of your trained model",
    )
    parser.add_argument("--image-path", "-i", type=str, default=None)
    parser.add_argument("--text", "-t", type=str, required=True, help="The prompt text")
    parser.add_argument(
        "--sae-path", type=str, required=True, help="SAE path, hub or local"
    )
    parser.add_argument(
        "--filters",
        type=str,
        required=True,
        help="The filters json path (which features to steer)",
    )
    parser.add_argument("--clamp-value", "-k", type=float, default=50)
    parser.add_argument("--save-dir", "-s", default="./results/steering")
    parser.add_argument(
        "--feature-batch-size",
        type=int,
        default=64,
        help="Features steered per generate call: the shared prompt lets "
        "features ride the batch axis of the jitted generate loop (F "
        "generations -> 1), unlike the reference's sequential per-feature "
        "loop (reference launch/features/steering.py:71-78). Batched rows "
        "compute the same math as sequential ones, but floating-point "
        "reduction order varies with batch shape, so a long greedy horizon "
        "can diverge after a near-tie argmax (standard batched-inference "
        "numerics; the reference's HF batching behaves the same) — set 1 "
        "for exactly-sequential behavior.",
    )
    parser.add_argument("--max-new-tokens", type=int, default=512)
    parser.add_argument(
        "--sampling",
        choices=["auto", "greedy", "sample"],
        default="auto",
        help="auto: honor the checkpoint's generation_config.json (HF "
        "generate semantics, reference features/steering.py:72-75); "
        "greedy: force argmax decoding; sample: force sampling with the "
        "config's (or default) temperature/top_p.",
    )
    parser.add_argument("--seed", type=int, default=0, help="Sampling PRNG seed")
    parser.add_argument(
        "--dtype",
        choices=["bfloat16", "float32", "float16"],
        default="bfloat16",
        help="Subject model dtype",
    )
    parser.add_argument(
        "--load-in-8bit",
        action="store_true",
        help="Int8-quantize the frozen subject (halves HBM; models/quant.py)",
    )
    parser.add_argument(
        "--int8-matmul",
        action="store_true",
        help="Native int8 MXU matmuls for the quantized subject's language "
        "model (W8A8, ~2x bf16 rate; implies --load-in-8bit)",
    )
    parser.add_argument(
        "--int8-vision",
        action="store_true",
        help="Extend W8A8 compute to the CLIP tower (measured 2x SLOWER "
        "than bf16 tower compute at anyres shapes; parity probing only)",
    )
    parser.add_argument(
        "--tp",
        type=int,
        default=0,
        help="Tensor-parallel degree for the subject model: megatron "
        "sharding over the first N local devices (parallel/tensor_parallel.py)",
    )
    parser.add_argument(
        "--dp",
        type=int,
        default=0,
        help="In-process data parallelism over the first N local devices: "
        "the steered feature batch rides the generate batch axis row-sharded "
        "over a ('data',) mesh — each chip decodes its features' rows "
        "(parallel/data_parallel.py; mutually exclusive with --tp)",
    )
    return parser.parse_args()


def main():
    args = parse_argument()
    initialize_distributed()
    rank, world = shard_info()

    import jax.numpy as jnp

    model, processor, tokenizer = load_subject_model(
        args.model,
        dtype=getattr(jnp, args.dtype),
        load_in_8bit=args.load_in_8bit,
        int8_matmul=args.int8_matmul,
        int8_vision=args.int8_vision,
        tp=args.tp,
        dp=args.dp,
    )
    if processor is None:  # text-only subject model
        processor = tokenizer
    filters = load_filter(args.filters)
    sae_dict = load_saes(args.sae_path, filters)
    from ..utils import validate_hookpoints

    # A module name the subject doesn't expose would silently no-op the
    # clamp intervention (the layer loop ignores unknown keys) and emit
    # unsteered generations labeled as steered — same silent-failure class
    # as the cache CLIs (review r5).
    validate_hookpoints(model, list(sae_dict))
    from ...parallel import replicate_saes

    replicate_saes(model, sae_dict.values())

    gen_cfg = dict(getattr(model, "generation_config", None) or {})
    if args.sampling == "greedy":
        gen_cfg["do_sample"] = False
    elif args.sampling == "sample":
        gen_cfg["do_sample"] = True
    gen_cfg["seed"] = args.seed

    for module_name, sae in sae_dict.items():
        feature_idx = np.array_split(filters[module_name], world)[rank].tolist()
        controller = SteeringController(
            sae=sae,
            module_name=module_name,
            feature_idx=feature_idx,
            prompt=args.text,
            model=model,
            processor=processor,
            image_path=args.image_path,
            k=args.clamp_value,
            max_new_tokens=args.max_new_tokens,
            feature_batch_size=args.feature_batch_size,
            generation_config=gen_cfg,
        )
        result_dict = controller.run()

        # One merged json per module on rank 0 (reference gather_object,
        # launch steering.py:92-106) — feature keys are disjoint across the
        # array_split shards, so a dict union reassembles the full fleet.
        gathered = gather_objects(result_dict)
        if gathered is None:
            continue
        merged = {}
        for part in gathered:
            merged.update(part)
        os.makedirs(args.save_dir, exist_ok=True)
        fname = f"{module_name}.json"
        with open(os.path.join(args.save_dir, fname), "w", encoding="utf-8") as f:
            json.dump(merged, f, indent=4, ensure_ascii=False)


if __name__ == "__main__":
    main()
