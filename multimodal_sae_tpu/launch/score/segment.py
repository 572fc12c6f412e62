"""IoU segment-scoring CLI (reference launch/score/segment.py:97-172):
label-refine explanations (or use a refine cache), ground with
detector+SAM, score IoU vs activation masks.  The scorer self-shards the
feature list by process; per-rank score lists are all-gathered and rank 0
writes ONE merged json (reference all_gather_object + rank-0 save,
launch/score/segment.py:156-172).
"""

from __future__ import annotations

import argparse
import json
import os

from ...agents.scorers import LabelRefiner, RandomSegmentScorer, SegmentScorer
from ...clients import SRT
from ...interp_utils import load_filter
from ...parallel import gather_objects, initialize_distributed
from ..utils import shard_info


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-path", "-d", type=str, help="The image dataset")
    parser.add_argument("--dataset-split", type=str, default="train")
    parser.add_argument("--model-name", type=str, default="llava-hf/llama3-llava-next-8b-hf")
    parser.add_argument("--activation-dir", type=str, help="Cached activation dir")
    parser.add_argument("--explanation_dir", type=str, help="Explanation dir")
    parser.add_argument("--width", type=int, default=131072)
    parser.add_argument(
        "--n-splits",
        type=int,
        default=None,
        help="Splits the cache was written with; inferred from the cache "
        "dir when omitted (review r5: a fixed default silently disagreed "
        "with the cache CLI's n_splits=2 and failed mid-run with "
        "FileNotFoundError; the reference makes it a mandatory flag)",
    )
    parser.add_argument("--detector", type=str, default="IDEA-Research/grounding-dino-base")
    parser.add_argument("--segmentor", type=str, default="facebook/sam-vit-huge")
    parser.add_argument("--refine-cache", type=str, default=None)
    parser.add_argument("--save-refine-path", type=str)
    parser.add_argument("--save-score-path", type=str, required=True)
    parser.add_argument("--eval-type", type=str, default="default", choices=["default", "random"])
    parser.add_argument("--filters", type=str, default=None)
    parser.add_argument(
        "--selected-layer",
        type=str,
        default="model.layers.24",
        help="The layer of the model to be evaluated on, such as `model.layers.24`",
    )
    args = parser.parse_args()
    if args.refine_cache is None and args.save_refine_path is None:
        # Fail at parse time, not after the refine LLM pass has run.
        parser.error("--save-refine-path is required when no --refine-cache is given")
    return args


def main():
    args = parse_args()
    initialize_distributed()
    rank, world = shard_info()

    filters = (
        load_filter(args.filters)[args.selected_layer]
        if args.filters is not None
        else None
    )

    from datasets import load_dataset
    from transformers import AutoProcessor

    if args.n_splits is None:
        from ..utils import infer_n_splits

        args.n_splits = infer_n_splits(args.activation_dir, args.selected_layer)

    tokens = load_dataset(args.dataset_path, split=args.dataset_split)
    processor = AutoProcessor.from_pretrained(args.model_name)
    kwargs = {
        "activation_dir": args.activation_dir,
        "tokens": tokens,
        "processor": processor,
        "width": args.width,
        "n_splits": args.n_splits,
        "explanation_dir": args.explanation_dir,
        "detector": args.detector,
        "segmentor": args.segmentor,
        "selected_layer": args.selected_layer,
        "filters": filters,
    }
    scorer = (
        SegmentScorer(**kwargs) if args.eval_type == "default" else RandomSegmentScorer(**kwargs)
    )

    if args.refine_cache is None:
        if world > 1:
            raise RuntimeError(
                "Please refine your description first and use the cache result to do the scoring"
            )
        client = SRT(model="meta-llama/Llama-3.1-8B-Instruct", tp=2)
        try:
            refiner = LabelRefiner(client, scorer.filtered_explanation)
            scorer.refine(refiner, save_path=args.save_refine_path)
        finally:
            client.clean()
    else:
        scorer.explanation = json.load(open(args.refine_cache, "r"))

    scorer.load_model()
    if args.eval_type == "default":
        scores = scorer()
    else:
        # 10 random trials (reference segment.py:150-154).  Each scorer()
        # call re-drains the loader, and random_activations_image draws a
        # fresh unseeded sample per call, so no re-init is needed between
        # trials.
        scores = []
        for _ in range(10):
            scores.extend(scorer())

    # Rank-ordered all-gather of the per-rank score lists; rank 0 writes the
    # single merged file downstream analysis reads (reference
    # launch/score/segment.py:156-172).
    gathered = gather_objects(scores)
    if gathered is None:
        return
    merged = [item for part in gathered for item in part]
    save_dir = os.path.dirname(args.save_score_path)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    with open(args.save_score_path, "w") as f:
        json.dump(merged, f, indent=4)


if __name__ == "__main__":
    main()
