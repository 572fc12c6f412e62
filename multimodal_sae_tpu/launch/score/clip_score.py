"""CLIP-Score CLI (reference launch/score/clip_score.py:13-89)."""

from __future__ import annotations

import argparse
import json
import os

from ...agents.scorers import ClipScorer, GeneratedClipScorer, LabelRefiner
from ...clients import SRT


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset-path", "-d", type=str, help="The dataset you use")
    parser.add_argument("--dataset-split", type=str, default="train")
    parser.add_argument(
        "--clip_name_or_path", type=str, default="openai/clip-vit-base-patch32"
    )
    parser.add_argument("--refine-cache", type=str, default=None)
    parser.add_argument("--save-refine-path", type=str)
    parser.add_argument("--explanation_dir", type=str)
    parser.add_argument("--save-score-path", type=str)
    parser.add_argument(
        "--evaluation_type",
        "-e",
        type=str,
        default="default",
        choices=["default", "random", "generated"],
    )
    return parser.parse_args()


def main():
    args = parse_args()
    kwargs = {
        "explanation_dir": args.explanation_dir,
        "dataset_path": args.dataset_path,
        "dataset_split": args.dataset_split,
        "k": 5,
        "evaluation_type": args.evaluation_type
        if args.evaluation_type != "generated"
        else "default",
        "clip_model_name_or_path": args.clip_name_or_path,
    }
    scorer = (
        ClipScorer(**kwargs)
        if args.evaluation_type != "generated"
        else GeneratedClipScorer(**kwargs)
    )

    if args.refine_cache is None:
        client = SRT(model="meta-llama/Llama-3.1-8B-Instruct", tp=2)
        refiner = LabelRefiner(client, scorer.explanations)
        scorer.refine(refiner, save_path=args.save_refine_path)
        client.clean()
    else:
        scorer.explanations = json.load(open(args.refine_cache, "r"))

    scores = scorer.run()
    save_dir = os.path.dirname(args.save_score_path)
    if save_dir:
        os.makedirs(save_dir, exist_ok=True)
    with open(args.save_score_path, "w") as f:
        json.dump(scores, f, indent=4)


if __name__ == "__main__":
    main()
