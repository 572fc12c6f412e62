#!/usr/bin/env python
"""Build the evaluation cache dataset: concatenate the image columns of the
five benchmark datasets the reference caches over
(reference tools/prepare_cache_dataset.py:16-29) and push to the hub with a
per-row `source` column."""

import argparse

# (dataset, split) pairs — the same five sources the paper evaluates on.
SOURCES = [
    ("lmms-lab/LLaVA-Bench-Wilder", "test"),
    ("lmms-lab/MME", "test"),
    ("lmms-lab/COCO-Caption2017", "val"),
    ("lmms-lab/MMVet", "test"),
    ("lmms-lab/LLaVA-NeXT-Data", "train[:5%]"),
]


def build_cache_dataset():
    from datasets import concatenate_datasets, load_dataset

    parts = []
    source_labels = []
    for repo, split in SOURCES:
        ds = load_dataset(repo, split=split).select_columns(["image"])
        parts.append(ds)
        source_labels.extend([repo] * len(ds))
    merged = concatenate_datasets(parts)
    return merged.add_column("source", source_labels)


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--output_path", type=str, help="Hub repo to push to")
    args = parser.parse_args()
    build_cache_dataset().push_to_hub(args.output_path)


if __name__ == "__main__":
    main()
