#!/usr/bin/env python
"""LLaVA instruction json + image folder → HF dataset
(reference train/sae/tools/make_hf_dataset_llava.py:40-130): converts
from/value conversations to role/content, loads images with sizes, pushes to
the hub."""

import argparse
import json
import os


def parse_argument():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "--dataset_path", type=str, help="Path to the llava instruction json"
    )
    parser.add_argument("--image_folder", type=str, help="Path to the image folder")
    parser.add_argument("--push_to", type=str, help="Hub repo to push to")
    parser.add_argument("--dataset_name", type=str, default=None)
    parser.add_argument("--split", type=str, default="train")
    parser.add_argument("--public", action="store_true", default=False)
    parser.add_argument("--num_proc", type=int, default=1)
    return parser.parse_args()


def data_generator(data, image_folder):
    from PIL import Image as PIL_Image

    for da in data:
        item = {"id": str(da["id"])}

        new_conversation = []
        for conv in da["conversations"]:
            if conv["from"] == "human":
                role = "user"
            elif conv["from"] == "gpt":
                role = "assistant"
            else:
                role = conv["from"]
            new_conversation.append({"role": role, "content": conv["value"]})
        item["conversations"] = new_conversation

        if "image" in da:
            paths = da["image"] if isinstance(da["image"], list) else [da["image"]]
            item["image_path"] = paths
            images, image_sizes = [], []
            for image_path in paths:
                image = PIL_Image.open(os.path.join(image_folder, image_path))
                images.append(image)
                image_sizes.append([image.size[0], image.size[1]])
            item["image"] = images
            item["image_sizes"] = image_sizes
        else:
            item["image_path"] = ""
            item["image"] = [None]
            item["image_sizes"] = []
        yield item


def main():
    from datasets import Dataset, Features, Image, Sequence, Value

    args = parse_argument()
    with open(args.dataset_path, "r") as f:
        data = json.load(f)

    features = Features(
        {
            "id": Value("string"),
            "conversations": [{"content": Value("string"), "role": Value("string")}],
            "image": Sequence(Image()),
            "image_sizes": Sequence(Sequence(Value("int64"))),
        }
    )

    dataset = Dataset.from_generator(
        data_generator,
        gen_kwargs={"data": data, "image_folder": args.image_folder},
        num_proc=args.num_proc if args.num_proc > 1 else None,
        features=features,
    )
    dataset.push_to_hub(
        repo_id=args.push_to,
        config_name="default" if args.dataset_name is None else args.dataset_name,
        split=args.split,
        private=not args.public,
    )


if __name__ == "__main__":
    main()
