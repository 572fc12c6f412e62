#!/usr/bin/env python
"""Single-feature interactive steering CLI (reference tools/model_steering.py:86-137):
prints the original vs clamped generations for one feature."""

import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

from multimodal_sae_tpu.features.steering import clamp_features_max
from multimodal_sae_tpu.interp_utils import load_single_sae
from multimodal_sae_tpu.launch.utils import load_subject_model, prepare_prompt_batch


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
    parser.add_argument("--text", "-t", type=str, help="The prompt text")
    parser.add_argument("--sae-path", type=str, help="SAE path, hub or local")
    parser.add_argument("--module-name", type=str, default="model.layers.24")
    parser.add_argument("--clamp-value", "-k", type=float, default=10)
    parser.add_argument("--feature_idx", "-f", type=int, help="Feature to clamp")
    parser.add_argument(
        "--pure-text", action="store_true", help="Raw prompt, no chat template"
    )
    return parser.parse_args()


def main():
    args = parse_argument()
    sae = load_single_sae(args.sae_path, args.module_name)
    model, processor, tokenizer = load_subject_model(args.model)

    from PIL import Image

    image = Image.open(args.image_path) if args.image_path is not None else None
    text = args.text

    tok, _, batch = prepare_prompt_batch(
        model,
        processor,
        tokenizer,
        text,
        image,
        use_chat_template=not args.pure_text,
        raw_prompt=text if image is None else "<image>\n" + text,
    )

    def decode(output):
        import numpy as np

        cont = np.asarray(output)[:, np.asarray(batch["input_ids"]).shape[-1]:]
        return tok.batch_decode(cont, skip_special_tokens=True)[0]

    print(" ===========  Original ===========")
    print(decode(model.generate(batch, max_new_tokens=512)))

    print(" ===========  Steering ===========")
    iv = {args.module_name: clamp_features_max(sae, args.feature_idx, k=args.clamp_value)}
    print(
        decode(
            model.generate(
                batch, max_new_tokens=512, interventions=iv, intervene_prefill_only=True
            )
        )
    )


if __name__ == "__main__":
    main()
