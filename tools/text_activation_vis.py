#!/usr/bin/env python
"""HTML heatmap of per-token SAE activations for filtered features
(reference tools/text_activation_vis.py): run the subject model over text,
encode with the SAE (top-k masked), and emit a colored-token HTML page with
the saved explanations."""

import argparse
import json
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

from multimodal_sae_tpu.interp_utils import load_explanation, load_filter, load_saes
from multimodal_sae_tpu.launch.utils import load_subject_model

HTML_START = "<html><body>"
HTML_END = "</body></html>"


def parse_argument():
    parser = argparse.ArgumentParser()
    parser.add_argument("--explanation-dir", type=str)
    parser.add_argument("--model-path", type=str, help="The subject model path")
    parser.add_argument("--sae-path", type=str)
    parser.add_argument("--save-path", type=str, help="Output html path")
    parser.add_argument("--filters", type=str, default=None)
    parser.add_argument("--text", type=str, help="Text to visualize")
    return parser.parse_args()


def activation_to_color(activation: float) -> str:
    return f"background-color: rgba(255, 0, 0, {activation});"


def generate_feature_html(feature_name, tokens, activations, explanation):
    activations = np.asarray(activations, dtype=np.float64)
    rng = activations.max() - activations.min()
    activations = (activations - activations.min()) / (rng if rng else 1.0)
    html_tokens = [
        f'<span style="{activation_to_color(float(act))}">{token}</span>'
        for token, act in zip(tokens, activations)
    ]
    styled_text = " ".join(html_tokens)
    return f"""
    <h2>{feature_name}</h2>
    <p>{explanation}</p>
    <p>{styled_text}</p>
    <hr>
    """


def main():
    args = parse_argument()
    model, _, tokenizer = load_subject_model(args.model_path)
    explanations = load_explanation(args.explanation_dir)
    filters = load_filter(args.filters) if args.filters else None
    submodule_dict = load_saes(args.sae_path, filters)

    ids = tokenizer(args.text)["input_ids"]
    tokens_str = [
        tokenizer.convert_tokens_to_string([tokenizer.convert_ids_to_tokens(t)])
        for t in ids
    ]
    batch = {"input_ids": np.asarray([ids])}
    hiddens = model.capture(batch, list(submodule_dict.keys()))

    full_html = HTML_START
    for module_path, h in hiddens.items():
        sae = submodule_dict[module_path]
        vals, idx = sae.encode(h)
        # dense top-k-masked latents (reference text_activation_vis.py:239-246)
        latents = np.zeros((h.shape[1], sae.num_latents), dtype=np.float32)
        np.put_along_axis(latents, np.asarray(idx)[0], np.asarray(vals)[0], axis=-1)
        indices = (
            filters[module_path].tolist()
            if filters is not None
            else range(latents.shape[1])
        )
        for i in indices:
            name = f"{module_path}_feature{i}"
            if name not in explanations:
                continue
            full_html += generate_feature_html(
                name, tokens_str, latents[:, i], explanations[name]
            )
    full_html += HTML_END
    with open(args.save_path, "w") as f:
        f.write(full_html)


if __name__ == "__main__":
    main()
