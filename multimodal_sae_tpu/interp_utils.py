"""Shared interpretation-layer utilities (reference sae_auto_interp/utils.py):
filter/explanation loaders, SAE multi-load, anyres helpers, llava image-token
span lookup, notebook display."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import numpy as np

from .features import FeatureRecord
from .sae import Sae


def load_filter(path: str) -> Dict[str, np.ndarray]:
    """Json {hookpoint: [feature ids]} -> arrays (reference utils.py:44-48)."""
    with open(path) as f:
        filt = json.load(f)
    return {key: np.asarray(value, dtype=np.int64) for key, value in filt.items()}


def load_explanation(explanation_dir: str) -> Dict[str, str]:
    """Merge `{module}.json` append-list files into {feature: explanation}
    (reference utils.py:51-65): each file holds a list of
    {feature_name: explanation, "prompt": ...} dicts."""
    explanations: Dict[str, str] = {}
    files = [
        e
        for e in os.listdir(explanation_dir)
        # *.json only (the explain writers only ever produce {module}.json):
        # users are pointed at this directory directly, and a stray
        # notes.txt / editor swap file previously crashed every consumer at
        # startup with a raw JSONDecodeError (review r5).
        if e.endswith(".json") and os.path.isfile(os.path.join(explanation_dir, e))
    ]
    for file in files:
        path = os.path.join(explanation_dir, file)
        with open(path, "r") as f:
            try:
                data = json.load(f)
            except json.JSONDecodeError as e:
                from .logger import logger

                logger.warning(f"skipping unparsable explanation file {path}: {e}")
                continue
        for da in data:
            for key_name, content in da.items():
                if key_name != "prompt":
                    explanations[key_name] = content
    return explanations


def load_saes(
    sae_path: str,
    filters: Optional[Dict[str, np.ndarray]] = None,
    dtype=None,
    int8_encoder: bool = False,
) -> Dict[str, Sae]:
    """Load one SAE per hookpoint, locally or from the hub
    (reference utils.py:106-127).  `int8_encoder` quantizes each W_enc for
    the native int8 MXU cache step (opt-in, numerics-changing;
    sae/model.py quantize_encoder)."""
    submodule_dict: Dict[str, Sae] = {}
    local = os.path.exists(sae_path)
    if filters is not None:
        for module_name in filters:
            if local:
                submodule_dict[module_name] = Sae.load_from_disk(
                    os.path.join(sae_path, module_name), dtype=dtype
                )
            else:
                submodule_dict[module_name] = Sae.load_from_hub(
                    sae_path, module_name, dtype=dtype
                )
    else:
        submodule_dict = Sae.load_many(sae_path, local=local, dtype=dtype)
    if int8_encoder:
        for sae in submodule_dict.values():
            sae.quantize_encoder()
    return submodule_dict


def load_single_sae(sae_path: str, module_name: str, dtype=None) -> Sae:
    """(reference utils.py:130-135)"""
    if os.path.exists(sae_path):
        return Sae.load_from_disk(os.path.join(sae_path, module_name), dtype=dtype)
    return Sae.load_from_hub(sae_path, module_name, dtype=dtype)


def get_llava_image_pos(input_ids: List[int], image_tok: int) -> Tuple[int, int]:
    """(start, negative-end) span of the image tokens within expanded input
    ids — single image only (reference utils.py:187-198)."""
    input_ids = list(input_ids)
    image_pos = input_ids.index(image_tok)
    prev = image_pos
    after = -(len(input_ids) - image_pos) + 1
    return prev, after


def display(record: FeatureRecord, tokenizer, threshold: float = 0.0, n: int = 10):
    """Notebook HTML rendering of activating spans (reference utils.py:201-230)."""
    from IPython.core.display import HTML, display as ipy_display

    def _to_string(tokens, activations) -> str:
        result = []
        i = 0
        max_act = max(activations)
        _threshold = max_act * threshold
        while i < len(tokens):
            if activations[i] > _threshold:
                result.append("<mark>")
                while i < len(tokens) and activations[i] > _threshold:
                    result.append(tokens[i])
                    i += 1
                result.append("</mark>")
            else:
                result.append(tokens[i])
                i += 1
        return "".join(result)

    strings = [
        _to_string(
            tokenizer.batch_decode([[t] for t in np.asarray(example.tokens)]),
            np.asarray(example.activations),
        )
        for example in record.examples[:n]
    ]
    ipy_display(HTML("<br><br>".join(strings)))


def load_tokenizer(model: str):
    """Left-padding tokenizer setup (reference utils.py:233-241)."""
    from transformers import AutoTokenizer

    tokenizer = AutoTokenizer.from_pretrained(model, padding_side="left")
    tokenizer.pad_token = tokenizer.eos_token
    return tokenizer
