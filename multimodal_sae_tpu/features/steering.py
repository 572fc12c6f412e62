"""Feature steering (reference sae_auto_interp/features/steering.py:13-128).

The reference registers a forward hook that replaces a layer's output with the
SAE reconstruction after clamping one latent to `k`, skipping decode-phase
length-1 calls (reference steering.py:102-128).  Here the same behavior is an
intervention function handed to the model's generate loop with
`intervene_prefill_only=True` — the functional equivalent of the seq-len>1
hook condition — so the whole steered generation stays jitted.
"""

from __future__ import annotations

from typing import Callable, Dict, List, Optional

import jax

from ..sae import Sae
from ..sae.model import decode as sae_decode, pre_acts as sae_pre_acts, select_topk


def clamp_features_max(sae: Sae, feature: int, k: float = 10) -> Callable:
    """Intervention: clamp `feature`'s latent to `k`, re-select top-k, decode
    (reference steering.py:102-128). Returns fn(hidden (B, S, d)) -> (B, S, d)."""

    params, cfg = sae.params, sae.cfg

    def intervention(h: jax.Array) -> jax.Array:
        latents = sae_pre_acts(params, h)
        latents = latents.at[:, :, feature].set(k)
        top_acts, top_indices = select_topk(latents, cfg.k)
        out = sae_decode(params, top_acts, top_indices)
        return out.astype(h.dtype)

    return intervention


class SteeringController:
    """Generates baseline vs per-feature clamped continuations
    (reference steering.py:13-100).

    Args:
        sae: the Sae to steer with.
        module_name: hookpoint, e.g. "model.layers.24".
        feature_idx: feature ids to steer (one generation each).
        model: LlavaNextModel / LlamaModel (capture+generate API).
        processor: HF processor/tokenizer for chat templating + decode.
        prompt: user text.
        image_path: optional input image.
        k: clamp value (default 50).
    """

    def __init__(
        self,
        sae: Sae,
        module_name: str,
        feature_idx: List[int],
        model,
        processor,
        prompt: str,
        image_path: Optional[str] = None,
        k: float = 50,
        max_new_tokens: int = 512,
    ):
        self.sae = sae
        self.feature_idx = feature_idx
        self.model = model
        self.module_name = module_name
        self.processor = processor
        self.k = k
        self.max_new_tokens = max_new_tokens

        conversation = [
            {"role": "user", "content": [{"type": "text", "text": prompt}]}
        ]
        image = None
        if image_path is not None:
            from PIL import Image

            image = Image.open(image_path)
            conversation[0]["content"].append({"type": "image"})

        # tokenize=False: processors default to returning the string, plain
        # tokenizers (text-only subject models) default to token ids.
        templated = processor.apply_chat_template(
            conversation, add_generation_prompt=True, tokenize=False
        )
        tokenizer = getattr(processor, "tokenizer", processor)
        prompt_ids = tokenizer(templated)["input_ids"]

        if image is not None:
            self.batch = model.prepare_inputs(images=[image], prompt_ids=[prompt_ids])
        else:
            self.batch = {"input_ids": [prompt_ids]}

    def _decode_continuation(self, output) -> str:
        import numpy as np

        prompt_len = len(self.batch["input_ids"][0]) if isinstance(
            self.batch["input_ids"], list
        ) else self.batch["input_ids"].shape[-1]
        cont = np.asarray(output)[:, prompt_len:]
        tokenizer = getattr(self.processor, "tokenizer", self.processor)
        return tokenizer.batch_decode(cont, skip_special_tokens=True)[0]

    def run(self) -> Dict[str, dict]:
        result_dict = {}
        output = self.model.generate(self.batch, max_new_tokens=self.max_new_tokens)
        original_resps = self._decode_continuation(output)

        try:
            from tqdm import tqdm

            pbar = tqdm(total=len(self.feature_idx), desc="Clamping...")
        except ImportError:
            pbar = None
        for idx in self.feature_idx:
            feature_name = f"{self.module_name}_feature{idx}"
            iv = {self.module_name: clamp_features_max(self.sae, int(idx), k=self.k)}
            output = self.model.generate(
                self.batch,
                max_new_tokens=self.max_new_tokens,
                interventions=iv,
                intervene_prefill_only=True,
            )
            clamped_resps = self._decode_continuation(output)
            result_dict[feature_name] = {
                "original_resps": original_resps,
                "clamped_resps": clamped_resps,
                "idx": int(idx),
            }
            if pbar:
                pbar.update(1)
        return result_dict
