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

from ..models.llama import Intervention
from ..sae import Sae
from ..sae.model import decode as sae_decode, pre_acts as sae_pre_acts, select_topk


def _clamp_iv(args, h: jax.Array, k_top: int) -> jax.Array:
    """Stable intervention body for `clamp_features_max` (see
    models/llama.py `Intervention`): SAE params and the clamped feature ride
    through jit as arguments, so repeated steering sweeps reuse one compiled
    generate program instead of recompiling per feature."""
    params, feature, clamp = args
    latents = sae_pre_acts(params, h)
    latents = latents.at[:, :, feature].set(clamp.astype(latents.dtype))
    top_acts, top_indices = select_topk(latents, k_top)
    out = sae_decode(params, top_acts, top_indices)
    return out.astype(h.dtype)


def clamp_features_max(sae: Sae, feature: int, k: float = 10) -> Intervention:
    """Intervention: clamp `feature`'s latent to `k`, re-select top-k, decode
    (reference steering.py:102-128). Returns a jit-cache-stable
    `Intervention`; callers may also treat it as data for `llama_forward`."""
    import jax.numpy as jnp

    return Intervention(
        _clamp_iv,
        (sae.params, jnp.asarray(feature, jnp.int32), jnp.asarray(k, jnp.float32)),
        (sae.cfg.k,),
    )


def clamp_features_max_batched(sae: Sae, features, k: float = 10) -> Intervention:
    """Batched steering intervention: row b of the hidden batch gets
    `features[b]` clamped to `k`.

    The reference steers 5k+ features with one full autoregressive `generate`
    per feature, strictly sequentially (reference
    launch/features/steering.py:71-78) — an architecture artifact of its hook
    API. Since every steered generation shares the same prompt, the feature
    index can ride the *batch axis* of the jitted generate loop instead: one
    compiled program steers F features per sweep. Per-row math is identical to
    `clamp_features_max` (the scatter touches only that row's latent)."""
    import jax.numpy as jnp

    return Intervention(
        _clamp_batched_iv,
        (
            sae.params,
            jnp.asarray(features, jnp.int32),  # (B,)
            jnp.asarray(k, jnp.float32),
        ),
        (sae.cfg.k,),
    )


def _clamp_batched_iv(args, h: jax.Array, k_top: int) -> jax.Array:
    import jax.numpy as jnp

    params, features, clamp = args
    latents = sae_pre_acts(params, h)
    rows = jnp.arange(latents.shape[0])
    latents = latents.at[rows, :, features].set(clamp.astype(latents.dtype))
    top_acts, top_indices = select_topk(latents, k_top)
    out = sae_decode(params, top_acts, top_indices)
    return out.astype(h.dtype)


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
        feature_batch_size: features steered per generate call. The prompt is
            shared, so features ride the batch axis of the jitted generate
            loop (`clamp_features_max_batched`): F features per compiled
            sweep instead of the reference's one-generation-per-feature
            sequential loop (reference launch/features/steering.py:71-78).
        generation_config: optional {"do_sample", "temperature", "top_p",
            "seed", "eos_token_id"} dict (e.g. from the checkpoint's
            generation_config.json,
            attached by launch.utils.load_subject_model). The reference
            inherits these through HF `generate`
            (reference features/steering.py:72-75); greedy when absent.
            Baseline and steered generations share the same PRNG seed, so a
            steered/original pair differs only through the intervention.
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
        feature_batch_size: int = 1,
        generation_config: Optional[dict] = None,
    ):
        self.sae = sae
        self.feature_idx = feature_idx
        self.model = model
        self.module_name = module_name
        self.processor = processor
        self.k = k
        self.max_new_tokens = max_new_tokens
        self.feature_batch_size = max(1, int(feature_batch_size))
        gen_cfg = generation_config or {}
        tokenizer = getattr(processor, "tokenizer", processor)
        self._sample_kwargs = {}
        if gen_cfg.get("do_sample"):
            # `or 1.0` would silently remap an explicit temperature of 0.0
            # (greedy intent) to full-temperature sampling; HF `generate`
            # raises for non-positive temperatures, so mirror that.
            temperature = gen_cfg.get("temperature")
            temperature = 1.0 if temperature is None else float(temperature)
            if temperature <= 0.0:
                raise ValueError(
                    f"do_sample=True with temperature={temperature}; use "
                    "do_sample=False for greedy decoding (HF generate "
                    "rejects non-positive temperatures too)."
                )
            self._sample_kwargs = {
                "do_sample": True,
                "temperature": temperature,
                "top_p": gen_cfg.get("top_p"),
                "prng_key": jax.random.PRNGKey(int(gen_cfg.get("seed", 0))),
            }
        # EOS stopping applies regardless of sampling mode (HF generate
        # stops at the checkpoint's stop ids; without this every
        # generation ran the full max_new_tokens and decoded post-EOS
        # babble into the steering jsons). Config first, tokenizer fallback.
        eos = gen_cfg.get("eos_token_id")
        if eos is None:
            eos = getattr(tokenizer, "eos_token_id", None)
        if eos is not None:
            self._sample_kwargs["eos_token_id"] = eos

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
        # Deliberately plain tokenization (default add_special_tokens), like
        # the reference's `processor(text=templated)` (reference
        # features/steering.py:62-67): on checkpoints whose chat template
        # already emits <|begin_of_text|> AND whose tokenizer prepends BOS,
        # both paths produce the same duplicated BOS — steered/original
        # pairs stay comparable to reference outputs.
        prompt_ids = tokenizer(templated)["input_ids"]

        if image is not None:
            self.batch = model.prepare_inputs(images=[image], prompt_ids=[prompt_ids])
        else:
            self.batch = {"input_ids": [prompt_ids]}

    def _decode_continuations(self, output) -> List[str]:
        import numpy as np

        prompt_len = len(self.batch["input_ids"][0]) if isinstance(
            self.batch["input_ids"], list
        ) else self.batch["input_ids"].shape[-1]
        cont = np.asarray(output)[:, prompt_len:]
        tokenizer = getattr(self.processor, "tokenizer", self.processor)
        return tokenizer.batch_decode(cont, skip_special_tokens=True)

    def _replicate_batch(self, n: int) -> dict:
        """Tile the single-prompt batch to `n` identical rows (preprocessing
        is reused; identical pixel_values objects embed once per generate)."""
        import numpy as np

        if n == 1:
            return self.batch
        out = {}
        for key, val in self.batch.items():
            if isinstance(val, list):
                # Per-ELEMENT repeat ([a,a,b,b]), matching np.repeat's axis-0
                # semantics below — whole-list tiling ([a,b,a,b]) would pair
                # row i's list values with row j's array values once a batch
                # carries more than one prompt (review r5; single-prompt
                # batches, today's only caller, are unaffected either way).
                out[key] = [v for v in val for _ in range(n)]
            else:
                arr = np.asarray(val)
                out[key] = np.repeat(arr, n, axis=0)
        return out

    def run(self) -> Dict[str, dict]:
        result_dict = {}
        output = self.model.generate(
            self.batch, max_new_tokens=self.max_new_tokens, **self._sample_kwargs
        )
        original_resps = self._decode_continuations(output)[0]

        try:
            from tqdm import tqdm

            pbar = tqdm(total=len(self.feature_idx), desc="Clamping...")
        except ImportError:
            pbar = None
        fbs = self.feature_batch_size
        # Under `--dp N` (subject on a ('data',) mesh) the generate batch is
        # row-sharded only when it divides the mesh; top ragged chunks up by
        # repeating the last feature — a duplicate steered row is cheaper
        # than an unsharded decode — and zip() below drops the extras.
        # Padding is draw-invariant even when sampling: threefry noise is
        # generated per flat index, so widening (B, V) logits leaves the
        # real rows' gumbel noise (and hence their drawn tokens) unchanged
        # (pinned by tests/test_parallel.py::
        # test_sampled_steering_ragged_chunk_dp_matches_unsharded).
        mesh = getattr(self.model, "mesh", None)
        dp = (
            # 'data' axis size, not total devices (review r5: identical on
            # today's 1-D meshes, wrong padding on a multi-axis one).
            int(mesh.shape["data"])
            if mesh is not None and "data" in mesh.axis_names
            else 1
        )
        for i in range(0, len(self.feature_idx), fbs):
            chunk = [int(f) for f in self.feature_idx[i : i + fbs]]
            run_chunk = chunk + [chunk[-1]] * (-len(chunk) % dp)
            iv = {
                self.module_name: clamp_features_max_batched(
                    self.sae, run_chunk, k=self.k
                )
            }
            output = self.model.generate(
                self._replicate_batch(len(run_chunk)),
                max_new_tokens=self.max_new_tokens,
                interventions=iv,
                intervene_prefill_only=True,
                **self._sample_kwargs,
            )
            clamped = self._decode_continuations(output)
            for idx, clamped_resps in zip(chunk, clamped):
                result_dict[f"{self.module_name}_feature{idx}"] = {
                    "original_resps": original_resps,
                    "clamped_resps": clamped_resps,
                    "idx": idx,
                }
            if pbar:
                pbar.update(len(chunk))
        return result_dict
