"""Attribution patching (reference features/patching/attribution.py:25-189).

Per feature f: splice the SAE reconstruction into each hooked layer (clean),
splice with feature f ablated (corrupted), and accumulate
`(clean − corrupted) · d(metric)/d(corrupted)` summed over hidden dim into a
(batch, seq) saliency map.

TPU-first differences (same math):
* **prefix/suffix split** (single-hookpoint fast path, the flagship config):
  everything below the splice point is feature-independent — layers 0..hook,
  the (B·S, width) pre-activation matmul, and a top-(k+1) selection pool run
  ONCE; per feature only the layers above the hook run fwd+bwd
  (`build_fast_attribution` / `fast_attribution_maps`);
* the clean spliced forward does not depend on the feature index, so it runs
  once, not once per feature (the reference recomputes it in the loop,
  attribution.py:135-145);
* corrupted forward + gradient is one jitted `value_and_grad` with gradients
  obtained through a zero-delta at the splice point instead of retain_grad
  (see patching/utils.py);
* a `feature_batch` vmaps the per-feature step (auto width by prompt length,
  halve-and-retry on OOM) — the big throughput win over the reference's
  per-feature python loop (SURVEY.md §3.5 hot loop #4);
* the general path (multiple hookpoints, or models without
  `forward_from_layer`) keeps the full-forward formulation.
"""

from __future__ import annotations

import collections
import json
import os
from functools import partial
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ...sae import Sae
from ...sae.model import decode as sae_decode, pre_acts as sae_pre_acts, select_topk
from .utils import get_logit_diff, spliced_forward_with_delta


def build_fast_attribution(model, hook: str, sae: Sae, batch: dict, metric):
    """Build the prefix/suffix attribution step (see fast_attribution_maps).

    Runs the prefix immediately (capture of the raw hook output + encode to
    a top-(k+1) pool + the clean splice) and returns
    `(prefix_args, suffix_tree, chunk_step)` where
    `chunk_step(suffix_tree, sae_params, *prefix_args, feats)` yields the
    (F, B, S) saliency for a feature chunk.  `suffix_tree` is
    `model.suffix_params(hook)` — only the above-splice weights ride the jit
    arguments (an in-program layers[start:] slice would materialize a
    ~1.9 GB copy at 8B/hook-24, measured as exactly the F=2 OOM margin at
    the 2.4k-token shape).  Exposed separately so callers (bench.py) can
    time/compose the jitted step without re-tracing per invocation."""
    h_raw = model.capture(batch, [hook])[hook]  # (B, S, D) — the prefix
    B, S, D = h_raw.shape
    k = sae.cfg.k
    width = sae.cfg.num_latents_for(sae.d_in)
    k_wide = min(k + 1, width)

    @jax.jit
    def encode_prefix(sp, h):
        """One-time: raw latents -> top-(k+1) pool + the clean splice.

        The clean top-k is reselected from the SAME wide pool with the SAME
        `lax.top_k` the corrupted path uses (not an independent
        `select_topk(lat, k)`): two different top-k algorithms may break a
        nonzero value tie at rank k differently, which would make
        clean != corrupted for features that were never ablated and inject a
        (W_dec[A]-W_dec[B])·v artifact into every saliency in the chunk."""
        lat = sae_pre_acts(sp, h.reshape(-1, D))
        wide_vals, wide_idx = select_topk(lat, k_wide)
        clean_vals, clean_pos = jax.lax.top_k(wide_vals, k)
        clean_idx = jnp.take_along_axis(wide_idx, clean_pos, axis=1)
        clean = (
            sae_decode(sp, clean_vals, clean_idx).reshape(B, S, D).astype(h.dtype)
        )
        return wide_vals, wide_idx, clean

    prefix_args = encode_prefix(sae.params, h_raw)
    suffix_tree = (
        model.suffix_params(hook) if hasattr(model, "suffix_params") else None
    )

    @jax.jit
    def chunk_step(mp, sp, wv, wi, clean, feats):
        # Created inside the trace: a closed-over concrete zeros array would
        # be a real (B, S, D) device constant per program (~40 MB at real
        # multimodal shapes); traced zeros fold to a broadcast.
        zeros = jnp.zeros((B, S, D), jnp.float32)

        def one(f):
            def corrupted_metric(delta):
                masked = jnp.where(wi == f, jnp.asarray(-1.0, wv.dtype), wv)
                vals_k, pos = jax.lax.top_k(masked, k)
                # The -1 sentinel can only be selected in the degenerate
                # k == width case; clamping restores the reference's exact
                # zero contribution for an ablated-but-selected feature.
                vals_k = jnp.maximum(vals_k, jnp.asarray(0.0, vals_k.dtype))
                idx_k = jnp.take_along_axis(wi, pos, axis=1)
                spliced = (
                    sae_decode(sp, vals_k, idx_k)
                    .reshape(B, S, D)
                    .astype(clean.dtype)
                )
                x = spliced + delta.astype(spliced.dtype)
                logits = model.forward_from_layer(x, hook, batch, suffix=mp)
                return metric(logits), x

            (_, corrupt), grad = jax.value_and_grad(
                corrupted_metric, has_aux=True
            )(zeros)
            return jnp.sum((clean - corrupt) * grad, axis=-1)  # (B, S)

        return jax.vmap(one)(feats)

    return prefix_args, suffix_tree, chunk_step


def fast_attribution_maps(
    model,
    hook: str,
    sae: Sae,
    batch: dict,
    metric,
    indices,
    feature_batch: int = 8,
    progress: bool = True,
):
    """Prefix/suffix attribution: the TPU-first hot path for a single hooked
    layer (the flagship config — one SAE at layers.24).

    Everything *below* the splice point is feature-independent: layers
    0..hook run ONCE (the prefix), as does the (B·S, width) pre-activation
    matmul.  Per feature only the suffix runs — mask-and-reselect top-k from
    a precomputed top-(k+1), sparse decode, then layers hook+1..L with
    gradient w.r.t. a zero delta at the splice — vmapped `feature_batch`
    wide.  vs the general path (full fwd+bwd per feature, reference
    attribution.py:116-189) this cuts per-feature compute AND backward tape
    to the above-splice fraction of the network, which is what makes
    feature batching fit at real ~2.4k-token multimodal shapes on a 16 GB
    chip (VERDICT r2 item 4).

    Ablation equivalence: zeroing latent column f (reference
    patching/utils.py:43-47) then taking top-k is reproduced exactly from
    the raw top-(k+1): if f is among them, drop it and keep the best k of
    the rest; otherwise the top-k is unchanged.  Post-ReLU latents are
    >= 0, so a masked entry (set to -1) can never re-enter, and zero-valued
    selections — where index choice is tie-broken arbitrarily in both
    frameworks — contribute exactly 0 to the decode either way.

    Returns {hook: [(B, S) saliency per feature]} like the general path.
    """
    import collections as _collections

    indices = np.asarray(indices)

    # In-process data parallelism (`--dp N`): when the subject sits on a
    # ('data',) mesh (parallel/data_parallel.py shard_subject_model_dp —
    # params replicated, SAEs replicated alongside), the FEATURE axis is the
    # natural shard: commit each chunk's feature ids P('data') and GSPMD
    # partitions the vmapped suffix fwd+bwd per chip with zero collectives —
    # each chip carries only its features' backward tape, so the long-shape
    # F=1-per-chip boundary becomes F=dp per step.
    feature_sharding = None
    dp_min = 1
    mesh = getattr(model, "mesh", None)
    if mesh is not None and "data" in mesh.axis_names:
        from jax.sharding import NamedSharding, PartitionSpec as P

        feature_sharding = NamedSharding(mesh, P("data"))
        # The 'data' axis size, not the total device count: on a future
        # multi-axis mesh (('data','model')), rounding chunks to a multiple
        # of ALL devices inflates the OOM-retry floor by the model-axis
        # factor (review r5; identical on today's 1-D meshes).
        dp_min = int(mesh.shape["data"])
        # The chunk width must divide over the mesh: round up to a multiple
        # of dp (the ragged-tail pad below already tops chunks up to it).
        feature_batch = max(feature_batch, dp_min)
        feature_batch = ((feature_batch + dp_min - 1) // dp_min) * dp_min

    (wide_vals, wide_idx, clean), suffix_tree, chunk_step = (
        build_fast_attribution(model, hook, sae, batch, metric)
    )

    pbar = None
    if progress:
        try:
            from tqdm import tqdm

            pbar = tqdm(total=len(indices), desc="Calculating attribution")
        except ImportError:
            pass

    def run_chunk(chunk):
        feats = jnp.asarray(chunk, jnp.int32)
        if feature_sharding is not None:
            feats = jax.device_put(feats, feature_sharding)
        return np.asarray(
            chunk_step(
                suffix_tree,
                sae.params,
                wide_vals,
                wide_idx,
                clean,
                feats,
            )
        )

    out = _collections.defaultdict(list)
    i = 0
    while i < len(indices):
        chunk = indices[i : i + feature_batch]
        keep = len(chunk)
        if keep < feature_batch:  # ragged tail: pad then trim
            chunk = np.concatenate(
                [chunk, np.repeat(chunk[-1:], feature_batch - keep)]
            )
        try:
            sal = run_chunk(chunk)
        except Exception as e:  # noqa: BLE001
            # The vmapped backward tape scales with the feature batch; at
            # real multimodal prompt shapes a 16 GB chip fits F=1 only
            # (BASELINE.md attribution row).  Halve and retry instead of
            # dying mid-sweep.
            if "RESOURCE_EXHAUSTED" not in str(e) or feature_batch <= dp_min:
                raise
            # Halve but stay a multiple of the mesh size (dp_min=1 unsharded).
            feature_batch = max(
                dp_min, (feature_batch // 2 // dp_min) * dp_min
            )
            from ...logger import logger

            logger.warning(
                f"attribution feature batch OOMed; retrying with "
                f"feature_batch={feature_batch}"
            )
            continue
        out[hook].extend(list(sal[:keep]))
        i += keep
        if pbar:
            pbar.update(keep)
    return dict(out)


class Attribution:
    """Args mirror the reference (attribution.py:25-114): a multimodal model,
    tokenizer, SAE path, and a probing json of
    {"prompt", "answer", "baseline", "image"} rows."""

    def __init__(
        self,
        model,
        tokenizer,
        sae_path: str,
        data_path: str,
        selected_sae: Optional[str] = None,
        feature_batch: int = 0,
    ) -> None:
        # feature_batch 0 = auto (fast path picks by prompt length); the
        # general multi-hook path treats 0/1 as the per-feature loop.
        self.model = model
        self.tokenizer = tokenizer
        self.feature_batch = feature_batch

        if selected_sae is not None:
            if os.path.exists(sae_path):
                sae = Sae.load_from_disk(os.path.join(sae_path, selected_sae))
            else:
                sae = Sae.load_from_hub(sae_path, hookpoint=selected_sae)
            self.sae_dict = {selected_sae: sae}
        else:
            self.sae_dict = Sae.load_many(
                sae_path, local=os.path.exists(sae_path)
            )

        with open(data_path, "r") as f:
            self.data = json.load(f)

        from PIL import Image

        prompts, answers, images = [], [], []
        for item in self.data:
            prompts.append(item["prompt"])
            answers.append([str(item["answer"]), str(item["baseline"])])
            images.append(Image.open(item["image"]))

        # Tokenize prompts, dropping the BOS like the reference
        # (attribution.py:92-94); answers via convert_tokens_to_ids
        # (attribution.py:95-103).
        prompt_ids = [
            tokenizer(p)["input_ids"][1:] for p in prompts
        ]
        self.answer_ids = np.array(
            [
                [
                    tokenizer.convert_tokens_to_ids(a[0]),
                    tokenizer.convert_tokens_to_ids(a[1]),
                ]
                for a in answers
            ],
            dtype=np.int64,
        )
        # prepare_inputs right-pads ragged rows, but the metric reads
        # logits[:, -1] — re-pack to LEFT padding so the last position is
        # every row's last REAL token (the reference gets this from its
        # left-padding tokenizer, reference utils.py:233-241).
        from ...models.llava_next import _repack_left_padded

        self.batch = _repack_left_padded(
            self.model.prepare_inputs(images=images, prompt_ids=prompt_ids)
        )
        am = self.batch.get("attention_mask")
        if am is not None and np.asarray(am).all():
            # An all-ones mask is semantically absent; dropping it host-side
            # lets the flash path run segment-id-free (512-wide blocks, 3.4x
            # — llama.py flash_attention) through both the prefix capture
            # and the per-feature suffix forwards.
            self.batch = {
                k: v for k, v in self.batch.items() if k != "attention_mask"
            }
        self.metric = partial(
            get_logit_diff, answer_token_indices=jnp.asarray(self.answer_ids)
        )

    def get_attribution(
        self, indices: Optional[List[int]] = None
    ) -> Dict[str, List[np.ndarray]]:
        saes = list(self.sae_dict.values())
        if indices is None:
            first = saes[0]
            indices = np.arange(first.cfg.num_latents_for(first.d_in))
        indices = np.asarray(indices)

        if len(self.sae_dict) == 1 and hasattr(self.model, "forward_from_layer"):
            # Single splice point: the prefix/suffix fast path (per-feature
            # work = only the layers above the hook; see
            # fast_attribution_maps).
            ((hook, sae),) = self.sae_dict.items()
            fb = self.feature_batch
            if not fb or fb < 1:
                # Auto width (config feature_batch=0): measured at the 8B
                # flagship — F=32 wins at S=64, while at the real ~2.4k-token
                # multimodal shape even F=2's backward tape exceeds a 16 GB
                # chip, and every OOM retry costs a full suffix compile
                # (BASELINE.md attribution row).
                fb = 32 if _seq_len(self.batch) < 512 else 1
            return fast_attribution_maps(
                self.model,
                hook,
                sae,
                self.batch,
                self.metric,
                indices,
                feature_batch=fb,
            )

        names = tuple(self.sae_dict.keys())
        zeros = {
            name: jnp.zeros(
                (len(self.data), _seq_len(self.batch), self.sae_dict[name].d_in)
            )
            for name in names
        }

        # Clean spliced forward — feature-independent, computed once.
        _, clean_cache = spliced_forward_with_delta(
            self.model, self.batch, self.sae_dict, zeros, off_feature=None
        )

        def corrupted_metric(deltas, feature_idx):
            logits, cache = spliced_forward_with_delta(
                self.model, self.batch, self.sae_dict, deltas, off_feature=feature_idx
            )
            return self.metric(logits), cache

        grad_fn = jax.value_and_grad(corrupted_metric, argnums=0, has_aux=True)

        def step(feature_idx):
            (_, corrupted_cache), grads = grad_fn(zeros, feature_idx)
            out = {}
            for name in names:
                attribution = (clean_cache[name] - corrupted_cache[name]) * grads[name]
                out[name] = attribution.sum(axis=-1)  # (B, S)
            return out

        if self.feature_batch > 1:
            step = jax.vmap(step)
            chunks = [
                jnp.asarray(indices[i : i + self.feature_batch])
                for i in range(0, len(indices), self.feature_batch)
            ]
        else:
            chunks = None

        attribution_dict = collections.defaultdict(list)
        try:
            from tqdm import tqdm

            pbar = tqdm(total=len(indices), desc="Calculating attribution")
        except ImportError:
            pbar = None

        if chunks is None:
            jit_step = jax.jit(step)
            for idx in indices:
                out = jit_step(jnp.asarray(idx))
                for name in names:
                    attribution_dict[name].append(np.asarray(out[name]))
                if pbar:
                    pbar.update(1)
        else:
            jit_step = jax.jit(step)
            for chunk in chunks:
                if chunk.shape[0] != self.feature_batch:
                    # ragged tail: pad then trim
                    pad = self.feature_batch - chunk.shape[0]
                    full = jnp.concatenate([chunk, jnp.repeat(chunk[-1:], pad)])
                    out = jit_step(full)
                    keep = chunk.shape[0]
                else:
                    out = jit_step(chunk)
                    keep = chunk.shape[0]
                for name in names:
                    arr = np.asarray(out[name])[:keep]  # (chunk, B, S)
                    attribution_dict[name].extend(list(arr))
                if pbar:
                    pbar.update(keep)

        return attribution_dict


def _seq_len(batch: dict) -> int:
    ids = batch["input_ids"]
    return int(np.asarray(ids).shape[-1])
