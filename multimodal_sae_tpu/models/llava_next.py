"""LLaVA-NeXT (anyres) multimodal model in JAX.

The reference consumes `LlavaNextForConditionalGeneration` from HF
`transformers` with forward hooks on `language_model` submodules
(reference features/cache.py:312-429, train/sae/sae/trainer.py:74-77).  This
is a ground-up JAX implementation (SURVEY.md §7 hard part #1): CLIP tower +
anyres tile packing + multimodal projector + LLaMA decoder with the functional
capture/intervention API.

Shape strategy for XLA: the anyres geometry (grid shape, unpadded size, token
count) is *host-side* math on the original image size; each distinct geometry
produces its own jit specialization (the pinpoint list is small, so the number
of distinct shapes is bounded — effectively a shape-bucketing scheme).

Numerics match HF `modeling_llava_next.py` (fp32): `hidden_states[-2]`
feature selection, "default" strategy (drop CLS), spatial_unpad packing with
`image_newline`, bicubic PIL preprocessing, and the processor's
`_get_number_of_features` token-expansion arithmetic.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from .clip_vit import (
    OPENAI_CLIP_MEAN,
    OPENAI_CLIP_STD,
    ClipVisionConfig,
    clip_vision_forward,
)
from .llama import LlamaConfig, greedy_generate, llama_forward, stack_layer_params
from .quant import leaf_dtype, qembed


DEFAULT_PINPOINTS = [[336, 672], [672, 336], [672, 672], [1008, 336], [336, 1008]]


@dataclass(frozen=True)
class LlavaNextConfig:
    text_config: LlamaConfig = field(default_factory=LlamaConfig)
    vision_config: ClipVisionConfig = field(default_factory=ClipVisionConfig)
    image_grid_pinpoints: Tuple = tuple(map(tuple, DEFAULT_PINPOINTS))
    image_token_index: int = 128256
    vision_feature_layer: int = -2
    vision_feature_select_strategy: str = "default"

    @classmethod
    def from_hf(cls, d: dict) -> "LlavaNextConfig":
        return cls(
            text_config=LlamaConfig.from_hf(d.get("text_config", {})),
            vision_config=ClipVisionConfig.from_hf(d.get("vision_config", {})),
            image_grid_pinpoints=tuple(
                map(tuple, d.get("image_grid_pinpoints", DEFAULT_PINPOINTS))
            ),
            image_token_index=d.get("image_token_index", 128256),
            vision_feature_layer=d.get("vision_feature_layer", -2),
            vision_feature_select_strategy=d.get(
                "vision_feature_select_strategy", "default"
            ),
        )


# --------------------------------------------------------------------------
# anyres geometry (host-side numpy; HF modeling_llava_next.py:41-146 and
# processing_llava_next.py:186-227 semantics)
# --------------------------------------------------------------------------
def select_best_resolution(
    original_size: Tuple[int, int], possible_resolutions
) -> Tuple[int, int]:
    """Pick the pinpoint maximizing effective resolution then minimizing
    waste. `original_size` is (height, width)."""
    original_height, original_width = original_size
    best_fit = None
    max_effective = 0
    min_wasted = float("inf")
    for height, width in possible_resolutions:
        scale = min(width / original_width, height / original_height)
        dw, dh = int(original_width * scale), int(original_height * scale)
        effective = min(dw * dh, original_width * original_height)
        wasted = width * height - effective
        if effective > max_effective or (
            effective == max_effective and wasted < min_wasted
        ):
            max_effective, min_wasted = effective, wasted
            best_fit = (height, width)
    return best_fit


def get_anyres_image_grid_shape(image_size, grid_pinpoints, patch_size: int):
    """(num_patch_height, num_patch_width) of the tile grid."""
    height, width = select_best_resolution(tuple(image_size), grid_pinpoints)
    return height // patch_size, width // patch_size


def image_size_to_num_patches(image_size, grid_pinpoints, patch_size: int) -> int:
    h, w = select_best_resolution(tuple(image_size), grid_pinpoints)
    return math.ceil(h / patch_size) * math.ceil(w / patch_size) + 1  # + base


def _unpadded_hw(
    orig_h: int, orig_w: int, grid_h_tokens: int, grid_w_tokens: int
) -> Tuple[int, int, int]:
    """Token grid (H, W) after unpadding, plus the padding removed per side.
    Mirrors HF `unpad_image` / `_get_unpadded_features` rounding exactly."""
    current_height, current_width = grid_h_tokens, grid_w_tokens
    original_aspect = orig_w / orig_h
    current_aspect = current_width / current_height
    if original_aspect > current_aspect:
        new_height = int(round(orig_h * (current_width / orig_w), 7))
        padding = (current_height - new_height) // 2
        return current_height - 2 * padding, current_width, padding
    else:
        new_width = int(round(orig_w * (current_height / orig_h), 7))
        padding = (current_width - new_width) // 2
        return current_height, current_width - 2 * padding, padding


def get_number_of_features(
    orig_h: int, orig_w: int, cfg: LlavaNextConfig
) -> int:
    """Total image tokens after packing (processor `_get_number_of_features`,
    used to expand the <image> placeholder). num_additional_image_tokens=1
    (CLS) then -1 for the "default" strategy, i.e. net base grid only."""
    vis = cfg.vision_config
    height = width = vis.image_size
    best_h, best_w = select_best_resolution(
        (orig_h, orig_w), cfg.image_grid_pinpoints
    )
    scale_h, scale_w = best_h // height, best_w // width
    patches_h = height // vis.patch_size
    patches_w = width // vis.patch_size
    cur_h, cur_w, _ = _unpadded_hw(orig_h, orig_w, patches_h * scale_h, patches_w * scale_w)
    unpadded = cur_h * cur_w
    newline = cur_h
    base = patches_h * patches_w + 1  # + CLS
    n = unpadded + newline + base
    if cfg.vision_feature_select_strategy == "default":
        n -= 1
    return n


# --------------------------------------------------------------------------
# preprocessing (host-side PIL/numpy; HF image_processing_llava_next.py parity)
# --------------------------------------------------------------------------
def preprocess_anyres(
    image,
    cfg: LlavaNextConfig,
    *,
    pad_to_patches: Optional[int] = None,
) -> Tuple[np.ndarray, Tuple[int, int]]:
    """PIL image → (num_patches, 3, S, S) float32 pixel values + (h, w) size.

    Pipeline (reference uses LlavaNextImageProcessor, features/cache.py:362-366):
    resized-original base tile + best-resolution resize/pad/divide tiles,
    rescale 1/255, normalize with CLIP mean/std. Bicubic PIL resizing matches
    HF's PIL backend bit-for-bit.
    """
    from PIL import Image

    vis = cfg.vision_config
    S = vis.image_size
    image = image.convert("RGB")
    orig_w, orig_h = image.size
    best_h, best_w = select_best_resolution((orig_h, orig_w), cfg.image_grid_pinpoints)

    # resize preserving aspect to fit inside best resolution
    scale = min(best_w / orig_w, best_h / orig_h)
    new_w = min(math.ceil(orig_w * scale), best_w)
    new_h = min(math.ceil(orig_h * scale), best_h)
    resized = image.resize((new_w, new_h), Image.BICUBIC)

    # center pad to the best resolution
    arr = np.asarray(resized)  # (h, w, 3) uint8
    pad_y, r_y = divmod(best_h - new_h, 2)
    pad_x, r_x = divmod(best_w - new_w, 2)
    padded = np.pad(
        arr, ((pad_y, pad_y + r_y), (pad_x, pad_x + r_x), (0, 0)), mode="constant"
    )

    # divide into SxS tiles, row-major
    tiles = []
    for i in range(0, best_h, S):
        for j in range(0, best_w, S):
            tiles.append(padded[i : i + S, j : j + S])

    base = np.asarray(image.resize((S, S), Image.BICUBIC))
    patches = [base] + tiles

    mean = np.asarray(OPENAI_CLIP_MEAN, dtype=np.float32)
    std = np.asarray(OPENAI_CLIP_STD, dtype=np.float32)
    out = np.stack(
        [((p.astype(np.float32) / 255.0) - mean) / std for p in patches]
    ).transpose(0, 3, 1, 2)

    if pad_to_patches is not None and out.shape[0] < pad_to_patches:
        out = np.concatenate(
            [
                out,
                np.zeros(
                    (pad_to_patches - out.shape[0], *out.shape[1:]), dtype=out.dtype
                ),
            ]
        )
    return out, (orig_h, orig_w)


# --------------------------------------------------------------------------
# device-side feature packing (per-geometry jit specialization)
# --------------------------------------------------------------------------
def pack_image_features(
    projected: jax.Array,
    image_newline: jax.Array,
    cfg: LlavaNextConfig,
    image_size: Tuple[int, int],
) -> jax.Array:
    """(num_patches, tokens_per_tile, D) → (num_image_tokens, D)
    spatial_unpad packing (HF pack_image_features, modeling_llava_next.py:282-347).

    `image_size` must be concrete (host ints) — it determines output shape.
    """
    vis = cfg.vision_config
    h = w = vis.image_size // vis.patch_size
    orig_h, orig_w = int(image_size[0]), int(image_size[1])

    base = projected[0]  # (h*w, D)
    if projected.shape[0] == 1:
        return jnp.concatenate([base, image_newline[None]], axis=0)

    nph, npw = get_anyres_image_grid_shape(
        (orig_h, orig_w), cfg.image_grid_pinpoints, vis.image_size
    )
    tiles = projected[1 : 1 + nph * npw]
    D = tiles.shape[-1]
    f = tiles.reshape(nph, npw, h, w, D)
    f = f.transpose(4, 0, 2, 1, 3)  # (D, nph, h, npw, w)
    f = f.reshape(D, nph * h, npw * w)

    cur_h, cur_w, pad = _unpadded_hw(orig_h, orig_w, nph * h, npw * w)
    if cur_h != nph * h:  # padding along height
        f = f[:, pad : nph * h - pad, :]
    elif cur_w != npw * w:
        f = f[:, :, pad : npw * w - pad]

    newline = jnp.broadcast_to(image_newline[:, None, None], (D, cur_h, 1))
    f = jnp.concatenate([f, newline], axis=2)  # (D, cur_h, cur_w+1)
    f = f.reshape(D, cur_h * (cur_w + 1)).T  # (tokens, D)
    return jnp.concatenate([base, f], axis=0)


def project_image_features(params: dict, cfg: LlavaNextConfig, pixel_values: jax.Array):
    """Vision tower → feature layer select → drop CLS → 2-layer GELU projector.
    pixel_values: (num_patches, 3, S, S). Returns (num_patches, h*w, D_txt)."""
    out = clip_vision_forward(
        params["vision_tower"],
        cfg.vision_config,
        pixel_values,
        feature_layer=cfg.vision_feature_layer,
    )
    feats = out["features"]
    if cfg.vision_feature_select_strategy == "default":
        feats = feats[:, 1:]
    p = params["projector"]
    x = feats @ p["linear_1"] + p["linear_1_bias"]
    x = jax.nn.gelu(x, approximate=False)
    return x @ p["linear_2"] + p["linear_2_bias"]


def _repack_left_padded(batch: dict) -> dict:
    """Re-pack a padded batch so every row's valid tokens sit at the END.

    `prepare_inputs` right-pads (matching the HF processor's capture-path
    default), but autoregressive generation appends at the right edge, so
    `greedy_generate` requires LEFT padding (llama.py monotonicity check).
    Rolling token ids before embedding keeps the <image> placeholder
    positions and the pixel tensors untouched."""
    amask = batch.get("attention_mask")
    if amask is None:
        return batch
    am = np.asarray(amask)
    ids = np.asarray(batch["input_ids"])
    if not (am == 0).any():
        return batch  # no padding anywhere
    # Re-packing is the identity for already-left-padded rows, so apply it
    # unconditionally when any padding exists.
    new_ids = np.zeros_like(ids)
    new_am = np.zeros_like(am)
    for i in range(am.shape[0]):
        valid = ids[i][am[i].astype(bool)]
        if len(valid):
            new_ids[i, -len(valid):] = valid
            new_am[i, -len(valid):] = 1
    return {**batch, "input_ids": new_ids, "attention_mask": new_am}


def _iv_cache_key(interventions) -> tuple:
    """Hashable jit-cache key part for an interventions dict — the static
    half of `models/llama.py _split_interventions` (one source of truth for
    the Intervention cache-key contract), with plain callables keyed by
    object identity: reusing the same closure hits the cache; its captured
    arrays are baked into that program. The cached jit closure keeps the
    callable alive, so id() cannot be recycled while the entry exists."""
    if not interventions:
        return ()
    from .llama import _split_interventions

    spec, _ = _split_interventions(interventions)
    return tuple(
        entry if len(entry) == 3 else (entry[0], id(entry[1])) for entry in spec
    )


class LlavaNextModel:
    """ActivationSource + full forward/generate for LLaVA-NeXT.

    params = {
        "vision_tower": clip tree, "projector": {...}, "image_newline": (D,),
        "language_model": llama tree,
    }

    Hookpoints are named "model.layers.{i}" to match the reference's paths on
    `llava.language_model` (reference README.md:66, trainer hookpoints).
    """

    HOOK_PREFIX = "model."

    def __init__(self, params: dict, cfg: LlavaNextConfig):
        # Stack the language model's per-layer params once (see LlamaModel:
        # generate would otherwise restack ~GBs per call).
        params = dict(params)
        params["language_model"] = stack_layer_params(params["language_model"])
        self.params = params
        self.cfg = cfg
        self._jit_cache: Dict = {}

    _JIT_CACHE_CAP = 64

    def _jit_cached(self, key, build):
        """LRU-capped compiled-program cache (review r5: the uncapped dict,
        with legacy closure interventions keyed by id(), retained every
        compiled executable AND its captured arrays forever while also
        recompiling per fresh closure — the same hazard llama.py's
        _GENERATE_CACHE caps at 64 with an eviction warning)."""
        fn = self._jit_cache.get(key)
        if fn is not None:
            # Refresh recency: dicts evict in insertion order.
            self._jit_cache[key] = self._jit_cache.pop(key)
            return fn
        if len(self._jit_cache) >= self._JIT_CACHE_CAP:
            evicted = next(iter(self._jit_cache))
            self._jit_cache.pop(evicted)
            from ..logger import logger

            logger.warning(
                f"llava jit cache full ({self._JIT_CACHE_CAP}); evicting "
                f"{evicted[0]!r} program — churning closure-based "
                "interventions? Use Intervention objects for stable keys"
            )
        fn = build()
        self._jit_cache[key] = fn
        return fn

    # ---- ActivationSource ------------------------------------------------
    def hookpoint_names(self) -> List[str]:
        return [
            f"{self.HOOK_PREFIX}layers.{i}"
            for i in range(self.cfg.text_config.num_hidden_layers)
        ]

    def layers_name(self) -> str:
        return f"{self.HOOK_PREFIX}layers"

    def resolve_widths(self, hookpoints: List[str]) -> Dict[str, int]:
        return {h: self.cfg.text_config.hidden_size for h in hookpoints}

    def _strip(self, name: str) -> str:
        return name[len(self.HOOK_PREFIX):] if name.startswith(self.HOOK_PREFIX) else name

    def prepare_inputs(self, images=None, input_ids=None, prompt_ids=None):
        """Host-side packing: preprocess images, expand <image> placeholders.

        Args:
            images: list of PIL images (or None for text-only).
            prompt_ids: token ids containing exactly one `image_token_index`
                placeholder per image (pre-expansion), list per batch row.
        Returns a batch dict for forward()/capture().  Rows are RIGHT-padded
        (matching the HF processor's capture-path default, which the BOS-drop
        cache path relies on); `generate` re-packs to left padding itself
        (`_repack_left_padded`).
        """
        if images is None:
            # Text-only batch: either arg names the rows. Ragged rows are
            # right-padded with a mask (review r5: a text dataset through
            # the attribution flow passes ragged prompt_ids and no
            # input_ids — np.asarray(None) was the old result).
            from .llama import pad_text_rows

            rows = input_ids if input_ids is not None else prompt_ids
            return pad_text_rows(rows)
        if prompt_ids is not None and len(prompt_ids) != len(images):
            # zip() below would silently truncate to the shorter list,
            # dropping prompt rows (or failing later with an opaque
            # IndexError when images outnumber rows).
            raise ValueError(
                f"prompt_ids rows ({len(prompt_ids)}) != images "
                f"({len(images)}): prepare_inputs pairs one image per row"
            )
        # Preprocess each DISTINCT image once (duplicate rows — steering
        # tiles one prompt — share the result, which the downstream
        # id(pv)-keyed feature memo in _embed_multimodal then reuses), on a
        # thread pool when the host has cores for it: anyres preprocessing
        # is ~22 ms/image of PIL/numpy work that releases the GIL, and the
        # one-process-per-host posture (--dp N) preps N x batch_size images
        # per step on this single process where the reference's
        # process-per-GPU layout got a core per device for free.
        import os as _os

        memo = {}
        unique = []
        for im in images:
            if id(im) not in memo:
                memo[id(im)] = None
                unique.append(im)
        n_workers = int(
            _os.environ.get("MMSAE_PREP_WORKERS", _os.cpu_count() or 1)
        )
        if len(unique) > 1 and n_workers > 1:
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(min(n_workers, len(unique))) as ex:
                results = list(
                    ex.map(lambda im: preprocess_anyres(im, self.cfg), unique)
                )
        else:
            results = [preprocess_anyres(im, self.cfg) for im in unique]
        for im, res in zip(unique, results):
            memo[id(im)] = res

        pixel_list, sizes, counts = [], [], []
        for im in images:
            pv, size = memo[id(im)]
            pixel_list.append(pv)
            sizes.append(size)
            counts.append(get_number_of_features(size[0], size[1], self.cfg))
        expanded = []
        tok = self.cfg.image_token_index
        for row, count in zip(prompt_ids, counts):
            out = []
            for t in row:
                if t == tok:
                    out.extend([tok] * count)
                else:
                    out.append(t)
            expanded.append(out)
        max_len = max(len(r) for r in expanded)
        ids = np.full((len(expanded), max_len), 0, dtype=np.int64)
        amask = np.zeros((len(expanded), max_len), dtype=np.int64)
        for i, r in enumerate(expanded):
            ids[i, : len(r)] = r
            amask[i, : len(r)] = 1
        return {
            "input_ids": ids,
            "attention_mask": amask,
            "pixel_values": pixel_list,
            "image_sizes": sizes,
        }

    def _project_pack_group_jit(self, pv_stacked, size, n_tokens):
        """ONE jitted dispatch for a group of same-geometry images: vision
        tower + projector + anyres pack, vmapped over the group."""
        key = ("projpack", pv_stacked.shape, tuple(size), str(pv_stacked.dtype))

        def build():
            cfg_ = self.cfg
            size_ = (int(size[0]), int(size[1]))

            @jax.jit
            def fn(vp, newline, pv):
                def one(p):
                    return pack_image_features(
                        project_image_features(vp, cfg_, p), newline, cfg_, size_
                    )

                return jax.vmap(one)(pv)

            return fn

        fn = self._jit_cached(key, build)
        out = fn(
            {
                "vision_tower": self.params["vision_tower"],
                "projector": self.params["projector"],
            },
            self.params["image_newline"],
            pv_stacked,
        )
        if out.shape[1] != n_tokens:
            # Explicit raise, not `assert` (stripped under python -O): a
            # packed-feature count that disagrees with the placeholder
            # expansion would silently scatter image features onto wrong
            # token positions (review r5).
            raise ValueError(
                f"anyres pack produced {out.shape[1]} features per image, "
                f"expected {n_tokens} (geometry {tuple(size)}) — "
                "pinpoint/processor mismatch"
            )
        return out

    def _embed_multimodal(self, batch: dict):
        """Text embeddings with image features scattered over <image> token
        positions (HF get_placeholder_mask + masked_scatter semantics).

        Device work per batch is a handful of jitted dispatches — one
        tower+pack call per distinct image *geometry* (vmapped over the
        group), then ONE embed+scatter whose feature gather rides flat index
        arrays — never per-row eager ops: on a high-latency dispatch path
        every eager op costs a round trip, and replicated rows (batched
        steering tiles one prompt) reference the same computed features
        through the index array instead of re-running the tower."""
        lm = self.params["language_model"]
        ids = np.asarray(batch["input_ids"])
        # Materialize ONE list of per-image pixel arrays up front: iterating
        # a stacked numpy array (a collated batch / HF BatchFeature) yields
        # fresh row-view objects on every pass, so the id()-keyed dedupe
        # below would miss itself on re-iteration.
        pv_rows = (
            list(batch["pixel_values"])
            if batch.get("pixel_values") is not None
            else []
        )
        if not pv_rows:
            return qembed(
                lm["embed_tokens"], jnp.asarray(ids), leaf_dtype(lm["embed_tokens"])
            )
        tok = self.cfg.image_token_index
        vis_size = self.cfg.vision_config.image_size

        # Pass 1 (host): dedupe images, group distinct ones by geometry.
        distinct = {}  # memo_key -> n_tokens
        groups = {}  # group_key -> list of (memo_key, pv, n_patches)
        for pv, size in zip(pv_rows, batch["image_sizes"]):
            memo_key = (id(pv), tuple(size))
            if memo_key in distinct:
                continue
            n_patches = image_size_to_num_patches(
                size, self.cfg.image_grid_pinpoints, vis_size
            )
            n_tokens = get_number_of_features(int(size[0]), int(size[1]), self.cfg)
            gkey = (n_patches, tuple(size))
            distinct[memo_key] = n_tokens
            groups.setdefault(gkey, []).append((memo_key, pv, n_patches))

        # Pass 2 (device): one tower+pack dispatch per geometry group.
        offsets = {}  # memo_key -> row offset into flat_feats
        flat_parts = []
        offset = 0
        dp_sharding = getattr(self, "batch_sharding", None)
        for gkey, members in groups.items():
            n_patches = members[0][2]
            stacked = jnp.stack(
                [jnp.asarray(pv)[:n_patches] for (_, pv, _) in members]
            )
            if dp_sharding is not None:
                # `--dp N`: shard the geometry group over the ('data',) mesh
                # so each chip runs the tower on its share of the images
                # (group sizes are data-dependent, hence the padded commit).
                from ..parallel.data_parallel import place_rows_padded

                stacked, n_grp = place_rows_padded(stacked, dp_sharding)
            n_tokens = distinct[members[0][0]]
            out = self._project_pack_group_jit(stacked, gkey[1], n_tokens)
            if dp_sharding is not None and out.shape[0] != n_grp:
                out = out[:n_grp]
            for i, (mk, _, _) in enumerate(members):
                offsets[mk] = offset + i * n_tokens
            flat_parts.append(out.reshape(-1, out.shape[-1]))
            offset += out.shape[0] * n_tokens
        flat_feats = (
            flat_parts[0]
            if len(flat_parts) == 1
            else jnp.concatenate(flat_parts, axis=0)
        )

        # Pass 3 (host): flat (row, col, feature-row) index arrays.
        rows, cols, fidx = [], [], []
        for b, (pv, size) in enumerate(zip(pv_rows, batch["image_sizes"])):
            memo_key = (id(pv), tuple(size))
            n_tokens = distinct[memo_key]
            positions = np.nonzero(ids[b] == tok)[0]
            if len(positions) != n_tokens:
                # Explicit raise, not `assert` (stripped under python -O):
                # this is the ONLY guard keeping the scatter index arrays
                # aligned when ids come from an external tokenizer instead
                # of prepare_inputs (review r5).
                raise ValueError(
                    f"row {b}: {len(positions)} <image> placeholder tokens "
                    f"!= {n_tokens} packed features — input_ids were not "
                    "expanded by prepare_inputs (or geometry mismatch)"
                )
            rows.append(np.full(n_tokens, b, np.int32))
            cols.append(positions.astype(np.int32))
            fidx.append(offsets[memo_key] + np.arange(n_tokens, dtype=np.int32))

        akey = (
            "assemble",
            ids.shape,
            flat_feats.shape,
            str(flat_feats.dtype),
            sum(len(r) for r in rows),
        )
        def build_afn():
            @jax.jit
            def afn(embed_tokens, ids, flat_feats, rows, cols, fidx):
                embeds = qembed(embed_tokens, ids, leaf_dtype(embed_tokens))
                return embeds.at[rows, cols].set(
                    flat_feats[fidx].astype(embeds.dtype)
                )

            return afn

        afn = self._jit_cached(akey, build_afn)
        return afn(
            lm["embed_tokens"],
            jnp.asarray(ids),
            flat_feats,
            jnp.asarray(np.concatenate(rows)),
            jnp.asarray(np.concatenate(cols)),
            jnp.asarray(np.concatenate(fidx)),
        )

    def forward(
        self,
        batch: dict,
        capture: Sequence[str] = (),
        interventions=None,
        return_logits: bool = True,
    ):
        """Full forward with the language model under ONE jitted program.

        Anyres packing makes the sequence length vary per image — the reason
        a naive jit would recompile per image (SURVEY.md §7 hard part #1).
        The inputs are right-padded (attention-masked) to a 128-token bucket,
        so the jit cache sees O(max_len/128) distinct shapes instead of one
        per image; outputs are sliced back to the true length.  Without this
        the 32-layer subject ran op-by-op eager on the flagship
        cache_image path."""
        embeds = self._embed_multimodal(batch)
        amask = batch.get("attention_mask")
        B, S = embeds.shape[:2]
        # Canonicalize (sorted) so permuted hookpoint orders share one
        # compiled program; remember the caller's spelling to round-trip the
        # captured keys exactly as passed ('layers.N' or 'model.layers.N').
        orig_by_stripped = {self._strip(c): c for c in capture}
        cap = tuple(sorted(orig_by_stripped))
        iv = (
            {self._strip(k): v for k, v in interventions.items()}
            if interventions
            else None
        )

        # Interventions (SAE splice deltas, steering clamps) are shaped to the
        # true sequence; those callers reuse one prompt shape, so they skip
        # the bucket-padding and jit on their exact shape instead.
        pad = (-S) % 128 if not iv else 0
        amask_np = (
            np.asarray(amask).astype(np.int32)
            if amask is not None
            else np.ones((B, S), np.int32)
        )
        n_rows = B
        dp_sharding = getattr(self, "batch_sharding", None)
        if dp_sharding is not None and iv and B % dp_sharding.mesh.devices.size:
            # Interventions are shaped to the TRUE batch (e.g. the general
            # attribution path's (B, S, d_in) splice deltas); padding rows
            # under them would trace a shape mismatch inside llama_forward.
            # A non-divisible intervened batch therefore runs unsharded
            # (replicated params, uncommitted rows) instead of padded.
            dp_sharding = None
        if dp_sharding is not None:
            # `--dp N`: commit the batch row-sharded over the ('data',) mesh;
            # GSPMD partitions the whole language-model forward along the
            # batch with zero collectives (parallel/data_parallel.py). Pad
            # rows (repeated last row) are sliced off with the seq pad below.
            from ..parallel.data_parallel import place_rows_padded

            embeds, n_rows = place_rows_padded(embeds, dp_sharding)
            B = embeds.shape[0]
            if B != n_rows:
                amask_np = np.concatenate(
                    [amask_np, np.repeat(amask_np[-1:], B - n_rows, axis=0)],
                    axis=0,
                )
        # A no-padding batch (uniform geometry — the common cache case) needs
        # no mask at all: bucket-pad keys are excluded by causality for every
        # real query, and pad-row outputs are sliced off below.  Passing None
        # keeps the flash path segment-id-free, which is what allows its
        # 512-wide blocks (llama.py flash_attention: the 512-block kernel
        # compiles only without segment ids; 3.4x on the anyres shape).
        all_ones = bool(amask_np.all())
        if pad:
            embeds = jnp.pad(embeds, ((0, 0), (0, pad), (0, 0)))
            amask_np = np.concatenate(
                [amask_np, np.zeros((B, pad), np.int32)], axis=1
            )

        key = ("fwd", cap, bool(return_logits), _iv_cache_key(iv))

        def build_fwd():
            text_cfg = self.cfg.text_config
            iv_fixed = iv  # legacy closures: captured in the program

            @jax.jit
            def fn(lm_params, embeds, amask, iv_args):
                from .llama import _rebuild_interventions, _split_interventions

                spec, _ = _split_interventions(iv_fixed)
                return llama_forward(
                    lm_params,
                    text_cfg,
                    inputs_embeds=embeds,
                    attention_mask=amask,
                    capture=cap,
                    interventions=_rebuild_interventions(spec, iv_args),
                    return_logits=return_logits,
                )

            return fn

        fn = self._jit_cached(key, build_fwd)
        from .llama import _split_interventions

        _, iv_args = _split_interventions(iv)
        out = dict(
            fn(
                self.params["language_model"],
                embeds,
                None if all_ones else jnp.asarray(amask_np),
                iv_args,
            )
        )
        if pad or n_rows != B:
            out["captured"] = {
                k: v[:n_rows, :S] for k, v in out["captured"].items()
            }
            if "logits" in out:
                out["logits"] = out["logits"][:n_rows, :S]
        out["captured"] = {
            orig_by_stripped[k]: v for k, v in out["captured"].items()
        }
        return out

    def capture(self, batch: dict, hookpoints: List[str]) -> Dict[str, jax.Array]:
        batch = self._maybe_prepare(batch)
        return self.forward(batch, capture=hookpoints, return_logits=False)[
            "captured"
        ]

    def suffix_params(self, hookpoint: str) -> dict:
        """Host-side slice of the language-model weights the suffix forward
        needs (see LlamaModel.suffix_params for the memory rationale;
        unsliced leaves alias the live buffers)."""
        from .llama import _hookpoint_layer_idx, suffix_params_above

        return suffix_params_above(
            self.params["language_model"],
            _hookpoint_layer_idx(self._strip(hookpoint)),
        )

    def forward_from_layer(
        self, hidden, hookpoint: str, batch: dict, last_logit_only: bool = True,
        suffix: Optional[dict] = None,
    ):
        """Resume the language-model forward from a hookpoint's output (the
        suffix half of attribution's prefix/suffix split; traceable — the
        vision tower and multimodal packing live entirely below any language
        hookpoint, so the suffix is pure text-side layers).  Pass
        `suffix=self.suffix_params(hookpoint)` from jitted callers so only
        the above-splice weights ride jit arguments."""
        from .llama import _hookpoint_layer_idx, forward_from_layer_above

        return forward_from_layer_above(
            self.params["language_model"],
            self.cfg.text_config,
            hidden,
            _hookpoint_layer_idx(self._strip(hookpoint)),
            attention_mask=batch.get("attention_mask"),
            last_logit_only=last_logit_only,
            suffix=suffix,
        )

    def _maybe_prepare(self, batch: dict) -> dict:
        """Accept raw multimodal batches ({"input_ids" with un-expanded
        <image> placeholders, "image"/"images": PIL list}) — the shape the
        mm-data trainer feeds (reference trainer.py:275-306) — and prepare
        them; already-prepared batches pass through."""
        images = batch.get("images", batch.get("image"))
        if images is None or "pixel_values" in batch:
            return batch
        if not isinstance(images, (list, tuple)):
            images = [images]
        if images[0] is None:
            return {k: v for k, v in batch.items() if k not in ("image", "images")}
        import numpy as _np

        ids = batch["input_ids"]
        rows = [_np.asarray(r).reshape(-1) for r in ids]
        amask = batch.get("attention_mask")
        if amask is not None:
            # Pre-padded raw batches: keep only the attended tokens per row
            # (works for either padding side) — re-preparing the full padded
            # rows would mark former pad tokens as real prompt tokens and
            # silently corrupt the captured activations.
            am = _np.asarray(amask).astype(bool)
            prompt_ids = [list(r[m[: len(r)]]) for r, m in zip(rows, am)]
        else:
            prompt_ids = [list(r) for r in rows]
        return self.prepare_inputs(images=list(images), prompt_ids=prompt_ids)

    def generate(
        self,
        batch: dict,
        max_new_tokens: int = 512,
        interventions=None,
        intervene_prefill_only: bool = True,
        eos_token_id: Union[int, Sequence[int], None] = None,
        do_sample: bool = False,
        temperature: float = 1.0,
        top_p: Optional[float] = None,
        prng_key=None,
    ):
        if eos_token_id is None:
            # Same checkpoint-config default as LlamaModel.generate.
            eos_token_id = (getattr(self, "generation_config", None) or {}).get(
                "eos_token_id"
            )
        batch = _repack_left_padded(batch)
        embeds = self._embed_multimodal(batch)
        iv = (
            {self._strip(k): v for k, v in interventions.items()}
            if interventions
            else None
        )
        ids = jnp.asarray(np.asarray(batch["input_ids"]))
        return greedy_generate(
            self.params["language_model"],
            self.cfg.text_config,
            ids,
            max_new_tokens=max_new_tokens,
            interventions=iv,
            intervene_prefill_only=intervene_prefill_only,
            eos_token_id=eos_token_id,
            inputs_embeds=embeds,
            attention_mask=batch.get("attention_mask"),
            do_sample=do_sample,
            temperature=temperature,
            top_p=top_p,
            prng_key=prng_key,
            batch_sharding=getattr(self, "batch_sharding", None),
        )


def llava_params_from_state_dict(sd: Dict, cfg: LlavaNextConfig, dtype=jnp.float32):
    """Map HF LlavaNextForConditionalGeneration keys (both pre- and post-4.52
    layouts) to our tree."""
    from .clip_vit import clip_params_from_state_dict
    from .hf_loader import _np, llama_params_from_state_dict

    def find_prefix(cands):
        for c in cands:
            if any(k.startswith(c) for k in sd):
                return c
        raise KeyError(f"none of {cands} found in state dict")

    vis_prefix = find_prefix(
        ["vision_tower.vision_model.", "model.vision_tower.vision_model."]
    )
    lm_prefix = find_prefix(
        ["language_model.model.", "model.language_model.model.", "model.language_model."]
    )
    proj_prefix = find_prefix(["multi_modal_projector.", "model.multi_modal_projector."])
    newline_key = find_prefix(["image_newline", "model.image_newline"])

    def t(key):
        return jnp.asarray(np.ascontiguousarray(_np(sd[key]).T), dtype=dtype)

    def v(key):
        return jnp.asarray(_np(sd[key]), dtype=dtype)

    lm = llama_params_from_state_dict(sd, cfg.text_config, dtype=dtype, prefix=lm_prefix)
    if "lm_head" not in lm and not cfg.text_config.tie_word_embeddings:
        for cand in ("lm_head.weight", "language_model.lm_head.weight"):
            if cand in sd:
                lm["lm_head"] = t(cand)
                break
    return {
        "vision_tower": clip_params_from_state_dict(
            sd, cfg.vision_config, dtype=dtype, prefix=vis_prefix
        ),
        "projector": {
            "linear_1": t(proj_prefix + "linear_1.weight"),
            "linear_1_bias": v(proj_prefix + "linear_1.bias"),
            "linear_2": t(proj_prefix + "linear_2.weight"),
            "linear_2_bias": v(proj_prefix + "linear_2.bias"),
        },
        "image_newline": v(newline_key),
        "language_model": lm,
    }


def load_llava_next(path: str, dtype=jnp.float32):
    """Local HF LLaVA-NeXT checkpoint dir -> (LlavaNextModel params, cfg)."""
    from .hf_loader import load_hf_config, load_hf_state_dict

    cfg = LlavaNextConfig.from_hf(load_hf_config(path))
    sd = load_hf_state_dict(path)
    return llava_params_from_state_dict(sd, cfg, dtype=dtype), cfg
