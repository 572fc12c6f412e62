"""Feature example types and image-mask utilities.

Behavior-matched to the reference (reference sae_auto_interp/features/features.py):
`Example`/`ImageExample` records, `upsample_mask` bilinear activation-mask
upsampling (features.py:130-136) and `prepare_image_examples`' highlighted
region composites (features.py:51-90) — including the llava-hf quirk of using
the plain-resized image (not anyres-padded) for the base image feature
(reference comment features.py:69-73).  Tensors are numpy, images are PIL.
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from typing import List, Optional, Tuple, TypeVar, Union

import numpy as np
from PIL import Image


@dataclass
class Example:
    tokens: np.ndarray
    """(seq,) token ids."""

    activations: np.ndarray
    """(seq,) activation per token."""

    def __hash__(self) -> int:
        return hash(tuple(np.asarray(self.tokens).tolist()))

    def __eq__(self, other: "Example") -> bool:
        return np.asarray(self.tokens).tolist() == np.asarray(other.tokens).tolist()

    @property
    def max_activation(self):
        return float(np.max(self.activations))


@dataclass(eq=False)
class ImageExample(Example):
    image: Image.Image = None
    activation_image: Image.Image = None
    mask: Image.Image = None


ExampleType = TypeVar("ExampleType", bound=Union[Example, ImageExample])


def prepare_examples(tokens, activations) -> List[Example]:
    return [
        Example(tokens=np.asarray(toks), activations=np.asarray(acts))
        for toks, acts in zip(tokens, activations)
    ]


def upsample_mask(
    mask: np.ndarray,
    image_size: Tuple[int, int],
    value: int = 224,
    resample=Image.BILINEAR,
) -> Image.Image:
    """Binary activation mask → bilinear-upsampled PIL "L" mask
    (reference features.py:130-136): positions with activation < 1e-5 get
    `value` (background), active positions get 0, then resize."""
    mask = (np.asarray(mask) < 1e-5).astype(np.int32) * value
    mask_image = Image.fromarray(mask.astype(np.uint8), mode="L")
    return mask_image.resize(image_size, resample)


def prepare_image_examples(
    tokens, activations, images, processor=None, num_image_tokens: Optional[int] = None
) -> List[ImageExample]:
    """Build highlighted-region image examples (reference features.py:51-90).

    The first `num_image_tokens` positions of each activation row form a
    (patch, patch) grid (576→24×24 for CLIP-336, 729→27×27 for siglip-384);
    the grid is upsampled to a mask and composited so only activated regions
    of the (plain-resized) image remain visible.
    """
    if num_image_tokens is None:
        num_image_tokens = getattr(processor, "num_image_tokens", 576) if processor is not None else 576
    base_img_tokens = num_image_tokens
    # 576 -> 24x24 (CLIP-336), 729 -> 27x27 (siglip-384) like the reference
    # (features.py:55-57); any other square count maps generically.
    patch_size = int(round(base_img_tokens**0.5))
    assert patch_size * patch_size == base_img_tokens, base_img_tokens
    image_size = 384 if patch_size == 27 else 336

    activations = [np.asarray(a) for a in activations]
    base_image_activations = [
        a[:base_img_tokens].reshape(patch_size, patch_size) for a in activations
    ]

    upsampled_image_mask = [
        upsample_mask(a, (image_size, image_size)) for a in base_image_activations
    ]

    background = Image.new("L", (image_size, image_size), 0).convert("RGB")

    # llava-hf uses the simply-resized image (not the padded one) as the base
    # image feature; we align (reference features.py:69-77).
    resized_image = [im.resize((image_size, image_size)) for im in images]
    activation_images = [
        Image.composite(background, im, upsampled_mask).convert("RGB")
        for im, upsampled_mask in zip(resized_image, upsampled_image_mask)
    ]

    return [
        ImageExample(
            tokens=np.asarray(toks),
            activations=acts,
            image=image,
            activation_image=activation_image,
            mask=mask,
        )
        for toks, acts, image, activation_image, mask in zip(
            tokens, activations, images, activation_images, upsampled_image_mask
        )
    ]


@dataclass
class Feature:
    module_name: str
    feature_index: int

    def __repr__(self) -> str:
        return f"{self.module_name}_feature{self.feature_index}"


class FeatureRecord:
    """Explanation/example record for one feature
    (reference features.py:102-127)."""

    def __init__(self, feature: Feature):
        self.feature = feature
        self.train: Optional[List[ExampleType]] = None
        self.explanation: Optional[str] = None
        self.examples: Optional[List[ExampleType]] = None

    @property
    def max_activation(self):
        return self.examples[0].max_activation

    def save(self, directory: str, save_examples: bool = False):
        path = f"{directory}/{self.feature}.json"
        serializable = dict(self.__dict__)
        if not save_examples:
            serializable.pop("examples", None)
            serializable.pop("train", None)
            serializable.pop("test", None)
        serializable.pop("feature", None)
        with open(path, "wb") as f:
            f.write(json.dumps(serializable, default=_json_default).encode())


def _json_default(o):
    import dataclasses

    if dataclasses.is_dataclass(o) and not isinstance(o, type):
        # save_examples=True serializes Example/ImageExample dataclasses
        # (the reference's orjson handled dataclasses natively); their
        # array fields recurse back through this default.
        return dataclasses.asdict(o)
    if isinstance(o, np.ndarray):
        return o.tolist()
    if isinstance(o, (np.integer,)):
        return int(o)
    if isinstance(o, (np.floating,)):
        return float(o)
    try:
        from PIL.Image import Image as _PILImage
    except ImportError:  # pragma: no cover
        _PILImage = None
    if _PILImage is not None and isinstance(o, _PILImage):
        # ImageExample records carry PIL images; the reference's orjson
        # crashed on them too — serialize as base64 PNG instead.
        import base64
        import io

        buf = io.BytesIO()
        o.save(buf, format="PNG")
        return {"__pil_png_b64__": base64.b64encode(buf.getvalue()).decode()}
    raise TypeError(f"not JSON serializable: {type(o)}")
