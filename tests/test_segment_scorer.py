"""SegmentScorer flow test with stub detector/segmentor backends: IoU math,
score schema (incl. the avg_iou bad-case convention and the -1 sentinel for
unexplainable features), and feature sharding."""

import json

import numpy as np
import pytest

import jax

from multimodal_sae_tpu.agents.scorers import SegmentScorer
from multimodal_sae_tpu.agents.scorers.segment.utils import (
    BoundingBox,
    DetectionResult,
    get_boxes,
    refine_masks,
)
from multimodal_sae_tpu.config import SaeConfig
from multimodal_sae_tpu.features import FeatureCache
from multimodal_sae_tpu.sae import Sae
from PIL import Image


def _make_cache(tmp_path, module="model.layers.24", width=64):
    """Synthetic COO cache with two features that fire on known image grids."""
    sae = Sae(16, SaeConfig(num_latents=width, k=4), key=jax.random.PRNGKey(0))
    fc = FeatureCache.__new__(FeatureCache)
    from multimodal_sae_tpu.features.cache import Cache

    fc.cache = Cache(shard_size=0, batch_size=4)
    fc.width = width
    rng = np.random.default_rng(0)
    # 6 images, feature 1 fires on the top-left patch quadrant of each.
    locs, acts = [], []
    for img in range(6):
        for feat in (0, 1):
            for pos in range(0, 2):  # positions 0,1 of the 2x2 grid (=4 tokens)
                locs.append([img, pos, feat])
                acts.append(3.0 + rng.random())
    fc.cache.feature_locations[module] = np.asarray(locs, dtype=np.int64)
    fc.cache.feature_activations[module] = np.asarray(acts, dtype=np.float32)
    fc.save_splits(1, str(tmp_path / "acts"), rank=0)
    fc.concate_safetensors(1, str(tmp_path / "acts"))
    return tmp_path / "acts"


class StubDetector:
    def __call__(self, image, candidate_labels, threshold):
        assert candidate_labels[0].endswith(".")
        w, h = image.size
        return [
            {
                "score": 0.9,
                "label": candidate_labels[0],
                "box": {"xmin": 0, "ymin": 0, "xmax": w, "ymax": h // 2},
            }
        ]


class StubSamProcessor:
    def __call__(self, images, input_boxes, return_tensors):
        class Inputs(dict):
            original_sizes = [images.size[::-1]]
            reshaped_input_sizes = [images.size[::-1]]

            def to(self, device):
                return self

        self._size = images.size
        return Inputs(boxes=input_boxes)

    def post_process_masks(self, masks, original_sizes, reshaped_input_sizes):
        return [masks]


class StubSegmentator:
    """Produces a mask covering the top half of the image."""

    def __init__(self, size=336):
        self.size = size

    def __call__(self, **inputs):
        class Out:
            pass

        out = Out()
        m = np.zeros((1, 1, self.size, self.size), dtype=np.float32) - 1.0
        m[:, :, : self.size // 2, :] = 1.0
        out.pred_masks = m
        return out


@pytest.fixture()
def scorer(tmp_path):
    acts_dir = _make_cache(tmp_path)
    expl_dir = tmp_path / "expl"
    expl_dir.mkdir()
    (expl_dir / "model.layers.24.json").write_text(
        json.dumps(
            [
                {"model.layers.24_feature0": "the top half region"},
                {"model.layers.24_feature1": "Unable to produce descriptions"},
            ]
        )
    )
    rng = np.random.default_rng(1)
    tokens = [
        {"image": Image.fromarray(rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)), "id": i}
        for i in range(6)
    ]
    s = SegmentScorer(
        explanation_dir=str(expl_dir),
        activation_dir=str(tmp_path / "acts"),
        tokens=tokens,
        processor=None,
        selected_layer="model.layers.24",
        width=64,
        n_splits=1,
        num_image_tokens=4,  # 2x2 activation grid
        min_examples=1,
        max_examples=2,
    )
    s.object_detector = StubDetector()
    s.segmentator = StubSegmentator()
    s.sam_processor = StubSamProcessor()
    return s


def test_segment_scorer_scores(scorer):
    scores = scorer()
    by_feature = {s["feature"]: s for s in scores}
    # Unexplainable feature gets the sentinel row.
    assert by_feature["model.layers.24_feature1"]["avg_iou"] == -1
    ok = by_feature["model.layers.24_feature0"]
    assert ok["k"] == 2 and len(ok["iou_scores"]) == 2
    # Feature 0 fires on the top row of the 2x2 grid. Bilinear mask upsampling
    # (threshold <224) smears the active region down to ~75% of the image
    # (224 is only reached at the inactive row's center), so IoU against the
    # stub's exact top-half mask is 0.5/0.75 = 2/3.
    for iou in ok["iou_scores"]:
        assert abs(iou - 2 / 3) < 0.02
    assert 0.70 < ok["activated_pct"] < 0.80
    assert ok["label"] == "the top half region"


def test_segment_utils():
    det = DetectionResult.from_dict(
        {"score": 0.5, "label": "x", "box": {"xmin": 1, "ymin": 2, "xmax": 3, "ymax": 4}}
    )
    assert det.box.xyxy == [1, 2, 3, 4]
    assert get_boxes([det]) == [[[1, 2, 3, 4]]]
    masks = refine_masks(np.ones((2, 1, 4, 4), dtype=np.float32))
    assert len(masks) == 2 and masks[0].dtype == np.uint8
