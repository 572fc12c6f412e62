"""IoU segment scorer
(reference agents/scorers/segment/segment_scorer.py:36-359): for each explained
feature, ground the (refined) label with a zero-shot detector, generate masks
with SAM, union them, and compute IoU against the SAE activation mask.

Differences from the reference are infrastructural only:
* feature-index self-sharding uses the process index instead of
  torch.distributed rank (reference segment_scorer.py:85-108);
* the detector/segmentor are injectable callables so the scorer runs against
  any backend (HF pipeline by default, a stub in tests).
Score-dict schema (`iou_scores`, `avg_iou` with the +1-per-bad-case
convention, `k`, `activated_pct`, `label`, -1 sentinel for unexplainable
features) matches exactly.
"""

from __future__ import annotations

import asyncio
import os
from functools import partial
from typing import Any, List, Optional, Tuple

import numpy as np
from PIL import Image

from ....config import FeatureConfig
from ....features import FeatureDataset
from ....features.constructors import (
    pool_max_activations_windows_image,
    random_activations_image,
)
from ....interp_utils import load_explanation
from ....logger import logger
from ....utils import natsorted
from .label_refiner import LabelRefiner
from .utils import DetectionResult, get_boxes, refine_masks


def _process_info():
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:  # pragma: no cover
        return 0, 1


class SegmentScorer:
    def __init__(
        self,
        explanation_dir: str,
        activation_dir: str,
        tokens,
        processor=None,
        selected_layer: str = "model.layers.24",
        width: int = 131072,
        n_splits: int = 1024,
        detector: str = "IDEA-Research/grounding-dino-base",
        segmentor: str = "facebook/sam-vit-huge",
        device: str = "cpu",
        threshold: float = 0.3,
        filters=None,
        num_image_tokens: Optional[int] = None,
        min_examples: int = 200,
        max_examples: int = 5,
    ) -> None:
        self.detector_id = detector
        self.segmentor_id = segmentor
        self.device = device
        self.threshold = threshold
        self.num_image_tokens = num_image_tokens
        self.min_examples = min_examples
        self.max_examples = max_examples
        self.explanation_dir = explanation_dir
        self.explanation = load_explanation(explanation_dir)
        self._image_processor = processor
        self.object_detector = None
        self.segmentator = None
        self.sam_processor = None
        self._maybe_shard(filters=filters)
        self._build_dataset(activation_dir, width, n_splits, selected_layer)
        self._init_loader(tokens, processor)

    def _build_dataset(self, activation_dir, width, n_splits, selected_layer):
        self.modules = os.listdir(activation_dir)
        self.width = width
        self.n_splits = n_splits
        self.activation_dir = activation_dir
        self.filters = {selected_layer: self.filters}
        self.feature_cfg = FeatureConfig(
            width=self.width,
            max_examples=self.max_examples,
            n_splits=n_splits,
            min_examples=self.min_examples,
        )
        self.dataset = FeatureDataset(
            activation_dir,
            cfg=self.feature_cfg,
            modules=self.modules,
            features=self.filters,
        )

    def _maybe_shard(self, filters=None):
        """Split the natsorted explained-feature list over processes
        (reference segment_scorer.py:85-108)."""
        self.rank, world = _process_info()
        self.features = natsorted(self.explanation.keys())
        chunk_size = len(self.features) if filters is None else len(filters)
        all_idx = np.arange(chunk_size)
        self.feature_idx = np.array_split(all_idx, world)[self.rank]
        self.filters = self.feature_idx
        keep = set(self.feature_idx.tolist())
        self.features = [f for i, f in enumerate(self.features) if i in keep]
        self.filtered_explanation = {
            k: v for k, v in self.explanation.items() if k in self.features
        }

    def _init_loader(self, tokens, processor):
        self.loader = partial(
            self.dataset.load,
            constructor=partial(
                pool_max_activations_windows_image,
                tokens=tokens,
                cfg=self.feature_cfg,
                processor=processor,
                num_image_tokens=self.num_image_tokens,
            ),
        )

    def refine(self, refiner: LabelRefiner, save_path):
        """Run the label refiner first (reference segment_scorer.py:121-124)."""
        asyncio.run(refiner.refine())
        self.explanation = refiner.refine_features
        refiner.save_result(save_path)

    def load_model(self):
        """Default backends: HF zero-shot detection pipeline + SAM
        (reference segment_scorer.py:126-136)."""
        from transformers import AutoModelForMaskGeneration, AutoProcessor, pipeline

        logger.info(f"Loading object detector : {self.detector_id}")
        self.object_detector = pipeline(
            model=self.detector_id,
            task="zero-shot-object-detection",
            device=self.device,
        )
        logger.info(f"Loading segmentor : {self.segmentor_id}")
        self.segmentator = AutoModelForMaskGeneration.from_pretrained(
            self.segmentor_id
        ).to(self.device)
        self.sam_processor = AutoProcessor.from_pretrained(self.segmentor_id)

    def __call__(self) -> Any:
        self.scores = []
        try:
            from tqdm import tqdm

            pbar = tqdm(total=len(self.features), desc="Perform scoring", disable=self.rank)
        except ImportError:
            pbar = None
        for records in self.loader():
            for record in records:
                explanation = self.explanation[f"{record.feature}"]
                if "Unable to produce descriptions" in explanation:
                    self.scores.append(
                        {
                            "feature": f"{record.feature}",
                            "iou_scores": [],
                            "avg_iou": -1,
                            "k": -1,
                            "activated_pct": -1,
                            "label": explanation,
                        }
                    )
                    if pbar:
                        pbar.update(1)
                    continue
                iou_scores = []
                activated_pct = []
                bad_cases = 0
                for idx, example in enumerate(record.examples):
                    image: Image.Image = example.image
                    mask: Image.Image = example.mask
                    image = image.resize(mask.size).convert("RGB")
                    try:
                        image_np, detections = self.grounded_segmentation(
                            image, [explanation]
                        )
                    except Exception:
                        logger.info(
                            f"Unable to grounded for feature : {record.feature} - Top {idx + 1}"
                        )
                        iou_scores.append(-1)
                        bad_cases += 1
                        continue
                    # Activation mask stores active regions as 0 and the
                    # background as >=224; invert to binary active=1
                    # (reference segment_scorer.py:176-181).
                    mask_np = np.array(mask)
                    mask_np = (mask_np < 224).astype(np.uint8)
                    target = np.zeros_like(mask_np)
                    for detection in detections:
                        target = np.logical_or(detection.mask, target)

                    iou_scores.append(self._calculate_iou(mask_np, target))
                    activated_pct.append(
                        mask_np.sum() / (mask.size[0] * mask.size[1])
                    )

                self.scores.append(
                    {
                        "feature": f"{record.feature}",
                        "iou_scores": iou_scores,
                        # Bad cases were appended as -1; the +bad_cases term
                        # cancels them out of the mean (reference :196).
                        "avg_iou": (sum(iou_scores) + bad_cases) / len(iou_scores)
                        if iou_scores
                        else -1,
                        "k": len(iou_scores),
                        "activated_pct": sum(activated_pct) / len(activated_pct)
                        if len(activated_pct) != 0
                        else 0,
                        "label": explanation,
                    }
                )
                if pbar:
                    pbar.update(1)
        return self.scores

    def _calculate_iou(self, mask: np.ndarray, target: np.ndarray) -> float:
        intersection = np.logical_and(target, mask)
        union = np.logical_or(target, mask)
        return float(np.sum(intersection) / np.sum(union))

    def grounded_segmentation(
        self, image: Image.Image, labels: List[str], polygon_refinement: bool = False
    ) -> Tuple[np.ndarray, List[DetectionResult]]:
        detections = self.detect(image, labels)
        detections = self.segment(image, detections, polygon_refinement)
        return np.array(image), detections

    def detect(self, image: Image.Image, labels: List[str]) -> List[DetectionResult]:
        """Zero-shot detection; labels get a trailing period
        (reference segment_scorer.py:224-239)."""
        labels = [label if label.endswith(".") else label + "." for label in labels]
        results = self.object_detector(
            image, candidate_labels=labels, threshold=self.threshold
        )
        return [DetectionResult.from_dict(result) for result in results]

    def segment(
        self,
        image: Image.Image,
        detection_results: List[DetectionResult],
        polygon_refinement: bool = False,
    ) -> List[DetectionResult]:
        """SAM masks for the detected boxes (reference segment_scorer.py:241-268)."""
        boxes = get_boxes(detection_results)
        inputs = self.sam_processor(
            images=image, input_boxes=boxes, return_tensors="pt"
        ).to(self.device)
        outputs = self.segmentator(**inputs)
        masks = self.sam_processor.post_process_masks(
            masks=outputs.pred_masks,
            original_sizes=inputs.original_sizes,
            reshaped_input_sizes=inputs.reshaped_input_sizes,
        )[0]
        masks = refine_masks(masks, polygon_refinement)
        for detection_result, mask in zip(detection_results, masks):
            detection_result.mask = mask
        return detection_results


class RandomSegmentScorer(SegmentScorer):
    """Random-image baseline (reference segment_scorer.py:315-359)."""

    def _init_loader(self, tokens, processor):
        self.loader = partial(
            self.dataset.load,
            constructor=partial(
                random_activations_image,
                tokens=tokens,
                cfg=self.feature_cfg,
                processor=processor,
                num_image_tokens=self.num_image_tokens,
            ),
        )
