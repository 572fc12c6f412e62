"""Detection/segmentation helper types
(reference agents/scorers/segment/utils.py:9-108): bounding boxes, detection
results, and mask↔polygon refinement (cv2 when available)."""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Optional, Tuple

import numpy as np


@dataclass
class BoundingBox:
    xmin: int
    ymin: int
    xmax: int
    ymax: int

    @property
    def xyxy(self) -> List[float]:
        return [self.xmin, self.ymin, self.xmax, self.ymax]


@dataclass
class DetectionResult:
    score: float
    label: str
    box: BoundingBox
    mask: Optional[np.ndarray] = None

    @classmethod
    def from_dict(cls, detection_dict: Dict) -> "DetectionResult":
        return cls(
            score=detection_dict["score"],
            label=detection_dict["label"],
            box=BoundingBox(
                xmin=detection_dict["box"]["xmin"],
                ymin=detection_dict["box"]["ymin"],
                xmax=detection_dict["box"]["xmax"],
                ymax=detection_dict["box"]["ymax"],
            ),
        )


def mask_to_polygon(mask: np.ndarray) -> List[List[int]]:
    """Largest-contour polygon of a binary mask."""
    import cv2

    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    largest_contour = max(contours, key=cv2.contourArea)
    return largest_contour.reshape(-1, 2).tolist()


def polygon_to_mask(
    polygon: List[Tuple[int, int]], image_shape: Tuple[int, int]
) -> np.ndarray:
    """Fill a polygon into a binary mask."""
    import cv2

    mask = np.zeros(image_shape, dtype=np.uint8)
    pts = np.array(polygon, dtype=np.int32)
    cv2.fillPoly(mask, [pts], color=(255,))
    return mask


def get_boxes(results: List[DetectionResult]) -> List[List[List[float]]]:
    return [[result.box.xyxy for result in results]]


def refine_masks(masks, polygon_refinement: bool = False) -> List[np.ndarray]:
    """SAM output logits (N, C, H, W) → binary uint8 masks; optional polygon
    smoothing. Accepts torch tensors or numpy arrays."""
    masks = np.asarray(
        masks.cpu().float().numpy() if hasattr(masks, "cpu") else masks,
        dtype=np.float32,
    )
    masks = masks.transpose(0, 2, 3, 1).mean(axis=-1)
    masks = (masks > 0).astype(np.uint8)
    masks = list(masks)

    if polygon_refinement:
        for idx, mask in enumerate(masks):
            polygon = mask_to_polygon(mask)
            masks[idx] = polygon_to_mask(polygon, mask.shape)
    return masks
