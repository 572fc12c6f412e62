"""Detection/segmentation helper types (behavior of reference
agents/scorers/segment/utils.py:9-108): bounding boxes, detection results,
mask↔polygon refinement (cv2 when available)."""

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
    def from_dict(cls, d: Dict) -> "DetectionResult":
        box = d["box"]
        return cls(
            score=d["score"],
            label=d["label"],
            box=BoundingBox(box["xmin"], box["ymin"], box["xmax"], box["ymax"]),
        )


def get_boxes(results: List[DetectionResult]) -> List[List[List[float]]]:
    """SAM's expected nested box layout: one outer batch of all boxes."""
    return [[r.box.xyxy for r in results]]


def mask_to_polygon(mask: np.ndarray) -> List[List[int]]:
    """Vertices of the largest contour of a binary mask."""
    import cv2

    contours, _ = cv2.findContours(
        mask.astype(np.uint8), cv2.RETR_EXTERNAL, cv2.CHAIN_APPROX_SIMPLE
    )
    biggest = max(contours, key=cv2.contourArea)
    return biggest.reshape(-1, 2).tolist()


def polygon_to_mask(
    polygon: List[Tuple[int, int]], image_shape: Tuple[int, int]
) -> np.ndarray:
    """Rasterize a polygon into a binary mask."""
    import cv2

    canvas = np.zeros(image_shape, dtype=np.uint8)
    cv2.fillPoly(canvas, [np.asarray(polygon, dtype=np.int32)], color=(255,))
    return canvas


def refine_masks(masks, polygon_refinement: bool = False) -> List[np.ndarray]:
    """SAM output logits (N, C, H, W) → binary uint8 masks, channel-averaged
    and thresholded at zero; optional polygon smoothing.  Accepts torch
    tensors or numpy arrays."""
    if hasattr(masks, "cpu"):
        masks = masks.cpu().float().numpy()
    arr = np.asarray(masks, dtype=np.float32)
    binary = (arr.transpose(0, 2, 3, 1).mean(axis=-1) > 0).astype(np.uint8)
    out = list(binary)
    if polygon_refinement:
        out = [polygon_to_mask(mask_to_polygon(m), m.shape) for m in out]
    return out
