"""Two-process driver for the segment-scoring CLI merge: runs the REAL
`launch.score.segment.main` (argv-parsed) against a synthetic activation
cache + explanation dir + refine cache, with injected skew on rank 1 before
the gather.  The scorer self-shards the explained-feature list by process
(`SegmentScorer._shard_features`); the per-rank score lists must concatenate
in rank order into ONE merged score json on rank 0.

The HF detector/SAM checkpoints are unreachable offline, so the driver
installs the deterministic stub backends from tests/test_segment_scorer.py
(top-half detector, box-fill segmentor) in place of `load_model` — every
other step of main() (arg parsing, dataset load, scorer construction and
self-sharding, the staged scoring pipeline, gather, rank-0 merge) runs real.
With the env vars unset this doubles as the world=1 oracle.
argv: <dataset_dir> <acts_dir> <expl_dir> <refine_cache> <save_score_path>."""

import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
)

from multimodal_sae_tpu.parallel import initialize_distributed  # noqa: E402


def _top_half_detect(images, labels):
    from multimodal_sae_tpu.agents.scorers.segment.utils import (
        BoundingBox,
        DetectionResult,
    )

    out = []
    for im, lab in zip(images, labels):
        w, h = im.size
        out.append(
            [
                DetectionResult(
                    score=0.9,
                    label=lab,
                    box=BoundingBox(xmin=0, ymin=0, xmax=w, ymax=h // 2),
                )
            ]
        )
    return out


def _box_fill_segment(images, boxes):
    import numpy as np

    out = []
    for im, per_image in zip(images, boxes):
        w, h = im.size
        masks = []
        for x0, y0, x1, y1 in per_image:
            m = np.zeros((h, w), dtype=np.uint8)
            m[y0:y1, x0:x1] = 1
            masks.append(m)
        out.append(masks)
    return out


def main():
    dataset_dir, acts_dir, expl_dir, refine_cache, save_path = sys.argv[1:6]
    initialize_distributed()
    import jax

    import transformers

    from multimodal_sae_tpu.agents.scorers.segment.segment_scorer import (
        SegmentScorer,
    )
    from multimodal_sae_tpu.launch.score import segment as segment_cli

    # Offline stand-ins: no processor download, stub detect/segment backends,
    # tiny loader thresholds.  The sharding/scoring/gather/merge stay real.
    transformers.AutoProcessor.from_pretrained = classmethod(
        lambda cls, *a, **kw: None
    )
    SegmentScorer.load_model = lambda self: None
    orig_init = SegmentScorer.__init__

    def tiny_init(self, *a, **kw):
        kw.update(
            num_image_tokens=4,
            min_examples=1,
            max_examples=2,
            detect_fn=_top_half_detect,
            segment_fn=_box_fill_segment,
        )
        orig_init(self, *a, **kw)

    SegmentScorer.__init__ = tiny_init

    if jax.process_index() == 1:
        orig_gather = segment_cli.gather_objects

        def late_gather(obj):
            time.sleep(3.0)
            return orig_gather(obj)

        segment_cli.gather_objects = late_gather

    sys.argv = [
        "segment",
        "--dataset-path", dataset_dir,
        "--activation-dir", acts_dir,
        "--explanation_dir", expl_dir,
        "--width", "64",
        "--n-splits", "1",
        "--refine-cache", refine_cache,
        "--save-score-path", save_path,
        "--selected-layer", "model.layers.24",
    ]
    segment_cli.main()


if __name__ == "__main__":
    main()
