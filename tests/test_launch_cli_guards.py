"""Regression tests for launch-layer CLI guards: llava checkpoint detection
by config.json, fail-fast save-path validation, SkipRecord handling for
unexplained features, and load_artifacts tokenizer reuse."""

import json
import os

import numpy as np
import pytest


# ---- _is_llava_checkpoint ----------------------------------------------------
def _write_cfg(d, model_type):
    os.makedirs(d, exist_ok=True)
    with open(os.path.join(d, "config.json"), "w") as f:
        json.dump({"model_type": model_type}, f)


def test_llava_detection_prefers_config_json(tmp_path):
    from multimodal_sae_tpu.launch.utils import _is_llava_checkpoint

    # A plain-LLaMA checkpoint under an ancestor dir named "llava" must NOT
    # route to the LLaVA loader.
    llama_under_llava = tmp_path / "llava_experiments" / "llama3-8b"
    _write_cfg(str(llama_under_llava), "llama")
    assert not _is_llava_checkpoint(str(llama_under_llava))

    # A LLaVA checkpoint in a dir not named llava must still be detected.
    hidden_llava = tmp_path / "ckpt_a"
    _write_cfg(str(hidden_llava), "llava_next")
    assert _is_llava_checkpoint(str(hidden_llava))

    # Hub ids (not local dirs) keep the reference's name heuristic
    # (reference sae_auto_interp/utils.py:70).
    assert _is_llava_checkpoint("llava-hf/llama3-llava-next-8b-hf")
    assert not _is_llava_checkpoint("meta-llama/Meta-Llama-3-8B")


# ---- fail-fast save-path validation -------------------------------------------
def test_segment_cli_requires_save_paths(monkeypatch):
    from multimodal_sae_tpu.launch.score import segment

    base = ["prog", "--refine-cache", "cache.json"]
    monkeypatch.setattr("sys.argv", base)
    with pytest.raises(SystemExit):  # missing --save-score-path
        segment.parse_args()

    monkeypatch.setattr("sys.argv", ["prog", "--save-score-path", "s.json"])
    with pytest.raises(SystemExit):  # no refine cache and no save-refine-path
        segment.parse_args()

    monkeypatch.setattr(
        "sys.argv",
        ["prog", "--save-score-path", "s.json", "--refine-cache", "c.json"],
    )
    args = segment.parse_args()
    assert args.save_score_path == "s.json"


def test_steering_cli_requires_text_and_sae(monkeypatch):
    from multimodal_sae_tpu.launch.features import steering

    monkeypatch.setattr("sys.argv", ["prog", "--filters", "f.json"])
    with pytest.raises(SystemExit):
        steering.parse_argument()


# ---- SkipRecord ---------------------------------------------------------------
def test_sample_with_explanation_skips_unexplained():
    from multimodal_sae_tpu.config import ExperimentConfig
    from multimodal_sae_tpu.features import SkipRecord, sample_with_explanation
    from multimodal_sae_tpu.features.features import Example, Feature, FeatureRecord

    record = FeatureRecord(Feature("layers.0", 7))
    record.examples = [
        Example(np.array([1, 2, 3]), np.array([0.5, 1.0, 0.2]))
        for _ in range(20)
    ]
    cfg = ExperimentConfig(n_examples_train=2, train_type="top")
    # Explained feature: works as before.
    sample_with_explanation(
        record, cfg, explanations={f"{record.feature}": "a cat"}
    )
    assert record.explanation == "a cat"
    # Unexplained feature: raises SkipRecord instead of KeyError.
    with pytest.raises(SkipRecord):
        sample_with_explanation(record, cfg, explanations={})


def test_loader_drops_skipped_records(tmp_path):
    """FeatureDataset.load drops records whose sampler raises SkipRecord
    instead of aborting the run."""
    from test_features import _fill_cache_via_pipeline, L

    from multimodal_sae_tpu.config import FeatureConfig
    from multimodal_sae_tpu.features import FeatureDataset, SkipRecord

    _fill_cache_via_pipeline(tmp_path)
    cfg = FeatureConfig(width=L, n_splits=4, min_examples=1, max_examples=100)
    ds = FeatureDataset(str(tmp_path), cfg, modules=["layers.0"])

    total = sum(1 for buf in ds.buffers for _ in buf)
    assert total > 2

    ds2 = FeatureDataset(str(tmp_path), cfg, modules=["layers.0"])
    seen = {"n": 0}

    def skip_every_other(record):
        seen["n"] += 1
        if seen["n"] % 2 == 0:
            raise SkipRecord(str(record.feature))

    records = ds2.load(collate=True, sampler=skip_every_other)
    assert len(records) == total - total // 2


# ---- load_artifacts returns the tokenizer --------------------------------------
def test_load_artifacts_returns_tokenizer(tmp_path):
    from datasets import Dataset

    from multimodal_sae_tpu.__main__ import load_artifacts
    from multimodal_sae_tpu.config import RunConfig

    ds = Dataset.from_dict({"input_ids": [[1, 2, 3, 4]] * 8})
    ds_dir = str(tmp_path / "ds")
    ds.save_to_disk(ds_dir)

    args = RunConfig(model="synthetic://16,2,32", dataset=ds_dir)
    model, dataset, tokenizer = load_artifacts(args)
    assert tokenizer is None  # synthetic subject has no tokenizer
    assert len(dataset) == 8
    # load_any_dataset handled the save_to_disk dir (no ValueError
    # message-matching involved).
    assert "input_ids" in dataset.column_names


def test_validate_hookpoints_rejects_missing():
    """Cache CLIs fail fast on hookpoints the subject does not expose (wrong
    prefix / truncated layer) — otherwise a full run ends in silently-empty
    shards (review r5)."""
    import pytest

    from multimodal_sae_tpu.launch.utils import validate_hookpoints
    from multimodal_sae_tpu.models import SyntheticActivationSource

    model = SyntheticActivationSource(d_model=16, n_layers=4)
    validate_hookpoints(model, ["layers.0", "layers.3"])  # ok
    with pytest.raises(ValueError, match="layers.9"):
        validate_hookpoints(model, ["layers.9"])
    with pytest.raises(ValueError, match="model.layers.1"):
        validate_hookpoints(model, ["model.layers.1"])  # wrong prefix


def test_infer_n_splits(tmp_path):
    """Review r5: segment scoring's --n-splits defaults to the cache's
    actual split count (counted from the merged shard files) instead of a
    fixed number that silently disagreed with the cache CLI's default."""
    from multimodal_sae_tpu.launch.utils import infer_n_splits

    d = tmp_path / "model.layers.24"
    d.mkdir()
    for name in ("0_31.safetensors", "32_63.safetensors"):
        (d / name).write_bytes(b"")
    (d / "Rank0_0_31.safetensors").write_bytes(b"")  # unmerged shard: ignored
    assert infer_n_splits(str(tmp_path), "model.layers.24") == 2

    import pytest as _pytest

    with _pytest.raises(FileNotFoundError, match="selected-layer|module dir"):
        infer_n_splits(str(tmp_path), "model.layers.9")
    import shutil

    for f in d.glob("*_*.safetensors"):
        f.unlink()
    with _pytest.raises(FileNotFoundError, match="merged"):
        infer_n_splits(str(tmp_path), "model.layers.24")
