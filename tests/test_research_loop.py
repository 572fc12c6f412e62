"""The reference's full research loop chained end-to-end on one tiny model:

    cache activations → explain features (stub LLM) → score explanations
    (stub LLM) → build a steering filter from the scores → steer the subject
    model with the filtered features.

Each stage consumes the previous stage's *on-disk* artifact in the reference
formats (COO splits, `{module}.json` explanation lists, `filters.json`),
exercising the same glue the launch CLIs use (reference launch/explain/
explain.py:23-127, launch/score/score.py, launch/features/steering.py)."""

import asyncio
import json
from functools import partial

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from multimodal_sae_tpu.agents import SimpleExplainer, SimpleScorer
from multimodal_sae_tpu.config import ExperimentConfig, FeatureConfig, SaeConfig
from multimodal_sae_tpu.features import FeatureCache, FeatureDataset
from multimodal_sae_tpu.features.constructors import pool_max_activation_windows
from multimodal_sae_tpu.features.samplers import sample, sample_with_explanation
from multimodal_sae_tpu.features.steering import clamp_features_max
from multimodal_sae_tpu.interp_utils import load_explanation, load_filter, load_saes
from multimodal_sae_tpu.launch.explain._writer import ModuleRowWriter
from multimodal_sae_tpu.models.hf_loader import load_llama
from multimodal_sae_tpu.models.llama import LlamaModel, llama_forward
from multimodal_sae_tpu.pipeline import Pipeline, process_wrapper
from multimodal_sae_tpu.sae import Sae


class StubClient:
    def __init__(self, response):
        self.response = response
        self.calls = []

    async def generate(self, prompt, **kwargs):
        self.calls.append(prompt)
        return self.response


class StubTokenizer:
    def batch_decode(self, token_lists, **kw):
        return [
            "tok%d" % t[0] if isinstance(t, (list, np.ndarray)) else str(t)
            for t in token_lists
        ]


def test_research_loop(tmp_path):
    # ---- subject model + SAE ------------------------------------------------
    ckpt = tmp_path / "ckpt"
    hf_cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(hf_cfg).save_pretrained(ckpt, safe_serialization=True)
    params, cfg = load_llama(str(ckpt), dtype=jnp.float32)
    model = LlamaModel(params, cfg)

    sae_dir = tmp_path / "saes"
    Sae(32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0)).save_to_disk(
        sae_dir / "layers.1"
    )
    submodules = load_saes(str(sae_dir))

    # ---- stage 1: cache activations to COO splits on disk -------------------
    rng = np.random.default_rng(0)
    rows = [{"input_ids": rng.integers(0, 128, size=16)} for _ in range(8)]
    fc = FeatureCache(
        lambda batch: model.capture(batch, list(submodules)),
        submodules,
        batch_size=4,
        shard_size=0,
    )
    fc.run(n_tokens=16, tokens=rows, progress=False)
    cache_dir = tmp_path / "cache"
    fc.save_splits(2, str(cache_dir), rank=0)
    fc.concate_safetensors(2, str(cache_dir))

    # ---- stage 2: explain (cache → examples → stub LLM → {module}.json) -----
    tokens = np.stack([r["input_ids"] for r in rows])
    fcfg = FeatureConfig(
        width=64, n_splits=2, min_examples=1, example_ctx_len=8, max_examples=100
    )
    ecfg = ExperimentConfig(n_examples_train=4, train_type="top")
    dataset = FeatureDataset(str(cache_dir), fcfg, modules=["layers.1"])
    loader = partial(
        dataset.load,
        constructor=partial(pool_max_activation_windows, tokens=tokens, cfg=fcfg),
        sampler=partial(sample, cfg=ecfg),
    )

    explanation_dir = tmp_path / "explanations"
    explanation_dir.mkdir()
    explainer = SimpleExplainer(
        StubClient("[EXPLANATION]: mentions of widgets"),
        StubTokenizer(),
        verbose=True,
        activations=True,
    )

    writer = ModuleRowWriter(str(explanation_dir))

    def on_result(result):
        content, _reply, result = result
        module = result.record.feature.module_name.replace(".", "_")
        writer.append(
            f"{module}.json",
            {f"{result.record.feature}": f"{result.explanation}", "prompt": content},
        )
        return result

    pipeline = Pipeline(loader, process_wrapper(explainer, postprocess=on_result))
    asyncio.run(pipeline.run(max_processes=2))
    writer.close()

    explanations = load_explanation(str(explanation_dir))
    assert explanations, "explain stage produced no explanations"
    assert all(v == "mentions of widgets" for v in explanations.values())
    # Keys follow the reference's "{module}_feature{idx}" naming.
    assert all(k.startswith("layers.1_feature") for k in explanations)

    # ---- stage 3: score each explained feature with a stub judge ------------
    scorer = SimpleScorer(StubClient("scores: [3, 3, 2, 3]"), StubTokenizer())
    records = [
        rec
        for batch in loader(
            sampler=partial(
                sample_with_explanation, cfg=ecfg, explanations=explanations
            )
        )
        for rec in batch
    ]
    assert records
    results = [asyncio.run(scorer(rec)) for rec in records]
    mean_scores = {
        r.record.feature.feature_index: float(np.mean([s for g in r.scores for s in g]))
        for r in results
        if r.scores
    }

    # ---- stage 4: filter json from the scores --------------------------------
    keep = sorted(fi for fi, s in mean_scores.items() if s >= 2.0)
    assert keep, "no feature survived the score filter"
    filters_path = tmp_path / "filters.json"
    filters_path.write_text(json.dumps({"layers.1": keep}))

    # ---- stage 5: steer with the filtered features ---------------------------
    filters = load_filter(str(filters_path))
    np.testing.assert_array_equal(filters["layers.1"], keep)
    steer_saes = load_saes(str(sae_dir), filters)
    sae = steer_saes["layers.1"]

    ids = jnp.asarray([[1, 5, 9, 2, 7]])
    base = llama_forward(params, cfg, ids)["logits"]
    steered = llama_forward(
        params,
        cfg,
        ids,
        interventions={"layers.1": clamp_features_max(sae, int(keep[0]), 50.0)},
    )["logits"]
    assert base.shape == steered.shape
    assert not np.allclose(np.asarray(base), np.asarray(steered))

    # Filtered feature loading: the dataset restricted to the filter yields
    # only kept features (reference FeatureDataset filters by `features=`).
    filtered_ds = FeatureDataset(
        str(cache_dir), fcfg, modules=["layers.1"], features=filters
    )
    seen = sorted(
        out.feature.feature_index for buf in filtered_ds.buffers for out in buf
    )
    assert set(seen) <= set(keep)
