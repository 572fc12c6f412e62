"""Interp-layer tests: async pipeline + explainers/scorers against a stub LLM
client, prompt formatting contracts, label refiner, clip scorer with injected
metric (SURVEY.md §4: LLM clients tested against stubs)."""

import asyncio
import json

import numpy as np
import pytest

from multimodal_sae_tpu.agents import (
    ImageExplainer,
    LabelRefiner,
    SimpleExplainer,
    SimpleScorer,
)
from multimodal_sae_tpu.agents.utils import highlight, normalize_examples
from multimodal_sae_tpu.features import Example, FeatureRecord
from multimodal_sae_tpu.features.features import Feature
from multimodal_sae_tpu.pipeline import Pipe, Pipeline, process_wrapper


class StubClient:
    """Canned-response async client."""

    def __init__(self, response):
        self.response = response
        self.calls = []

    async def generate(self, prompt, **kwargs):
        self.calls.append(prompt)
        return self.response


class StubTokenizer:
    def batch_decode(self, token_lists, **kw):
        return ["tok%d" % t[0] if isinstance(t, (list, np.ndarray)) else str(t) for t in token_lists]


def _record(n_examples=6, seq=8):
    rng = np.random.default_rng(0)
    rec = FeatureRecord(Feature("model.layers.24", 123))
    examples = []
    for i in range(n_examples):
        acts = np.zeros(seq, dtype=np.float32)
        acts[i % seq] = 5.0 - 0.1 * i
        examples.append(
            Example(tokens=rng.integers(0, 50, size=seq), activations=acts)
        )
    rec.examples = examples
    rec.train = examples[:5]
    return rec


def test_highlight_marks_spans():
    ex = Example(
        tokens=np.array([1, 2, 3, 4]), activations=np.array([0.0, 5.0, 5.0, 0.0])
    )
    out = highlight(1, ex, StubTokenizer(), threshold=0.6)
    assert "<<" in out and ">>" in out
    assert out.index("<<") < out.index(">>")


def test_simple_explainer_parses_explanation():
    client = StubClient("blah blah\n[EXPLANATION]: tokens about cats")
    explainer = SimpleExplainer(client, StubTokenizer())
    rec = _record()
    result = asyncio.run(explainer(rec))
    assert result.explanation == "tokens about cats"
    # few-shot prompt structure: system + 3 (user, assistant) pairs + query
    messages = client.calls[0]
    assert messages[0]["role"] == "system"
    assert len(messages) == 8
    assert "[EXPLANATION]" in messages[2]["content"]


def test_simple_explainer_unparseable():
    client = StubClient("no marker here")
    explainer = SimpleExplainer(client, StubTokenizer())
    result = asyncio.run(explainer(_record()))
    assert result.explanation == "Explanation could not be parsed."


def test_image_explainer_prompt_and_parse():
    from PIL import Image

    client = StubClient("[EXPLANATION]: mesh-like structures")
    explainer = ImageExplainer(client)
    rec = _record()
    for ex in rec.train:
        ex.activation_image = Image.new("RGB", (8, 8))
    result = asyncio.run(explainer(rec))
    assert result.explanation == "mesh-like structures"
    content = client.calls[0][-1]["content"]
    image_parts = [c for c in content if c.get("type") == "image_url"]
    assert len(image_parts) == 5
    assert image_parts[0]["image_url"]["url"].startswith("data:image/png;base64,")


def test_simple_scorer_groups_and_parses():
    client = StubClient("the scores are [3, 0, 1, 2, 3]")
    scorer = SimpleScorer(client, StubTokenizer())
    rec = _record(n_examples=12)
    rec.train = rec.examples[:12]
    rec.explanation = "test feature"
    result = asyncio.run(scorer(rec))
    # 12 train examples -> 3 groups of <=5
    assert len(client.calls) == 3
    assert result.scores == [[3, 0, 1, 2, 3]] * 3
    assert len(result.max_activations) == 3


def test_simple_scorer_drops_malformed():
    client = StubClient("I refuse to answer")
    scorer = SimpleScorer(client, StubTokenizer())
    rec = _record()
    rec.explanation = "x"
    result = asyncio.run(scorer(rec))
    assert result.scores == []


def test_label_refiner(tmp_path):
    client = StubClient("[ANSWER] Honda vehicles")
    refiner = LabelRefiner(client, {"f1": "long description of honda"})
    asyncio.run(refiner.refine())
    assert refiner.refine_features == {"f1": "Honda vehicles"}
    refiner.save_result(str(tmp_path / "refined.json"))
    assert json.loads((tmp_path / "refined.json").read_text()) == {
        "f1": "Honda vehicles"
    }


def test_pipeline_end_to_end():
    client = StubClient("[EXPLANATION]: something")
    explainer = SimpleExplainer(client, StubTokenizer())
    results = []

    def gen(collate):
        yield [_record(), _record()]

    pipe = Pipe(process_wrapper(explainer, postprocess=lambda r: results.append(r)))
    pipeline = Pipeline(gen, pipe)
    asyncio.run(pipeline.run(max_processes=2))
    assert len(results) == 2
    assert all(r.explanation == "something" for r in results)


def test_clip_scorer_with_injected_metric(tmp_path):
    from PIL import Image

    from multimodal_sae_tpu.agents import ClipScorer

    # explanation dir in the reference's {module}.json append-list format
    (tmp_path / "model.layers.24.json").write_text(
        json.dumps(
            [
                {"model.layers.24_feature1": "a red square", "prompt": "..."},
                {
                    "model.layers.24_feature2": "Unable to produce descriptions",
                    "prompt": "...",
                },
            ]
        )
    )
    img_dir = (
        tmp_path / "images" / "model_layers_24" / "model.layers.24_feature1" / "images"
    )
    img_dir.mkdir(parents=True)
    Image.new("RGB", (16, 16), (255, 0, 0)).save(img_dir / "top0.png")
    Image.new("RGB", (16, 16), (0, 0, 255)).save(img_dir / "top1.png")

    def metric(image, text):
        return 90.0 if np.asarray(image)[0, 0, 0] > 200 else 10.0

    scorer = ClipScorer(
        str(tmp_path), dataset_path=None, metric=metric, dataset=[], k=2
    )
    scores = scorer.run()
    by_feature = {s["feature"]: s for s in scores}
    assert by_feature["model.layers.24_feature1"]["avg_score"] == 50.0
    assert by_feature["model.layers.24_feature1"]["k"] == 2
    assert by_feature["model.layers.24_feature2"]["avg_score"] == -1


def test_load_explanation_format(tmp_path):
    from multimodal_sae_tpu.interp_utils import load_explanation

    (tmp_path / "m.json").write_text(
        json.dumps([{"m_feature0": "expl0", "prompt": "p"}, {"m_feature1": "expl1"}])
    )
    out = load_explanation(str(tmp_path))
    assert out == {"m_feature0": "expl0", "m_feature1": "expl1"}


def test_pipeline_collate_true_single_batch():
    """collate=True hands the pipeline one flat list of records."""
    client = StubClient("[EXPLANATION]: something")
    explainer = SimpleExplainer(client, StubTokenizer())
    results = []

    def gen(collate):
        records = [_record(), _record(), _record()]
        if collate:
            return records  # flat list, like FeatureDataset.load(collate=True)
        return iter([records])

    pipe = Pipe(process_wrapper(explainer, postprocess=lambda r: results.append(r)))
    pipeline = Pipeline(gen, pipe)
    asyncio.run(pipeline.run(max_processes=2, collate=True))
    assert len(results) == 3


def test_random_explanation_loader_excludes_own(tmp_path):
    """Control baseline must never hand back the feature's own explanation."""
    import random

    from multimodal_sae_tpu.agents import random_explanation_loader

    rec = _record()
    own = f"{rec.feature}.txt"
    (tmp_path / own).write_text(json.dumps("OWN"))
    (tmp_path / "model.layers.24_feature999.txt").write_text(json.dumps("OTHER"))
    random.seed(0)
    for _ in range(20):
        out = asyncio.run(random_explanation_loader(rec, str(tmp_path)))
        assert out.explanation == "OTHER"


def test_load_tokenizer_runs_on_installed_transformers(tmp_path):
    """Regression: the private _pad_token/_eos_token attrs are gone in
    modern transformers; load_tokenizer must use the public properties."""
    pytest.importorskip("tokenizers")
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    from multimodal_sae_tpu.interp_utils import load_tokenizer

    tok = Tokenizer(models.WordLevel({str(i): i for i in range(16)}, unk_token="0"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    PreTrainedTokenizerFast(
        tokenizer_object=tok, unk_token="0", eos_token="1"
    ).save_pretrained(tmp_path)
    tokenizer = load_tokenizer(str(tmp_path))
    assert tokenizer.padding_side == "left"
    assert tokenizer.pad_token == tokenizer.eos_token == "1"


def test_pipeline_isolates_record_failures():
    """Review r5: one record's failure must not abort the run (it previously
    re-raised out of as_completed, orphaning every in-flight task); a run
    where NOTHING succeeds still fails loudly."""
    import asyncio

    from multimodal_sae_tpu.pipeline import Pipeline

    done = []

    async def flaky(record):
        if record == 2:
            raise RuntimeError("boom")
        done.append(record)
        return record

    def gen(collate):
        return [[0, 1, 2, 3, 4]]

    asyncio.run(Pipeline(gen, flaky).run(max_processes=2))
    assert sorted(done) == [0, 1, 3, 4]

    async def always_fails(record):
        raise RuntimeError("endpoint down")

    with pytest.raises(RuntimeError, match="endpoint down"):
        asyncio.run(Pipeline(gen, always_fails).run(max_processes=2))


def test_load_explanation_skips_stray_files(tmp_path):
    """Review r5: a notes.txt or unparsable file in explanation_dir crashed
    every consumer at startup; now only *.json is read and unparsable json
    is warn-skipped."""
    import json as _json

    from multimodal_sae_tpu.interp_utils import load_explanation

    (tmp_path / "layers_1.json").write_text(
        _json.dumps([{"layers.1_feature0": "a cat", "prompt": "p"}])
    )
    (tmp_path / "notes.txt").write_text("not json at all")
    (tmp_path / "broken.json").write_text("{truncated")
    out = load_explanation(str(tmp_path))
    assert out == {"layers.1_feature0": "a cat"}
