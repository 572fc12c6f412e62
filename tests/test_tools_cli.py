"""End-to-end CLI test of tools/model_steering.py: a tiny local HF checkpoint
(model + fabricated GPT2-style tokenizer) drives the full user command and
must print original + steered generations."""

import json
import subprocess
import sys
from pathlib import Path

import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

REPO = Path(__file__).resolve().parent.parent


@pytest.fixture(scope="module")
def ckpt(tmp_path_factory):
    d = tmp_path_factory.mktemp("cli_ckpt")
    cfg = transformers.LlamaConfig(
        vocab_size=256,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=128,
    )
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).save_pretrained(d, safe_serialization=True)

    # Fabricated byte-level GPT2 tokenizer (works fully offline).
    vocab = {chr(33 + i): i for i in range(200)}
    vocab["<|endoftext|>"] = 200
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    (d / "tokenizer_config.json").write_text(
        json.dumps({"tokenizer_class": "GPT2Tokenizer", "model_max_length": 128})
    )
    return d


def test_model_steering_cli(ckpt, tmp_path):
    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae
    import jax

    sae_dir = tmp_path / "saes"
    Sae(32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0)).save_to_disk(
        sae_dir / "layers.1"
    )

    env = {
        "PYTHONPATH": str(REPO),
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        "HF_HUB_OFFLINE": "1",
    }
    result = subprocess.run(
        [
            sys.executable,
            str(REPO / "tools" / "model_steering.py"),
            "--model",
            str(ckpt),
            "--sae-path",
            str(sae_dir),
            "--module-name",
            "layers.1",
            "--feature_idx",
            "3",
            "--clamp-value",
            "80",
            "--text",
            "hello",
            "--pure-text",
        ],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    assert "Original" in result.stdout
    assert "Steering" in result.stdout


@pytest.fixture(scope="module")
def chat_ckpt(ckpt):
    """Checkpoint fixture with a minimal chat template for tools that call
    apply_chat_template."""
    cfg = json.loads((ckpt / "tokenizer_config.json").read_text())
    cfg["chat_template"] = (
        "{% for m in messages %}{{ m['content'][0]['text'] }}{% endfor %}"
    )
    (ckpt / "tokenizer_config.json").write_text(json.dumps(cfg))
    return ckpt


def _env():
    return {
        "PYTHONPATH": str(REPO),
        "JAX_PLATFORMS": "cpu",
        "PATH": "/usr/bin:/bin:/usr/local/bin",
        "HOME": "/root",
        "HF_HUB_OFFLINE": "1",
    }


def _make_sae_dir(tmp_path, module="layers.1"):
    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae
    import jax

    sae_dir = tmp_path / "saes"
    Sae(32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0)).save_to_disk(
        sae_dir / module
    )
    return sae_dir


def test_probe_activations_cli(chat_ckpt, tmp_path):
    """Text probe: top-k mean-activated features land in filters.json
    (reference tools/probe_activations.py)."""
    sae_dir = _make_sae_dir(tmp_path)
    out = tmp_path / "probe"
    result = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "probe_activations.py"),
            "--model", str(chat_ckpt),
            "--sae-path", str(sae_dir),
            "--module-name", "layers.1",
            "--text", "hello world",
            "--top-k", "5",
            "--save-to", str(out),
        ],
        capture_output=True, text=True, timeout=300, env=_env(),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    filters = json.loads((out / "filters.json").read_text())
    assert list(filters) == ["layers.1"]
    assert len(filters["layers.1"]) == 5
    assert all(0 <= f < 64 for f in filters["layers.1"])


def test_text_activation_vis_cli(chat_ckpt, tmp_path):
    """HTML heatmap: filtered features with saved explanations render as
    colored spans (reference tools/text_activation_vis.py)."""
    sae_dir = _make_sae_dir(tmp_path)
    exp_dir = tmp_path / "explanations"
    exp_dir.mkdir()
    (exp_dir / "layers_1.json").write_text(json.dumps([
        {"layers.1_feature3": "threes and threeness", "prompt": "p"},
        {"layers.1_feature7": "lucky sevens", "prompt": "p"},
    ]))
    (tmp_path / "filters.json").write_text(json.dumps({"layers.1": [3, 7, 9]}))
    out_html = tmp_path / "vis.html"
    result = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "text_activation_vis.py"),
            "--model-path", str(chat_ckpt),
            "--sae-path", str(sae_dir),
            "--explanation-dir", str(exp_dir),
            "--filters", str(tmp_path / "filters.json"),
            "--text", "hello world",
            "--save-path", str(out_html),
        ],
        capture_output=True, text=True, timeout=300, env=_env(),
    )
    assert result.returncode == 0, result.stderr[-2000:]
    html = out_html.read_text()
    assert "layers.1_feature3" in html and "threes and threeness" in html
    assert "layers.1_feature7" in html and "lucky sevens" in html
    # feature 9 has no saved explanation -> skipped
    assert "layers.1_feature9" not in html
    assert "background-color" in html


def test_create_filters_from_attribution_cli(ckpt, tmp_path):
    """Attribution safetensors -> filters json + saliency visuals
    (reference tools/create_filters_from_attribution.py)."""
    import numpy as np
    from PIL import Image
    from safetensors.numpy import save_file

    # "<image>" must tokenize atomically
    (ckpt / "added_tokens.json").write_text(json.dumps({"<image>": 201}))
    img = tmp_path / "probe.png"
    Image.fromarray(np.zeros((48, 48, 3), dtype=np.uint8)).save(img)
    probing = tmp_path / "probe.json"
    probing.write_text(json.dumps([{
        "prompt": "x a <image> b c d",
        "answer": "e", "baseline": "f", "image": str(img),
    }]))

    # token layout after BOS drop: [a, <image>, b, c, d] -> image pos 1,
    # expanded attribution seq = 1 + 576 + 3 text positions
    rng = np.random.default_rng(0)
    att = tmp_path / "attribution.safetensors"
    save_file({"model.layers.1": rng.random((64, 1 + 576 + 3), dtype=np.float32)}, str(att))

    result = subprocess.run(
        [
            sys.executable, str(REPO / "tools" / "create_filters_from_attribution.py"),
            "--attribution-path", str(att),
            "--filters-path", str(tmp_path / "filters"),
            "--probing-data", str(probing),
            "--tokenizer", str(ckpt),
            "-k", "5",
        ],
        capture_output=True, text=True, timeout=300, env=_env(), cwd=tmp_path,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    out = json.loads((tmp_path / "filters" / "filters_top_5_probe.json").read_text())
    assert set(out) == {"model.layers.1"}
    assert len(out["model.layers.1"]) == 10  # 5 image + 5 text features
    pngs = list((tmp_path / "attribution").glob("top_*_feature_*.png"))
    assert len(pngs) == 5
    assert (tmp_path / "model.layers.1_activations.html").exists()


def test_launch_steering_cli(chat_ckpt, tmp_path):
    """Large-scale steering CLI on a text-only subject model: per-feature
    original vs clamped continuations land in {module}.json
    (reference launch/features/steering.py)."""
    sae_dir = _make_sae_dir(tmp_path)
    (tmp_path / "filters.json").write_text(json.dumps({"layers.1": [3]}))
    result = subprocess.run(
        [
            sys.executable, "-m", "multimodal_sae_tpu.launch.features.steering",
            "-m", str(chat_ckpt),
            "--sae-path", str(sae_dir),
            "--filters", str(tmp_path / "filters.json"),
            "-t", "tell me a story",
            "-k", "40",
            "-s", str(tmp_path / "steer"),
        ],
        capture_output=True, text=True, timeout=500, env=_env(), cwd=REPO,
    )
    assert result.returncode == 0, result.stderr[-2000:]
    d = json.loads((tmp_path / "steer" / "layers.1.json").read_text())
    assert set(d) == {"layers.1_feature3"}
    entry = d["layers.1_feature3"]
    assert {"original_resps", "clamped_resps", "idx"} <= set(entry)
    assert isinstance(entry["original_resps"], str)
