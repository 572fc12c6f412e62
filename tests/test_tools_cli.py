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
