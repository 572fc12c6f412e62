"""Multimodal SAE training end-to-end: the mm-data path (image collator →
raw-batch preparation in the LLaVA capture → trainer) runs and learns."""

import numpy as np
import pytest

import jax

from multimodal_sae_tpu.config import SaeConfig, TrainConfig
from multimodal_sae_tpu.models.llava_next import (
    LlavaNextConfig,
    LlavaNextModel,
    llava_params_from_state_dict,
)
from multimodal_sae_tpu.train import SaeTrainer
from multimodal_sae_tpu.train.collator import DataCollatorForImage

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from PIL import Image

IMG_TOKEN = 250


@pytest.fixture(scope="module")
def llava():
    cfg = transformers.LlavaNextConfig(
        vision_config=transformers.CLIPVisionConfig(
            hidden_size=48,
            intermediate_size=96,
            num_hidden_layers=2,
            num_attention_heads=4,
            image_size=32,
            patch_size=16,
        ),
        text_config=transformers.LlamaConfig(
            vocab_size=256,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
        ),
        image_grid_pinpoints=[[32, 64], [64, 32], [64, 64]],
        image_token_index=IMG_TOKEN,
    )
    torch.manual_seed(0)
    hf = transformers.LlavaNextForConditionalGeneration(cfg).eval()
    jcfg = LlavaNextConfig.from_hf(cfg.to_dict())
    return LlavaNextModel(llava_params_from_state_dict(dict(hf.state_dict()), jcfg), jcfg)


class Tok:
    padding_side = "right"
    model_max_length = 256
    pad_token_id = 0
    eos_token_id = 0


def test_mm_training_runs(llava, tmp_path):
    rng = np.random.default_rng(0)
    # Dataset rows like process_mm_data output: chat-templated ids containing
    # one un-expanded <image> placeholder, plus the PIL image.
    ds = []
    for i in range(8):
        ids = np.concatenate([[1, IMG_TOKEN], rng.integers(2, 200, size=6)])
        img = Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8))
        ds.append({"input_ids": ids, "image": img})

    cfg = TrainConfig(
        sae=SaeConfig(expansion_factor=4, k=4),
        batch_size=2,
        lr=3e-3,
        lr_warmup_steps=0,
        log_to_wandb=False,
        save_every=10_000,
        hookpoints=["model.layers.1"],
        run_name=str(tmp_path / "run"),
        mm_data=True,
    )
    trainer = SaeTrainer(cfg, ds, llava, collator=DataCollatorForImage(tokenizer=Tok()))

    from collections import defaultdict

    fvus = []
    from multimodal_sae_tpu.train.trainer import _iter_batches

    for _ in range(2):
        for batch in _iter_batches(ds, 2, collator=trainer.collator):
            m = {"model.layers.1": defaultdict(float)}
            trainer.step(batch, m)
            fvus.append(m["model.layers.1"]["fvu"])
    assert trainer.global_step == 8
    assert fvus[-1] < fvus[0]  # learning on multimodal activations
    trainer.save()
    assert (tmp_path / "run" / "model.layers.1" / "sae.safetensors").exists()


def test_collator_padless_tokenizer_keeps_content_eos():
    """With a pad-less (Llama-3-style) tokenizer the collator pads with EOS;
    genuine EOS tokens inside the conversation must still get attention 1 —
    an `ids != pad` mask would zero them (review r3)."""
    import numpy as np

    from multimodal_sae_tpu.train.collator import DataCollatorForImage

    class PadlessTok:
        pad_token_id = None
        eos_token_id = 2
        padding_side = "left"
        model_max_length = 100

    coll = DataCollatorForImage(PadlessTok())
    out = coll(
        [
            {"input_ids": np.array([1, 7, 2, 9, 2]), "image": None},
            {"input_ids": np.array([1, 5]), "image": None},
        ]
    )
    np.testing.assert_array_equal(out["attention_mask"][0], [1, 1, 1, 1, 1])
    # Row 1: left-padded with 3 EOS pads -> masked; real tokens kept.
    np.testing.assert_array_equal(out["attention_mask"][1], [0, 0, 0, 1, 1])
    np.testing.assert_array_equal(out["input_ids"][1], [2, 2, 2, 1, 5])
