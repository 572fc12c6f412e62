"""End-to-end multimodal intervention tests with a tiny random LLaVA-NeXT:
steered generation through the SteeringController, and the Attribution class
over a probing json (the launch.features.attribution_patching flow)."""

import json

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.config import SaeConfig
from multimodal_sae_tpu.features.patching import Attribution
from multimodal_sae_tpu.features.steering import SteeringController
from multimodal_sae_tpu.models.llava_next import (
    LlavaNextConfig,
    LlavaNextModel,
    llava_params_from_state_dict,
)
from multimodal_sae_tpu.sae import Sae

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from PIL import Image

PINPOINTS = [[32, 64], [64, 32], [64, 64]]
IMG_TOKEN = 250
D = 64


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
            hidden_size=D,
            intermediate_size=128,
            num_hidden_layers=2,
            num_attention_heads=4,
            num_key_value_heads=2,
        ),
        image_grid_pinpoints=PINPOINTS,
        image_token_index=IMG_TOKEN,
    )
    torch.manual_seed(0)
    hf = transformers.LlavaNextForConditionalGeneration(cfg).eval()
    jcfg = LlavaNextConfig.from_hf(cfg.to_dict())
    params = llava_params_from_state_dict(dict(hf.state_dict()), jcfg)
    return LlavaNextModel(params, jcfg)


@pytest.fixture(scope="module")
def sae():
    return Sae(D, SaeConfig(num_latents=256, k=8), key=jax.random.PRNGKey(0))


class FakeProcessor:
    """Minimal chat-template + tokenize + decode stub."""

    class tokenizer:
        @staticmethod
        def __call__(text, **kw):
            # "tokenize" by mapping characters; inject the image token for <image>
            ids = [1]
            for part in text.split("<image>"):
                ids += [2 + (ord(c) % 100) for c in part][:6]
                ids.append(IMG_TOKEN)
            ids.pop()  # drop trailing image token
            return {"input_ids": ids}

        @staticmethod
        def batch_decode(arr, **kw):
            return [" ".join(str(int(t)) for t in row) for row in np.asarray(arr)]

        @staticmethod
        def convert_tokens_to_ids(tok):
            return 2 + (ord(tok[0]) % 100)

    tokenizer = tokenizer()

    def apply_chat_template(self, conversation, add_generation_prompt=False, tokenize=False):
        text = conversation[0]["content"][0]["text"]
        has_image = any(c.get("type") == "image" for c in conversation[0]["content"])
        return ("<image>" if has_image else "") + text

    def __call__(self, text=None, **kw):
        return {"input_ids": np.asarray([self.tokenizer(text)["input_ids"]])}


def test_steering_controller_multimodal(llava, sae, tmp_path):
    img_path = tmp_path / "img.png"
    rng = np.random.default_rng(0)
    Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(img_path)

    controller = SteeringController(
        sae=sae,
        module_name="model.layers.1",
        feature_idx=[3, 7],
        model=llava,
        processor=FakeProcessor(),
        prompt="hi",
        image_path=str(img_path),
        k=100.0,
        max_new_tokens=4,
    )
    results = controller.run()
    assert set(results) == {
        "model.layers.1_feature3",
        "model.layers.1_feature7",
    }
    for r in results.values():
        assert isinstance(r["original_resps"], str)
        assert isinstance(r["clamped_resps"], str)
    # A massive clamp must perturb at least one feature's continuation.
    assert any(
        r["clamped_resps"] != r["original_resps"] for r in results.values()
    )


def test_batched_steering_matches_sequential_multimodal(llava, sae, tmp_path):
    """Multimodal batched steering: replicated image rows (vision tower memoized
    per unique pixel_values) must reproduce the sequential per-feature path."""
    img_path = tmp_path / "img.png"
    rng = np.random.default_rng(3)
    Image.fromarray(rng.integers(0, 255, (40, 60, 3), dtype=np.uint8)).save(img_path)

    def run(fbs):
        return SteeringController(
            sae=sae,
            module_name="model.layers.1",
            feature_idx=[3, 7, 21],
            model=llava,
            processor=FakeProcessor(),
            prompt="hi",
            image_path=str(img_path),
            k=100.0,
            max_new_tokens=4,
            feature_batch_size=fbs,
        ).run()

    assert run(1) == run(2)


def test_attribution_class_multimodal(llava, sae, tmp_path):
    # Hook layer 0 of the 2-layer model: the suffix (layer 1's attention)
    # mixes positions, so ablating a selected feature moves the last-token
    # metric and the saliency is genuinely nonzero.  (Hooking the FINAL
    # layer leaves no attention above the splice — saliency is then exactly
    # zero at non-final positions, and the old >0 assertion only passed on
    # float noise between the general path's two forwards.)
    rng = np.random.default_rng(1)
    img_path = tmp_path / "probe.png"
    Image.fromarray(rng.integers(0, 255, (50, 70, 3), dtype=np.uint8)).save(img_path)

    sae_dir = tmp_path / "saes"
    sae.save_to_disk(sae_dir / "model.layers.0")

    probing = [
        {"prompt": "<image> is a", "answer": "cat", "baseline": "dog", "image": str(img_path)}
    ]
    data_path = tmp_path / "probe.json"
    data_path.write_text(json.dumps(probing))

    class Tok:
        @staticmethod
        def __call__(text, **kw):
            ids = [1]
            for part in text.split("<image>"):
                ids += [2 + (ord(c) % 100) for c in part][:4]
                ids.append(IMG_TOKEN)
            ids.pop()
            return {"input_ids": ids}

        @staticmethod
        def convert_tokens_to_ids(tok):
            return 2 + (ord(tok[0]) % 100)

    attribution = Attribution(
        llava,
        Tok(),
        sae_path=str(sae_dir),
        data_path=str(data_path),
        selected_sae="model.layers.0",
    )
    # Attribute a feature the SAE actually selects (ablation bites) plus an
    # arbitrary one.
    h = llava.capture(attribution.batch, ["model.layers.0"])["model.layers.0"]
    enc = attribution.sae_dict["model.layers.0"].encode(
        np.asarray(h).reshape(-1, D)
    )
    selected = int(np.asarray(enc.top_indices)[0, 0])
    out = attribution.get_attribution(indices=[selected, 5])
    arr = out["model.layers.0"]
    assert len(arr) == 2
    # (batch, seq) saliency per feature; a nonzero gradient signal exists.
    assert arr[0].shape[0] == 1
    assert np.abs(arr[0]).sum() > 0

    # The fast prefix/suffix path (taken above) must match the general
    # full-forward path on the REAL multimodal model — this exercises the
    # bucket-padded capture + true-length suffix consistency, not just the
    # text-model math (tests/test_launch_integration.py).
    had = LlavaNextModel.forward_from_layer
    del LlavaNextModel.forward_from_layer
    try:
        general = attribution.get_attribution(indices=[selected, 5])
    finally:
        LlavaNextModel.forward_from_layer = had
    for a, b in zip(general["model.layers.0"], arr):
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)


def test_attribution_ragged_batch_matches_per_row(llava, sae, tmp_path):
    """Two probing rows whose images take different anyres geometries have
    different expanded lengths; the batch is re-packed to LEFT padding so
    the last-position metric reads each row's last REAL token.  Each row's
    saliency must match a single-row run."""
    rng = np.random.default_rng(3)
    paths = []
    for i, hw in enumerate(((50, 70), (90, 40))):  # different pinpoints
        p = tmp_path / f"probe{i}.png"
        Image.fromarray(rng.integers(0, 255, (*hw, 3), dtype=np.uint8)).save(p)
        paths.append(str(p))

    sae_dir = tmp_path / "saes"
    sae.save_to_disk(sae_dir / "model.layers.0")

    class Tok:
        @staticmethod
        def __call__(text, **kw):
            ids = [1]
            for part in text.split("<image>"):
                ids += [2 + (ord(c) % 100) for c in part][:4]
                ids.append(IMG_TOKEN)
            ids.pop()
            return {"input_ids": ids}

        @staticmethod
        def convert_tokens_to_ids(tok):
            return 2 + (ord(tok[0]) % 100)

    def probing_file(rows):
        p = tmp_path / f"probe_{len(rows)}_{rows[0]['image'][-6:-4]}.json"
        p.write_text(json.dumps(rows))
        return str(p)

    rows = [
        {"prompt": "<image> is a", "answer": "cat", "baseline": "dog",
         "image": paths[0]},
        {"prompt": "<image> shows some", "answer": "cat", "baseline": "dog",
         "image": paths[1]},
    ]
    batched = Attribution(
        llava, Tok(), sae_path=str(sae_dir), data_path=probing_file(rows),
        selected_sae="model.layers.0",
    )
    am = np.asarray(batched.batch["attention_mask"])
    assert (am[:, -1] == 1).all(), "batch must be left-padded"
    assert (am == 0).any(), "geometries must differ (ragged batch)"
    out2 = batched.get_attribution(indices=[5])["model.layers.0"][0]

    for r, row in enumerate(rows):
        single = Attribution(
            llava, Tok(), sae_path=str(sae_dir), data_path=probing_file([row]),
            selected_sae="model.layers.0",
        )
        ref = single.get_attribution(indices=[5])["model.layers.0"][0]
        L = ref.shape[1]
        # The metric means over the batch (reference get_logit_diff), so a
        # B-row batch scales each row's gradient — and saliency — by 1/B.
        np.testing.assert_allclose(
            out2[r, -L:] * len(rows), ref[0], rtol=2e-2, atol=2e-5,
        )
