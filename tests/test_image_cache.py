"""FeatureImageCache end-to-end with a tiny LLaVA-NeXT: the cache_image flow
(bare "<image>" prompt → multimodal capture → BOS-dropped COO cache → splits
on disk → loader read-back), checked against a dense torch.topk oracle on the
same captured hiddens (reference cache.py:312-429)."""

import numpy as np
import pytest

import jax

from multimodal_sae_tpu.config import FeatureConfig, SaeConfig
from multimodal_sae_tpu.features import FeatureDataset, FeatureImageCache
from multimodal_sae_tpu.models.llava_next import (
    LlavaNextConfig,
    LlavaNextModel,
    llava_params_from_state_dict,
)
from multimodal_sae_tpu.sae import Sae

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
from PIL import Image

IMG_TOKEN = 250
HOOK = "model.layers.1"


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


def test_image_cache_flow(llava, tmp_path):
    rng = np.random.default_rng(0)
    sae = Sae(32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(1))
    images = [
        Image.fromarray(rng.integers(0, 255, (40, 50, 3), dtype=np.uint8))
        for _ in range(4)
    ]
    dataset = [{"image": im} for im in images]
    # Bare "<image>" prompt with BOS, as launch.cache.cache_image builds it.
    prompt_ids = [1, IMG_TOKEN]

    def capture_fn(batch):
        prepared = llava.prepare_inputs(
            images=[im.convert("RGB") for im in batch["image"]],
            prompt_ids=[prompt_ids for _ in batch["image"]],
        )
        return llava.capture(prepared, [HOOK])

    cache = FeatureImageCache(capture_fn, {HOOK: sae}, batch_size=2, shard_size=0)
    cache.run(64, dataset, progress=False)
    cache.save_splits(2, str(tmp_path / "cache"), rank=0)
    cache.concate_safetensors(2, str(tmp_path / "cache"))

    # Oracle: same captured hiddens, BOS dropped, dense torch.topk.
    locs_by_feature = {}
    for bi, batch_start in enumerate(range(0, 4, 2)):
        h = np.asarray(
            capture_fn({"image": images[batch_start : batch_start + 2]})[HOOK],
            np.float32,
        )[:, 1:, :]
        lat = np.maximum(
            (h - np.asarray(sae.params["b_dec"]))
            @ np.asarray(sae.params["W_enc"])
            + np.asarray(sae.params["b_enc"]),
            0,
        )
        tk = torch.topk(torch.tensor(lat), 4, dim=-1)
        mask = np.zeros(lat.shape, dtype=bool)
        np.put_along_axis(mask, tk.indices.numpy(), True, axis=-1)
        mask &= lat != 0
        for b, s, f in np.argwhere(mask):
            locs_by_feature.setdefault(int(f), []).append(
                (batch_start + int(b), int(s), float(lat[b, s, f]))
            )

    ds = FeatureDataset(
        str(tmp_path / "cache"),
        FeatureConfig(width=64, n_splits=2, min_examples=1),
        modules=[HOOK],
    )
    outs = {o.feature.feature_index: o for buf in ds.buffers for o in buf}
    assert outs, "no features cached"
    checked = 0
    for f, out in outs.items():
        got = sorted(
            (int(r), int(c), float(a))
            for (r, c), a in zip(
                np.asarray(out.locations)[:, :2], np.asarray(out.activations)
            )
        )
        exp = sorted(locs_by_feature.get(f, []))
        assert [g[:2] for g in got] == [e[:2] for e in exp], f"feature {f}"
        np.testing.assert_allclose(
            [g[2] for g in got], [e[2] for e in exp], rtol=2e-3, atol=1e-5
        )
        checked += 1
    assert checked >= 5
    # BOS dropped: ctx positions fit in the post-BOS sequence.
    seq = np.asarray(
        capture_fn({"image": images[:2]})[HOOK]
    ).shape[1]
    max_ctx = max(
        int(np.asarray(o.locations)[:, 1].max()) for o in outs.values()
    )
    assert max_ctx <= seq - 2  # positions are 0..seq-2 after dropping BOS
