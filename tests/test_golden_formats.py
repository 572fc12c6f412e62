"""Golden-format tests: lock the exact on-disk bytes of the interchange
formats (cache split safetensors, sae checkpoint) so format drift is caught
at the byte level (SURVEY.md §4 / §7 "preserve on-disk formats")."""

import hashlib
import json

import numpy as np

from multimodal_sae_tpu.features.cache import Cache, FeatureCache


def _tiny_cache(tmp_path):
    cache = Cache(shard_size=0, batch_size=2)
    # Deterministic COO stream.
    vals = np.zeros((2, 3, 2), dtype=np.float32)
    idx = np.zeros((2, 3, 2), dtype=np.int64)
    vals[0, 0] = [1.5, 0.25]
    idx[0, 0] = [1, 6]
    vals[1, 2] = [3.0, 2.0]
    idx[1, 2] = [0, 7]
    cache.add_topk(vals, idx, batch_number=0, module_path="m")
    cache.save()
    fc = FeatureCache.__new__(FeatureCache)
    fc.cache = cache
    fc.width = 8
    fc.save_splits(2, str(tmp_path), rank=0)
    fc.concate_safetensors(2, str(tmp_path))
    return tmp_path / "m"


def test_cache_split_bytes_golden(tmp_path):
    d = _tiny_cache(tmp_path)
    files = sorted(p.name for p in d.iterdir() if p.suffix == ".safetensors")
    assert files == ["0_3.safetensors", "4_7.safetensors"]
    # The r5 .featidx sidecars live alongside; the digest assertions below
    # are exactly what proves they never perturb the canonical split bytes.
    digests = {
        f: hashlib.sha256((d / f).read_bytes()).hexdigest()[:16] for f in files
    }
    # Locked byte-level goldens: locations int64 (N, 3) row-major ascending,
    # activations float32, safetensors header key order {activations,
    # locations}. Any writer change that alters bytes must be deliberate.
    assert digests == {
        "0_3.safetensors": "0f61c9b77b220bbc",
        "4_7.safetensors": "5847850f1d52b87d",
    }


def test_sae_checkpoint_layout(tmp_path):
    import jax

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae

    sae = Sae(8, SaeConfig(expansion_factor=2, k=2), key=jax.random.PRNGKey(0))
    sae.save_to_disk(tmp_path / "layers.0")
    cfg = json.loads((tmp_path / "layers.0" / "cfg.json").read_text())
    assert cfg == {
        "expansion_factor": 2,
        "normalize_decoder": True,
        "num_latents": 0,
        "k": 2,
        "multi_topk": False,
        "signed": False,
        "d_in": 8,
    }
    from safetensors import safe_open

    with safe_open(str(tmp_path / "layers.0" / "sae.safetensors"), framework="np") as f:
        keys = set(f.keys())
        assert keys == {"encoder.weight", "encoder.bias", "W_dec", "b_dec"}
        assert f.get_tensor("encoder.weight").shape == (16, 8)
        assert f.get_tensor("W_dec").shape == (16, 8)
