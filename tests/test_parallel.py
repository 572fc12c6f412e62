"""Parallelism tests on the 8-device virtual CPU mesh: tensor-parallel
placement of the subject model matches single-device numerics, the mm
collator's left-padding, and dataset sharding offsets."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from multimodal_sae_tpu.models.llama import LlamaConfig, init_llama_params, llama_forward
from multimodal_sae_tpu.parallel import (
    get_mesh,
    local_shard_bounds,
    shard_llama_params,
)


def test_tensor_parallel_matches_single_device():
    assert jax.device_count() >= 8
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        rope_theta=10000.0,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, size=(2, 6)))

    ref = llama_forward(params, cfg, ids)["logits"]

    mesh = get_mesh(("model",), devices=jax.devices()[:8])
    tp_params = shard_llama_params(params, mesh, axis="model")
    out = jax.jit(lambda p, i: llama_forward(p, cfg, i)["logits"])(tp_params, ids)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=2e-5, atol=2e-6)
    # Verify the parameters are actually distributed.
    shard0 = tp_params["layers"][0]["q_proj"].sharding
    assert len(shard0.device_set) == 8


def test_collator_left_padding():
    from multimodal_sae_tpu.train.collator import DataCollatorForImage

    class Tok:
        padding_side = "left"
        model_max_length = 100
        pad_token_id = 0
        eos_token_id = 0

    coll = DataCollatorForImage(tokenizer=Tok())
    batch = coll(
        [
            {"input_ids": np.array([5, 6, 7]), "image": None},
            {"input_ids": np.array([9]), "image": None},
        ]
    )
    np.testing.assert_array_equal(batch["input_ids"], [[5, 6, 7], [0, 0, 9]])
    np.testing.assert_array_equal(batch["attention_mask"], [[1, 1, 1], [0, 0, 1]])


def test_local_shard_bounds_cover():
    n, w = 103, 8
    spans = [local_shard_bounds(n, w, r) for r in range(w)]
    assert spans[0][0] == 0 and spans[-1][1] == n
    for (a, b), (c, d) in zip(spans, spans[1:]):
        assert b == c


def test_tensor_parallel_quantized_int8_matches_single_device():
    """int8-quantized subject over the TP mesh (q8 shards like the dense
    weight, per-channel scales follow the output dim) with native int8
    matmuls matches the single-device quantized forward."""
    import dataclasses

    from multimodal_sae_tpu.models.quant import quantize_llama_params

    assert jax.device_count() >= 8
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        rope_theta=10000.0,
        int8_matmul=True,
    )
    params = quantize_llama_params(
        init_llama_params(jax.random.PRNGKey(0), cfg)
    )
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, size=(2, 6)))

    ref = llama_forward(params, cfg, ids)["logits"]

    mesh = get_mesh(("model",), devices=jax.devices()[:8])
    tp_params = shard_llama_params(params, mesh, axis="model")
    out = jax.jit(lambda p, i: llama_forward(p, cfg, i)["logits"])(tp_params, ids)
    # int8 accumulators are integer-exact, but ±1-ulp bf16 reduce-order
    # wiggle at shard boundaries can flip a borderline round(x/sx) by one
    # int8 step — amplified to a full activation-grid unit (sx ≈ absmax/127).
    # Compare at grid-step granularity: tiny relative Frobenius error.
    a, b = np.asarray(out, np.float32), np.asarray(ref, np.float32)
    rel = np.linalg.norm(a - b) / np.linalg.norm(b)
    assert rel < 0.02, rel
    q = tp_params["layers"][0]["q_proj"]
    assert q["q8"].dtype == jnp.int8
    assert len(q["q8"].sharding.device_set) == 8
    assert len(q["scale"].sharding.device_set) == 8


def test_tensor_parallel_flash_attention_matches_single_device():
    """Flash attention (pure-jnp reference math off-TPU) composes with the
    ('model',) TP sharding — GSPMD partitions the attention by heads."""
    import dataclasses

    assert jax.device_count() >= 8
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        rope_theta=10000.0,
        flash_attention=True,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = jnp.asarray(np.random.default_rng(0).integers(0, 128, size=(2, 16)))
    ref = llama_forward(params, cfg, ids)["logits"]
    mesh = get_mesh(("model",), devices=jax.devices()[:8])
    tp = shard_llama_params(params, mesh, axis="model")
    out = jax.jit(lambda p, i: llama_forward(p, cfg, i)["logits"])(tp, ids)
    rel = float(
        jnp.linalg.norm(out - ref) / jnp.linalg.norm(ref)
    )
    assert rel < 1e-4, rel


def test_initialize_distributed_explicit_failure_raises(monkeypatch):
    """An explicitly configured multi-host job that cannot initialize must
    raise — not silently degrade to N independent world=1 runs."""
    import pytest as _pytest

    from multimodal_sae_tpu.parallel import initialize_distributed

    # JAX's backend is already initialized in this test process, so
    # jax.distributed.initialize() is guaranteed to fail fast.
    monkeypatch.setenv("COORDINATOR_ADDRESS", "127.0.0.1:1")
    monkeypatch.setenv("NUM_PROCESSES", "2")
    monkeypatch.setenv("PROCESS_ID", "0")
    with _pytest.raises(RuntimeError, match="refusing to continue"):
        initialize_distributed()


def test_initialize_distributed_metadata_probe_degrades(monkeypatch):
    """Single-worker TPU-VM metadata (one TPU_WORKER_HOSTNAMES entry, no
    coordinator config) is only an auto-probe: a failure means single-host."""
    from multimodal_sae_tpu.parallel import initialize_distributed

    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        monkeypatch.delenv(k, raising=False)
    monkeypatch.setenv("TPU_WORKER_HOSTNAMES", "localhost")
    assert initialize_distributed() is False


def test_data_parallel_capture_matches_single_device():
    """`--dp N` model-level parity: a LlamaModel with batch_sharding set
    captures bitwise-identical hiddens to the unsharded model — including a
    batch whose row count does NOT divide the mesh (padded commit + slice
    back, parallel/data_parallel.py place_rows_padded)."""
    from multimodal_sae_tpu.models.llama import LlamaModel
    from multimodal_sae_tpu.parallel import shard_subject_model_dp

    assert jax.device_count() >= 8
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=64,
        intermediate_size=128,
        num_hidden_layers=2,
        num_attention_heads=8,
        num_key_value_heads=8,
        rope_theta=10000.0,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    ref_model = LlamaModel(dict(params), cfg)
    dp_model = LlamaModel(dict(params), cfg)
    dp_model, mesh = shard_subject_model_dp(dp_model, 4)
    assert len(mesh.devices.ravel()) == 4

    rng = np.random.default_rng(0)
    for rows in (4, 8, 3):  # divisible, multiple, and padded-commit shapes
        batch = {"input_ids": rng.integers(0, 128, size=(rows, 6))}
        ref = ref_model.capture(batch, ["layers.1"])["layers.1"]
        out = dp_model.capture(batch, ["layers.1"])["layers.1"]
        assert out.shape == ref.shape == (rows, 6, 64)
        np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
    # The replicated params actually live on the 4-device mesh.
    assert len(dp_model.params["embed_tokens"].sharding.device_set) == 4


def test_place_rows_padded_roundtrip():
    """Non-divisible rows are padded by repeating the last row and reported
    back; divisible rows commit without padding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from multimodal_sae_tpu.parallel import get_mesh, place_rows_padded

    mesh = get_mesh(("data",), devices=jax.devices()[:4])
    sharding = NamedSharding(mesh, P("data"))
    x = jnp.arange(3 * 5, dtype=jnp.float32).reshape(3, 5)
    placed, n = place_rows_padded(x, sharding)
    assert n == 3 and placed.shape == (4, 5)
    np.testing.assert_array_equal(np.asarray(placed[:3]), np.asarray(x))
    np.testing.assert_array_equal(np.asarray(placed[3]), np.asarray(x[2]))
    y = jnp.ones((8, 5))
    placed, n = place_rows_padded(y, sharding)
    assert n == 8 and placed.shape == (8, 5)


def test_dp_and_tp_mutually_exclusive(tmp_path):
    """load_subject_model refuses --tp + --dp in one process."""
    from multimodal_sae_tpu.launch.utils import load_subject_model

    with pytest.raises(ValueError, match="mutually exclusive"):
        load_subject_model(str(tmp_path), tp=2, dp=2)


def test_steering_dp_matches_unsharded():
    """`--dp N` on steering: features ride the generate batch axis, and with
    the subject on a ('data',) mesh the whole generation (ids, masks, KV
    cache) commits row-sharded — each chip decodes its features' rows. The
    steered result dict must equal the unsharded controller's, including the
    ragged final chunk (topped up to a mesh multiple, extras dropped) and
    the B=1 unsteered baseline (non-divisible -> unsharded fallback)."""
    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.features.steering import SteeringController
    from multimodal_sae_tpu.models.llama import LlamaModel
    from multimodal_sae_tpu.parallel import replicate_saes, shard_subject_model_dp
    from multimodal_sae_tpu.sae import Sae

    assert jax.device_count() >= 4
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=10000.0,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)

    class Tok:
        def apply_chat_template(self, conv, add_generation_prompt=False, tokenize=False):
            return conv[0]["content"][0]["text"]

        def __call__(self, text, **kw):
            return {"input_ids": [1] + [2 + ord(c) % 100 for c in text]}

        def batch_decode(self, arr, **kw):
            return [" ".join(str(int(t)) for t in row) for row in np.asarray(arr)]

    feats = [3, 7, 11, 20, 33]  # fbs=4 -> chunks of 4 + 1 (ragged)

    def run(model, sae):
        return SteeringController(
            sae=sae,
            module_name="layers.1",
            feature_idx=feats,
            model=model,
            processor=Tok(),
            prompt="hello",
            k=100.0,
            max_new_tokens=6,
            feature_batch_size=4,
        ).run()

    from multimodal_sae_tpu.config import SaeConfig as _SC

    ref = run(
        LlamaModel(dict(params), cfg),
        Sae(32, _SC(num_latents=128, k=8), key=jax.random.PRNGKey(1)),
    )

    dp_model = LlamaModel(dict(params), cfg)
    dp_model, _ = shard_subject_model_dp(dp_model, 4)
    dp_sae = Sae(32, _SC(num_latents=128, k=8), key=jax.random.PRNGKey(1))
    replicate_saes(dp_model, [dp_sae])
    out = run(dp_model, dp_sae)
    assert ref == out
    assert set(out) == {f"layers.1_feature{i}" for i in feats}


def test_kv_cache_allocates_sharded_under_dp():
    """Under `--dp` the KV cache — the decode loop's dominant live buffer —
    must be ALLOCATED in the row-sharded layout, not materialized full-size
    on one device and resharded after (which would transiently hold the
    whole (layers, B, kvH, max_len, hd) pair on chip 0 and OOM exactly the
    batches --dp exists to fit)."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from multimodal_sae_tpu.models.llama import KVCache

    assert jax.device_count() >= 4
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=10000.0,
    )
    mesh = Mesh(np.array(jax.devices()[:4]), ("data",))
    kv_spec = NamedSharding(mesh, P(None, "data", None, None, None))
    cache = KVCache.init(
        cfg, batch=8, max_len=16, dtype=jnp.bfloat16,
        kv_sharding=kv_spec, length_sharding=NamedSharding(mesh, P()),
    )
    assert cache.k.sharding == kv_spec and cache.v.sharding == kv_spec
    for arr in (cache.k, cache.v):
        for shard in arr.addressable_shards:
            assert shard.data.shape[1] == 2  # 8 rows over 4 devices


def test_sampled_steering_ragged_chunk_dp_matches_unsharded():
    """Sampling + a ragged steering chunk under `--dp`: the controller pads
    the final 1-feature chunk up to the mesh multiple (B=1 -> 4), and the
    padded generate must still draw the SAME tokens for the real row —
    threefry noise is per-flat-index, so widening the (B, V) logits leaves
    the real rows' gumbel draws unchanged (steering.py run())."""
    from multimodal_sae_tpu.config import SaeConfig as _SC
    from multimodal_sae_tpu.features.steering import SteeringController
    from multimodal_sae_tpu.models.llama import LlamaModel
    from multimodal_sae_tpu.parallel import replicate_saes, shard_subject_model_dp
    from multimodal_sae_tpu.sae import Sae

    assert jax.device_count() >= 4
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=10000.0,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)

    class Tok:
        def apply_chat_template(self, conv, add_generation_prompt=False, tokenize=False):
            return conv[0]["content"][0]["text"]

        def __call__(self, text, **kw):
            return {"input_ids": [1] + [2 + ord(c) % 100 for c in text]}

        def batch_decode(self, arr, **kw):
            return [" ".join(str(int(t)) for t in row) for row in np.asarray(arr)]

    feats = [3, 7, 11, 20, 33]  # fbs=4 -> one full chunk + a ragged B=1 tail

    def run(model, sae):
        return SteeringController(
            sae=sae,
            module_name="layers.1",
            feature_idx=feats,
            model=model,
            processor=Tok(),
            prompt="hello",
            k=100.0,
            max_new_tokens=6,
            feature_batch_size=4,
            generation_config={
                "do_sample": True,
                "temperature": 0.9,
                "top_p": 0.8,
                "seed": 7,
            },
        ).run()

    ref = run(
        LlamaModel(dict(params), cfg),
        Sae(32, _SC(num_latents=128, k=8), key=jax.random.PRNGKey(1)),
    )
    dp_model, _ = shard_subject_model_dp(LlamaModel(dict(params), cfg), 4)
    dp_sae = Sae(32, _SC(num_latents=128, k=8), key=jax.random.PRNGKey(1))
    replicate_saes(dp_model, [dp_sae])
    out = run(dp_model, dp_sae)
    assert ref == out


def test_sampled_generate_dp_matches_unsharded():
    """Sampling under `--dp`: JAX's threefry PRNG is partition-invariant, so
    a temperature+nucleus decode over the row-sharded mesh must draw the
    exact same tokens as the unsharded run."""
    from multimodal_sae_tpu.models.llama import LlamaModel
    from multimodal_sae_tpu.parallel import shard_subject_model_dp

    assert jax.device_count() >= 4
    cfg = LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=2,
        num_attention_heads=4,
        num_key_value_heads=2,
        rope_theta=10000.0,
    )
    params = init_llama_params(jax.random.PRNGKey(0), cfg)
    ids = np.tile(np.array([[1, 5, 9, 3]]), (4, 1))
    kw = dict(
        max_new_tokens=6,
        do_sample=True,
        temperature=0.9,
        top_p=0.8,
        prng_key=jax.random.PRNGKey(7),
    )
    ref = LlamaModel(dict(params), cfg).generate(ids, **kw)
    dp_model, _ = shard_subject_model_dp(LlamaModel(dict(params), cfg), 4)
    out = dp_model.generate(ids, **kw)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))
