"""REAL two-process integration tests (subprocess pairs over
jax.distributed + gloo CPU collectives): launch-layer barrier/gather
correctness and DP-training parity — the paths the reference exercised with
torchrun that world=1 tests cannot cover (VERDICT r2 items 1 & 5).

Each test spawns N python processes with COORDINATOR_ADDRESS/NUM_PROCESSES/
PROCESS_ID env vars; `parallel.initialize_distributed` picks them up and
configures gloo before backend init.  The axon TPU sitecustomize and the
8-virtual-device XLA flag are stripped so each process owns exactly one CPU
device."""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DRIVERS = os.path.join(REPO, "tests", "mp_drivers")


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _mp_env(num_processes: int, port: int, rank: int) -> dict:
    env = dict(os.environ)
    env["PYTHONPATH"] = os.pathsep.join(
        [REPO]
        + [
            p
            for p in env.get("PYTHONPATH", "").split(os.pathsep)
            if p and ".axon_site" not in p
        ]
    )
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = " ".join(
        f
        for f in env.get("XLA_FLAGS", "").split()
        if "xla_force_host_platform_device_count" not in f
    )
    env["COORDINATOR_ADDRESS"] = f"127.0.0.1:{port}"
    env["NUM_PROCESSES"] = str(num_processes)
    env["PROCESS_ID"] = str(rank)
    return env


def run_procs(script: str, args, num_processes: int = 2, timeout: int = 240):
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(DRIVERS, script), *map(str, args)],
            env=_mp_env(num_processes, port, rank),
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for rank in range(num_processes)
    ]
    outs = []
    failed = False
    for p in procs:
        try:
            out, _ = p.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
            out += "\n<TIMEOUT>"
            failed = True
        outs.append(out)
        failed = failed or p.returncode != 0
    if failed:
        banner = "\n".join(
            f"--- rank {i} (rc={p.returncode}) ---\n{o}"
            for i, (p, o) in enumerate(zip(procs, outs))
        )
        pytest.fail(f"multi-process run failed:\n{banner}")
    return outs


def test_collectives_two_process(tmp_path):
    run_procs("mp_collectives.py", [tmp_path])
    assert (tmp_path / "ok.0").exists() and (tmp_path / "ok.1").exists()


@pytest.fixture(scope="module")
def token_dataset(tmp_path_factory):
    """16 pre-tokenized rows (vocab 64, S=8), saved to disk for the drivers."""
    from datasets import Dataset

    rng = np.random.default_rng(0)
    ds = Dataset.from_dict(
        {"input_ids": rng.integers(0, 64, size=(16, 8)).tolist()}
    )
    d = tmp_path_factory.mktemp("tokens")
    ds.save_to_disk(str(d))
    return str(d)


def _make_sae_dir(tmp_path, d_in=32, num_latents=64, k=4):
    import jax

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae

    sae_dir = tmp_path / "saes"
    Sae(
        d_in, SaeConfig(num_latents=num_latents, k=k), key=jax.random.PRNGKey(0)
    ).save_to_disk(sae_dir / "layers.1")
    return str(sae_dir)


def test_cache_two_process_merge_contains_both_ranks(token_dataset, tmp_path):
    """The merge-race regression test: rank 1's save_splits is delayed 3 s;
    the barrier must still get every rank's rows into the merged files, and
    the merged cache must equal a single-process run byte-for-byte."""
    from safetensors.numpy import load_file

    sae_dir = _make_sae_dir(tmp_path)
    save_dir = tmp_path / "cache_mp"
    run_procs("mp_cache.py", [token_dataset, sae_dir, save_dir])

    module_dir = save_dir / "layers.1"
    listing = sorted(os.listdir(module_dir))
    assert all(not f.startswith("Rank") for f in listing), f"unmerged shards: {listing}"
    # Canonical splits only; the merger's .featidx sidecars (r5) ride alongside.
    files = [f for f in listing if f.endswith(".safetensors")]
    assert len(files) == 2  # n_splits=2

    rows = set()
    total = 0
    for f in files:
        data = load_file(str(module_dir / f))
        rows.update(np.unique(data["locations"][:, 0]).tolist())
        total += len(data["activations"])
    # 16 dataset rows; both ranks' halves (0-7 from rank 0, 8-15 from rank 1)
    # must be present — the pre-fix race dropped the late rank's rows.
    assert rows == set(range(16)), f"missing rows: {sorted(set(range(16)) - rows)}"
    assert total == 16 * 8 * 4  # rows * seq * k

    # Byte-parity with a single-process run of the same CLI (same shard
    # order: rank files are merged rank-ascending = dataset order).
    from multimodal_sae_tpu.config import CacheConfig
    from multimodal_sae_tpu.launch.cache import cache as cache_cli

    solo_dir = tmp_path / "cache_solo"
    cache_cli.main(
        CacheConfig(
            model="synthetic://32,3,64",
            dataset=token_dataset,
            sae_path=sae_dir,
            save_dir=str(solo_dir),
            batch_size=2,
            ctx_len=8,
            n_splits=2,
        )
    )
    for f in files:
        a = (module_dir / f).read_bytes()
        b = (solo_dir / "layers.1" / f).read_bytes()
        assert a == b, f"{f} differs between 1-process and 2-process runs"


def test_dp_training_two_process_matches_single(token_dataset, tmp_path):
    """Two-process DP (2 procs x 1 CPU device) must match a single-process
    run on a 2-virtual-device mesh with the SAME per-device shard contents:
    strided rank shards are interleaved back into the oracle's batch order
    (reference torchrun DP = dataset.shard(world, rank), __main__.py:164-166)."""
    from datasets import Dataset

    run_dir = tmp_path / "run_mp"
    run_procs("mp_train.py", [token_dataset, run_dir], timeout=360)

    # Oracle: single process, 2 virtual devices, batch 4, rows reordered so
    # device shards equal the two-process layout (HF shard() is contiguous:
    # rank 0 owns rows 0-7, rank 1 rows 8-15; step s consumes local rows
    # [2s, 2s+1] on each): [2s, 2s+1, 8+2s, 8+2s+1].
    order = []
    for s in range(4):
        order += [2 * s, 2 * s + 1, 8 + 2 * s, 8 + 2 * s + 1]
    ds = Dataset.load_from_disk(token_dataset).with_format("numpy").select(order)

    oracle_script = os.path.join(DRIVERS, "mp_train_oracle.py")
    env = _mp_env(1, _free_port(), 0)
    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        env.pop(k)
    env["XLA_FLAGS"] = (
        env["XLA_FLAGS"] + " --xla_force_host_platform_device_count=2"
    ).strip()
    ds_dir = tmp_path / "oracle_ds"
    ds.save_to_disk(str(ds_dir))
    run_oracle = subprocess.run(
        [sys.executable, oracle_script, str(ds_dir), str(tmp_path / "run_solo")],
        env=env,
        capture_output=True,
        text=True,
        timeout=360,
    )
    assert run_oracle.returncode == 0, run_oracle.stdout + run_oracle.stderr

    from safetensors.numpy import load_file

    mp = load_file(str(run_dir / "layers.1" / "sae.safetensors"))
    solo = load_file(str(tmp_path / "run_solo" / "layers.1" / "sae.safetensors"))
    assert set(mp) == set(solo)
    for key in mp:
        np.testing.assert_allclose(
            mp[key], solo[key], rtol=1e-5, atol=1e-6, err_msg=key
        )

    st_mp = json.loads((run_dir / "state.json").read_text())
    st_solo = json.loads((tmp_path / "run_solo" / "state.json").read_text())
    assert st_mp["opt_step"] == st_solo["opt_step"] == 2


# ---- attribution / steering / segment merge tests (VERDICT r3 item 2) ------


@pytest.fixture(scope="module")
def llava_ckpt(tmp_path_factory):
    """Tiny fabricated LLaVA-NeXT checkpoint + word-level tokenizer +
    LlavaNextProcessor, loadable offline by `load_subject_model` (same recipe
    as tools/validate_real_checkpoint.py's image self-test)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    ckpt = tmp_path_factory.mktemp("ckpts") / "llava_ckpt"
    pinpoints = [[32, 64], [64, 32], [64, 64]]
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
            vocab_size=260,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
        ),
        image_grid_pinpoints=pinpoints,
        image_token_index=256,
    )
    torch.manual_seed(0)
    transformers.LlavaNextForConditionalGeneration(cfg).eval().save_pretrained(
        ckpt, safe_serialization=True
    )
    tok = Tokenizer(models.WordLevel({str(i): i for i in range(256)}, unk_token="0"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    tok.add_special_tokens(["<image>"])
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="0")
    fast.save_pretrained(ckpt)
    processor = transformers.LlavaNextProcessor(
        image_processor=transformers.LlavaNextImageProcessor(
            size={"shortest_edge": 32},
            crop_size={"height": 32, "width": 32},
            image_grid_pinpoints=pinpoints,
        ),
        tokenizer=fast,
        patch_size=16,
        vision_feature_select_strategy="default",
        image_token="<image>",
        num_additional_image_tokens=1,
    )
    processor.save_pretrained(ckpt)
    return str(ckpt)


def _solo_env():
    """World=1 env: the mp env minus the coordinator vars."""
    env = _mp_env(1, _free_port(), 0)
    for k in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID"):
        env.pop(k)
    return env


def _run_solo(script: str, args, timeout: int = 240):
    import subprocess as sp

    r = sp.run(
        [sys.executable, os.path.join(DRIVERS, script), *map(str, args)],
        env=_solo_env(),
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert r.returncode == 0, f"world=1 oracle failed:\n{r.stdout}\n{r.stderr}"


def test_attribution_two_process_merge_matches_solo(llava_ckpt, tmp_path):
    """attribution_patching.main on 2 processes (rank 1 gather delayed 3 s)
    must produce exactly ONE safetensors whose feature axis equals the global
    arange order — i.e. identical to a world=1 run (rank-ordered concat must
    invert the np.array_split sharding)."""
    import jax

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae
    from PIL import Image
    from safetensors.numpy import load_file

    sae_dir = tmp_path / "saes"
    # 16 features / 2 ranks / feature_batch 4 => per-rank vmap chunks equal
    # the solo run's chunks, so outputs must match exactly.
    Sae(
        32, SaeConfig(num_latents=16, k=4), key=jax.random.PRNGKey(0)
    ).save_to_disk(sae_dir / "model.layers.1")

    img = tmp_path / "probe.png"
    Image.new("RGB", (32, 32), (120, 30, 200)).save(img)
    # "<image>" must appear AFTER the first token: Attribution drops the
    # leading BOS from every tokenized prompt (reference attribution.py:92-94).
    probing = [
        {"prompt": "1 <image> 2 3", "answer": "4", "baseline": "5", "image": str(img)},
        {"prompt": "7 <image> 8", "answer": "9", "baseline": "3", "image": str(img)},
    ]
    (tmp_path / "probing.json").write_text(json.dumps(probing))

    mp_dir, solo_dir = tmp_path / "mp", tmp_path / "solo"
    args = [llava_ckpt, sae_dir, tmp_path / "probing.json"]
    run_procs("mp_attribution.py", [*args, mp_dir], timeout=360)
    _run_solo("mp_attribution.py", [*args, solo_dir], timeout=360)

    mp_files = sorted(os.listdir(mp_dir))
    assert len(mp_files) == 1, f"expected ONE merged artifact, got {mp_files}"
    mp_data = load_file(str(mp_dir / mp_files[0]))
    solo_data = load_file(str(solo_dir / mp_files[0]))
    assert set(mp_data) == set(solo_data)
    for key in mp_data:
        assert mp_data[key].shape == solo_data[key].shape, key
        np.testing.assert_allclose(
            mp_data[key], solo_data[key], rtol=1e-5, atol=1e-6, err_msg=key
        )


def test_steering_two_process_merge_matches_solo(tmp_path):
    """steering.main on 2 processes (rank 1 gather delayed 3 s) must write
    exactly ONE {module}.json whose keys cover every filtered feature and
    whose contents match a world=1 run (dict-union of disjoint
    array_split shards)."""
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    import jax

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    ckpt = tmp_path / "llama_ckpt"
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).save_pretrained(ckpt, safe_serialization=True)
    tok = Tokenizer(models.WordLevel({str(i): i for i in range(128)}, unk_token="0"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="0")
    # SteeringController chat-templates through the tokenizer for text-only
    # subjects; give the fabricated checkpoint a minimal template.
    fast.chat_template = (
        "{%- for m in messages %}{%- for c in m['content'] %}"
        "{{ c['text'] }}{%- endfor %}{%- endfor %}"
    )
    fast.save_pretrained(ckpt)

    sae_dir = tmp_path / "saes"
    Sae(
        32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0)
    ).save_to_disk(sae_dir / "layers.1")
    filters = {"layers.1": [0, 1, 2, 3, 4, 5, 6, 7]}
    (tmp_path / "filters.json").write_text(json.dumps(filters))

    mp_dir, solo_dir = tmp_path / "mp", tmp_path / "solo"
    args = [ckpt, sae_dir, tmp_path / "filters.json"]
    run_procs("mp_steering.py", [*args, mp_dir], timeout=360)
    _run_solo("mp_steering.py", [*args, solo_dir], timeout=360)

    mp_files = sorted(os.listdir(mp_dir))
    assert mp_files == ["layers.1.json"], f"expected ONE merged json, got {mp_files}"
    mp_data = json.loads((mp_dir / "layers.1.json").read_text())
    solo_data = json.loads((solo_dir / "layers.1.json").read_text())
    assert set(mp_data) == {f"layers.1_feature{i}" for i in filters["layers.1"]}
    # Same feature-batch chunking on both sides (fbs=2 divides the per-rank
    # shards), so the steered continuations must match exactly.
    assert mp_data == solo_data


def test_segment_two_process_merge_matches_solo(tmp_path):
    """segment.main on 2 processes (rank 1 gather delayed 3 s) must write
    exactly ONE merged score json equal to the world=1 run's list (rank-order
    concat of the scorer's self-sharded feature lists)."""
    pytest.importorskip("torch")
    import datasets as hf_datasets
    from PIL import Image

    from multimodal_sae_tpu.features import FeatureCache
    from multimodal_sae_tpu.features.cache import Cache

    module = "model.layers.24"
    # Synthetic COO cache: 6 images x 2 features firing on the first two
    # positions of a 2x2 activation grid (mirrors tests/test_segment_scorer).
    fc = FeatureCache.__new__(FeatureCache)
    fc.cache = Cache(shard_size=0, batch_size=4)
    fc.width = 64
    rng = np.random.default_rng(0)
    locs, acts = [], []
    for img_i in range(6):
        for feat in (0, 1):
            for pos in range(2):
                locs.append([img_i, pos, feat])
                acts.append(3.0 + rng.random())
    fc.cache.feature_locations[module] = np.asarray(locs, dtype=np.int64)
    fc.cache.feature_activations[module] = np.asarray(acts, dtype=np.float32)
    acts_dir = tmp_path / "acts"
    fc.save_splits(1, str(acts_dir), rank=0)
    fc.concate_safetensors(1, str(acts_dir))

    expl_dir = tmp_path / "expl"
    expl_dir.mkdir()
    (expl_dir / f"{module}.json").write_text(
        json.dumps(
            [
                {f"{module}_feature0": "the top half region"},
                {f"{module}_feature1": "the bottom half region"},
            ]
        )
    )
    refine = {
        f"{module}_feature0": "top half",
        f"{module}_feature1": "bottom half",
    }
    (tmp_path / "refine.json").write_text(json.dumps(refine))

    img_rng = np.random.default_rng(1)
    ds = hf_datasets.Dataset.from_dict(
        {
            "image": [
                Image.fromarray(
                    img_rng.integers(0, 255, (32, 32, 3), dtype=np.uint8)
                )
                for _ in range(6)
            ],
            "id": list(range(6)),
        }
    ).cast_column("image", hf_datasets.Image())
    ds_dir = tmp_path / "imgds"
    ds_dir.mkdir()
    ds.to_parquet(str(ds_dir / "train.parquet"))

    mp_path, solo_path = tmp_path / "mp_scores.json", tmp_path / "solo_scores.json"
    args = [ds_dir, acts_dir, expl_dir, tmp_path / "refine.json"]
    run_procs("mp_segment.py", [*args, mp_path], timeout=360)
    _run_solo("mp_segment.py", [*args, solo_path], timeout=360)

    mp_scores = json.loads(mp_path.read_text())
    solo_scores = json.loads(solo_path.read_text())
    assert len(mp_scores) == len(solo_scores) > 0
    # Deterministic stub backends => identical scores, in the same global
    # (natsorted-feature) order: rank-ordered concat inverts the shard split.
    assert mp_scores == solo_scores
    feats = {s["feature"] for s in mp_scores}
    assert feats == {f"{module}_feature0", f"{module}_feature1"}


def test_cache_image_two_process_merge_byte_equals_solo(llava_ckpt, tmp_path):
    """The IMAGE cache CLI under the merge race: rank 1's save_splits is
    delayed 3 s; the merged anyres cache (BOS drop, streaming shards) must be
    byte-identical to a single-process run."""
    import datasets as hf_datasets
    import jax
    from PIL import Image

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae

    sae_dir = tmp_path / "saes"
    Sae(
        32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0)
    ).save_to_disk(sae_dir / "model.layers.1")

    rng = np.random.default_rng(0)
    ds = hf_datasets.Dataset.from_dict(
        {
            "image": [
                Image.fromarray(rng.integers(0, 255, (24, 40, 3), dtype=np.uint8))
                for _ in range(4)
            ]
        }
    ).cast_column("image", hf_datasets.Image())
    ds_dir = tmp_path / "imgds"
    ds.save_to_disk(str(ds_dir))

    save_dir = tmp_path / "cache_mp"
    run_procs(
        "mp_cache_image.py", [llava_ckpt, ds_dir, sae_dir, save_dir], timeout=360
    )

    module_dir = save_dir / "model.layers.1"
    listing = sorted(os.listdir(module_dir))
    assert all(not f.startswith("Rank") for f in listing), f"unmerged: {listing}"
    # Canonical splits only; the merger's .featidx sidecars (r5) ride alongside.
    files = [f for f in listing if f.endswith(".safetensors")]
    assert len(files) == 2  # n_splits=2

    # Solo oracle, in-process (world=1).
    from multimodal_sae_tpu.config import CacheConfig
    from multimodal_sae_tpu.launch.cache import cache_image as cache_image_cli

    solo_dir = tmp_path / "cache_solo"
    cache_image_cli.main(
        CacheConfig(
            model=llava_ckpt,
            dataset=str(ds_dir),
            sae_path=str(sae_dir),
            save_dir=str(solo_dir),
            batch_size=2,
            ctx_len=64,
            n_splits=2,
        )
    )
    for f in files:
        a = (module_dir / f).read_bytes()
        b = (solo_dir / "model.layers.1" / f).read_bytes()
        assert a == b, f"{f} differs between 1-process and 2-process runs"


def test_int8_matmul_does_not_enable_int8_tower_compute(llava_ckpt):
    """--int8-matmul must quantize the tower's WEIGHTS (HBM parity with the
    reference's whole-model fp8 posture) but keep bf16 tower COMPUTE: W8A8
    tower matmuls are a measured 2x regression at anyres shapes (BASELINE.md
    r4). --int8-vision opts into the int8 compute path explicitly."""
    from multimodal_sae_tpu.launch.utils import load_subject_model

    from multimodal_sae_tpu.models.quant import is_quantized

    model, _, _ = load_subject_model(llava_ckpt, int8_matmul=True)
    assert model.cfg.text_config.int8_matmul is True
    assert model.cfg.vision_config.int8_matmul is False
    # Tower weights ARE quantized (int8 + per-channel scale dict leaves).
    assert is_quantized(model.params["vision_tower"]["layers"][0]["q_proj"])

    model2, _, _ = load_subject_model(llava_ckpt, int8_matmul=True, int8_vision=True)
    assert model2.cfg.vision_config.int8_matmul is True


def test_cache_image_cli_data_parallel_byte_equals_solo(llava_ckpt, tmp_path):
    """`cache_image --dp 2`: the anyres pipeline (vision-tower geometry
    groups sharded over the ('data',) mesh, LM batch row-sharded, BOS drop)
    must produce a merged cache byte-identical to a single-device run at
    batch_size = dp x batch_size."""
    import datasets as hf_datasets
    import jax
    from PIL import Image

    from multimodal_sae_tpu.config import CacheConfig, SaeConfig
    from multimodal_sae_tpu.launch.cache import cache_image as cache_image_cli
    from multimodal_sae_tpu.sae import Sae

    if len(jax.devices()) < 2:
        pytest.skip("needs >=2 devices")

    sae_dir = tmp_path / "saes"
    Sae(
        32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0)
    ).save_to_disk(sae_dir / "model.layers.1")

    rng = np.random.default_rng(2)
    ds = hf_datasets.Dataset.from_dict(
        {
            "image": [
                Image.fromarray(rng.integers(0, 255, (24, 40, 3), dtype=np.uint8))
                for _ in range(4)
            ]
        }
    ).cast_column("image", hf_datasets.Image())
    ds_dir = tmp_path / "imgds"
    ds.save_to_disk(str(ds_dir))

    def run(dp, batch_size, out):
        cache_image_cli.main(
            CacheConfig(
                model=llava_ckpt,
                dataset=str(ds_dir),
                sae_path=str(sae_dir),
                save_dir=str(tmp_path / out),
                batch_size=batch_size,
                ctx_len=64,
                n_splits=2,
                dp=dp,
            )
        )
        d = tmp_path / out / "model.layers.1"
        return {f.name: f.read_bytes() for f in sorted(d.iterdir())}

    dp_out = run(2, 1, "img_dp")
    ref_out = run(0, 2, "img_ref")
    # 2 canonical splits + their .featidx sidecars (r5), all byte-compared.
    assert set(dp_out) == set(ref_out)
    assert len([f for f in dp_out if f.endswith(".safetensors")]) == 2
    for name in ref_out:
        assert dp_out[name] == ref_out[name], f"split {name} differs under --dp"


def test_cache_two_process_with_inprocess_dp_byte_equals_solo(tmp_path):
    """The documented composition (docs/DISTRIBUTED.md): dataset rows
    process-sharded OUTSIDE, `--dp 2` row-sharding INSIDE each process (two
    virtual devices per process). Two processes x dp=2 under the merge race
    must produce a cache byte-identical to a world=1 run of the same driver
    — and to a plain single-device run at the same device rows/step."""
    import jax
    from datasets import Dataset
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae

    ckpt = tmp_path / "llama_ckpt"
    cfg = transformers.LlamaConfig(
        vocab_size=128,
        hidden_size=32,
        intermediate_size=64,
        num_hidden_layers=3,
        num_attention_heads=4,
        num_key_value_heads=2,
        max_position_embeddings=64,
    )
    torch.manual_seed(0)
    transformers.LlamaForCausalLM(cfg).save_pretrained(ckpt, safe_serialization=True)
    tok = Tokenizer(models.WordLevel({str(i): i for i in range(128)}, unk_token="0"))
    tok.pre_tokenizer = pre_tokenizers.Whitespace()
    PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="0").save_pretrained(ckpt)

    sae_dir = tmp_path / "saes"
    Sae(
        32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0)
    ).save_to_disk(sae_dir / "layers.1")

    rng = np.random.default_rng(4)
    # 8 rows -> contiguous shards of 4/process -> 2 full device batches of
    # (dp x batch_size)=2 each, no ragged tail on either side of the compare.
    ds = Dataset.from_dict({"input_ids": rng.integers(1, 128, size=(8, 8)).tolist()})
    ds_dir = tmp_path / "ds"
    ds.save_to_disk(str(ds_dir))

    save_mp = tmp_path / "cache_mp_dp"
    run_procs("mp_cache_dp.py", [ckpt, ds_dir, sae_dir, save_mp], timeout=360)

    module_dir = save_mp / "layers.1"
    listing = sorted(os.listdir(module_dir))
    assert all(not f.startswith("Rank") for f in listing)
    # Byte-compare the .featidx sidecars too: identical merged splits must
    # index identically across process topologies (split_index.py).
    files = listing
    assert len([f for f in files if f.endswith(".safetensors")]) == 2

    # Oracle 1: the same driver at world=1 (still dp=2 on its 2 devices).
    save_solo = tmp_path / "cache_solo_dp"
    _run_solo("mp_cache_dp.py", [ckpt, ds_dir, sae_dir, save_solo], timeout=240)
    for f in files:
        assert (module_dir / f).read_bytes() == (
            save_solo / "layers.1" / f
        ).read_bytes(), f"{f}: 2-proc x dp=2 differs from world=1 x dp=2"

    # Oracle 2: a plain in-process single-device run at the same device
    # rows/step (batch_size=2, dp=0) — proves the dp sharding itself is
    # byte-invisible in this composition too.
    from multimodal_sae_tpu.config import CacheConfig
    from multimodal_sae_tpu.launch.cache import cache as cache_cli

    save_plain = tmp_path / "cache_plain"
    cache_cli.main(
        CacheConfig(
            model=str(ckpt),
            dataset=str(ds_dir),
            sae_path=str(sae_dir),
            save_dir=str(save_plain),
            batch_size=2,
            ctx_len=8,
            n_splits=2,
        )
    )
    for f in files:
        assert (module_dir / f).read_bytes() == (
            save_plain / "layers.1" / f
        ).read_bytes(), f"{f}: 2-proc x dp=2 differs from plain single-device"
