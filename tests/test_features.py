"""Feature-data layer tests: COO cache format (golden-tested against a dense
torch-style oracle), split writer/merger, lazy loader, constructors, samplers,
and the image-mask utilities (SURVEY.md §4 test strategy)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from PIL import Image

from multimodal_sae_tpu.config import ExperimentConfig, FeatureConfig, SaeConfig
from multimodal_sae_tpu.features import (
    Cache,
    FeatureCache,
    FeatureDataset,
    FeatureRecord,
    TensorBuffer,
    prepare_image_examples,
    upsample_mask,
)
from multimodal_sae_tpu.features.cache import topk_latents_step
from multimodal_sae_tpu.features.constructors import (
    default_constructor,
    pool_max_activation_windows,
)
from multimodal_sae_tpu.features.features import Feature
from multimodal_sae_tpu.features.loader import BufferOutput
from multimodal_sae_tpu.features.samplers import sample, split_quantiles
from multimodal_sae_tpu.sae import Sae

D_IN, L, K = 16, 64, 4


def _make_sae():
    return Sae(D_IN, SaeConfig(num_latents=L, k=K), key=jax.random.PRNGKey(0))


def _dense_oracle(sae, h):
    """The reference's dense path: pre_acts -> topk -> scatter into zeros
    (reference features/cache.py:209-218), in numpy."""
    import torch

    W_enc = torch.tensor(np.asarray(sae.params["W_enc"]))
    b_enc = torch.tensor(np.asarray(sae.params["b_enc"]))
    b_dec = torch.tensor(np.asarray(sae.params["b_dec"]))
    x = torch.tensor(np.asarray(h))
    pre = torch.relu((x - b_dec) @ W_enc + b_enc)
    topk = torch.topk(pre, k=K, dim=-1)
    result = torch.zeros_like(pre)
    result.scatter_(-1, topk.indices, topk.values)
    return result.numpy()


def test_cache_add_topk_matches_dense_reference():
    sae = _make_sae()
    h = jax.random.normal(jax.random.PRNGKey(1), (3, 5, D_IN))
    dense = _dense_oracle(sae, h)

    ref_cache = Cache(shard_size=0, batch_size=3)
    ref_cache.add(dense, batch_number=0, module_path="m")

    vals, idx = topk_latents_step(sae.params, h, sae.cfg)
    new_cache = Cache(shard_size=0, batch_size=3)
    new_cache.add_topk(np.asarray(vals), np.asarray(idx), 0, "m")

    ref_cache.save()
    new_cache.save()
    np.testing.assert_array_equal(
        ref_cache.feature_locations["m"], new_cache.feature_locations["m"]
    )
    np.testing.assert_allclose(
        ref_cache.feature_activations["m"],
        new_cache.feature_activations["m"],
        rtol=1e-6,
    )


def test_cache_filters_and_offsets():
    cache = Cache(shard_size=100, filters={"m": np.array([2, 7])}, batch_size=4)
    vals = np.zeros((4, 3, 2), dtype=np.float32)
    idx = np.zeros((4, 3, 2), dtype=np.int64)
    vals[0, 0] = [0.5, 0.25]
    idx[0, 0] = [2, 3]  # only feature 2 passes the filter
    vals[1, 2] = [1.0, 2.0]
    idx[1, 2] = [7, 9]  # only feature 7 passes
    cache.add_topk(vals, idx, batch_number=2, module_path="m")
    cache.save()
    locs = cache.feature_locations["m"]
    acts = cache.feature_activations["m"]
    # Row offset = batch_number * batch_size + shard_size = 108.
    np.testing.assert_array_equal(locs, [[108, 0, 2], [109, 2, 7]])
    np.testing.assert_allclose(acts, [0.5, 1.0])


def test_cache_preallocate_and_run_hint():
    """preallocate() reserves capacity without affecting content; run()'s
    n_tokens hint pre-sizes arenas (an under-hint resumes doubling)."""
    cache = Cache(shard_size=0, batch_size=2)
    cache.preallocate("m", 5000)
    arena = cache._arenas["m"]
    assert arena.loc.shape[0] >= 5000 and arena.n == 0
    vals = np.abs(np.random.default_rng(0).normal(size=(2, 3, 4))).astype(np.float32) + 0.1
    idx = np.random.default_rng(1).integers(0, 64, size=(2, 3, 4)).astype(np.int64)
    cache.add_topk(vals, idx, 0, "m")
    cache.save()
    ref = Cache(shard_size=0, batch_size=2)  # no preallocation
    ref.add_topk(vals, idx, 0, "m")
    ref.save()
    np.testing.assert_array_equal(
        cache.feature_locations["m"], ref.feature_locations["m"]
    )
    np.testing.assert_array_equal(
        cache.feature_activations["m"], ref.feature_activations["m"]
    )

    # run() path: the hint reaches the arena before the first batch.
    sae = _make_sae()

    def capture_fn(batch):
        return {"layers.0": batch["h"]}

    fc = FeatureCache(capture_fn, {"layers.0": sae}, batch_size=2, shard_size=0)
    h = np.asarray(jax.random.normal(jax.random.PRNGKey(0), (2, 4, D_IN)))
    fc.run(n_tokens=1000, tokens=[{"h": h[0]}, {"h": h[1]}], progress=False)
    assert fc.cache._arenas["layers.0"].loc.shape[0] >= 1000 * sae.cfg.k


def _fill_cache_via_pipeline(tmp_path, n_splits=4, n_batches=6, bs=2, seq=8):
    sae = _make_sae()
    keys = jax.random.split(jax.random.PRNGKey(3), n_batches)
    batches = [jax.random.normal(k, (bs, seq, D_IN)) for k in keys]

    def capture_fn(batch):
        return {"layers.0": batch["h"]}

    fc = FeatureCache(
        capture_fn, {"layers.0": sae}, batch_size=bs, shard_size=0
    )
    for i, b in enumerate(batches):
        fc.process_batch({"h": b}, i)
    fc.cache.save()
    fc.save_splits(n_splits, str(tmp_path), rank=0)
    fc.concate_safetensors(n_splits, str(tmp_path))
    return fc, batches


def test_split_roundtrip_and_merge(tmp_path):
    fc, _ = _fill_cache_via_pipeline(tmp_path)
    listing = sorted(os.listdir(tmp_path / "layers.0"))
    files = [f for f in listing if f.endswith(".safetensors")]
    assert files == ["0_15.safetensors", "16_31.safetensors", "32_47.safetensors", "48_63.safetensors"]
    # The merger also emits one .featidx read-index sidecar per split (r5,
    # features/split_index.py); the canonical splits above are unchanged.
    assert [f for f in listing if f.endswith(".featidx")] == [
        "0_15.featidx", "16_31.featidx", "32_47.featidx", "48_63.featidx"
    ]
    # Re-read all splits: together they must reproduce the full COO set.
    from safetensors.numpy import load_file

    locs, acts = [], []
    for f in files:
        d = load_file(str(tmp_path / "layers.0" / f))
        locs.append(d["locations"])
        acts.append(d["activations"])
        assert d["locations"].dtype == np.int64
    locs = np.concatenate(locs)
    acts = np.concatenate(acts)
    orig_locs = fc.cache.feature_locations["layers.0"]
    orig_acts = fc.cache.feature_activations["layers.0"]
    # Same multiset (split partitioning reorders across files).
    order = np.lexsort(locs.T)
    oorder = np.lexsort(orig_locs.T)
    np.testing.assert_array_equal(locs[order], orig_locs[oorder])
    np.testing.assert_allclose(acts[order], orig_acts[oorder])


def test_tensorbuffer_and_dataset(tmp_path):
    fc, _ = _fill_cache_via_pipeline(tmp_path)
    cfg = FeatureConfig(width=L, n_splits=4, min_examples=1, max_examples=100)
    ds = FeatureDataset(str(tmp_path), cfg, modules=["layers.0"])
    assert len(ds.buffers) == 4
    seen = {}
    for buf in ds.buffers:
        for out in buf:
            assert out.locations.shape[1] == 2
            assert out.activations.ndim == 1
            seen[out.feature.feature_index] = len(out.activations)
    # Every cached feature appears exactly once across the splits.
    orig_feats = fc.cache.feature_locations["layers.0"][:, 2]
    uniq, counts = np.unique(orig_feats, return_counts=True)
    assert seen == dict(zip(uniq.tolist(), counts.tolist()))


def test_dataset_selected_features(tmp_path):
    fc, _ = _fill_cache_via_pipeline(tmp_path)
    orig_feats = np.unique(fc.cache.feature_locations["layers.0"][:, 2])
    pick = orig_feats[[0, len(orig_feats) // 2, -1]]
    cfg = FeatureConfig(width=L, n_splits=4, min_examples=1)
    ds = FeatureDataset(
        str(tmp_path), cfg, modules=["layers.0"], features={"layers.0": pick}
    )
    got = [out.feature.feature_index for buf in ds.buffers for out in buf]
    assert sorted(got) == sorted(pick.tolist())


def test_selected_features_prefilter_matches_full_iteration(tmp_path):
    """The membership prefilter in `TensorBuffer._load` (r4: LUT gather +
    subset quicksort instead of a full-split stable argsort) must yield
    byte-identical per-feature BufferOutputs to the unfiltered iteration,
    including when the request names ids absent from the split and ids above
    every cached entry."""
    fc, _ = _fill_cache_via_pipeline(tmp_path)
    cfg = FeatureConfig(width=L, n_splits=4, min_examples=1)
    full = {
        out.feature.feature_index: out
        for buf in FeatureDataset(str(tmp_path), cfg, modules=["layers.0"]).buffers
        for out in buf
    }
    cached = np.array(sorted(full), dtype=np.int64)
    # Mix present ids with an in-range id absent from the cache and the max
    # representable id (width-1); width itself is out of domain, as in the
    # reference's bucketize-based split selection.
    absent = next(i for i in range(L - 1, -1, -1) if i not in full)
    pick = np.unique(np.concatenate([cached[:3], cached[-2:], [absent, L - 1]]))
    ds = FeatureDataset(
        str(tmp_path), cfg, modules=["layers.0"], features={"layers.0": pick}
    )
    got = {o.feature.feature_index: o for buf in ds.buffers for o in buf}
    assert sorted(got) == [int(f) for f in pick if int(f) in full]
    for fid, out in got.items():
        np.testing.assert_array_equal(out.locations, full[fid].locations)
        np.testing.assert_array_equal(out.activations, full[fid].activations)


def test_to_dense_compact_scatter_matches_full_batch_oracle():
    """`_to_dense` scatters into the compact active-row layout (r4); it must
    stay bitwise equal to the reference formulation — scatter-add into a full
    (batch, seq) dense array, then select the sorted-unique active rows
    (reference constructors.py:11-24) — including duplicate (row, pos) hits,
    empty COO sets, and single-row batches."""
    from multimodal_sae_tpu.features.constructors import _to_dense

    rng = np.random.default_rng(7)
    for trial in range(100):
        B = int(rng.integers(1, 40))
        S = int(rng.integers(4, 64))
        E = int(rng.integers(0, 300))
        toks = rng.integers(0, 100, size=(B, S))
        loc = np.zeros((E, 3), dtype=np.int64)
        loc[:, 0] = rng.integers(0, B, E)
        loc[:, 1] = rng.integers(0, S, E)
        acts = rng.standard_normal(E).astype(np.float32)

        dense = np.zeros((B, S), dtype=acts.dtype)
        np.add.at(dense, (loc[:, 0], loc[:, 1]), acts)
        uniq = np.unique(loc[:, 0])
        got_toks, got_dense = _to_dense(toks, acts, loc)
        np.testing.assert_array_equal(got_toks, toks[uniq], err_msg=f"trial {trial}")
        np.testing.assert_array_equal(got_dense, dense[uniq], err_msg=f"trial {trial}")


def test_score_bench_smoke(tmp_path):
    """`bench.py --score` is the one bench mode that runs without a chip;
    hold it to the driver contract — exactly one JSON line on stdout with
    metric/value/unit/vs_baseline — at a tiny synthetic size."""
    import subprocess
    import sys as _sys

    env = dict(os.environ)
    env.update(
        MMSAE_BENCH_SCORE_ENTRIES="20000",
        MMSAE_BENCH_SCORE_SPLITS="4",
        MMSAE_BENCH_SCORE_FEATURES="50",
        MMSAE_BENCH_SCORE_DIR=str(tmp_path / "score_cache"),
        JAX_PLATFORMS="cpu",
    )
    proc = subprocess.run(
        [_sys.executable, "bench.py", "--score"],
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
        capture_output=True,
        text=True,
        timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [l for l in proc.stdout.strip().splitlines() if l.strip()]
    assert len(lines) == 1, proc.stdout
    out = json.loads(lines[0])
    assert out["metric"] == "score_features_per_sec"
    assert out["value"] > 0
    assert {"unit", "vs_baseline"} <= set(out)


def test_loader_hardening_advice_r4(tmp_path):
    """Round-4 advisor findings on the loader fast paths (ADVICE.md r4):

    1. an oversized requested id (direct TensorBuffer construction or a
       corrupt JSON filter) must NOT size the membership LUT — it yields
       nothing, like the old searchsorted path, instead of a MemoryError;
    2. `_unique_nonneg` on a corrupted cache with a negative feature id falls
       back to np.unique instead of raising from bincount;
    3. `_feature_slice` returns a sorted COPY — reading a feature must not
       mutate the shared `_order` index in place.
    """
    from safetensors.numpy import save_file

    from multimodal_sae_tpu.features.loader import _unique_nonneg

    locs = np.array(
        [[0, 0, 5], [1, 0, 5], [0, 1, 9], [1, 1, 9]], dtype=np.int64
    )
    acts = np.array([1.0, 2.0, 3.0, 4.0], dtype=np.float32)
    d = tmp_path / "m"
    d.mkdir()
    save_file({"locations": locs, "activations": acts}, str(d / "0_63.safetensors"))

    # (1) id 2**40 would be a ~1 TB LUT if it sized the table.
    buf = TensorBuffer(
        str(d / "0_63.safetensors"),
        "m",
        features=np.array([5, 2**40], dtype=np.int64),
        min_examples=1,
    )
    outs = list(buf)
    assert [o.feature.feature_index for o in outs] == [5]

    # (2) negative id = cache corruption; must return, not raise.
    vals = np.array([3, -1, 3, 7], dtype=np.int64)
    np.testing.assert_array_equal(_unique_nonneg(vals), np.unique(vals))

    # (3) reading one feature's slice must leave _order untouched.
    buf2 = TensorBuffer(str(d / "0_63.safetensors"), "m", min_examples=1)
    buf2._load()
    before = buf2._order.copy()
    buf2._feature_slice(9)
    np.testing.assert_array_equal(buf2._order, before)


def test_min_examples_skips(tmp_path):
    from safetensors.numpy import save_file

    locs = np.array([[0, 0, 5], [1, 0, 5], [0, 1, 9]], dtype=np.int64)
    acts = np.array([1.0, 2.0, 3.0], dtype=np.float32)
    d = tmp_path / "m"
    d.mkdir()
    save_file({"locations": locs, "activations": acts}, str(d / "0_63.safetensors"))
    buf = TensorBuffer(str(d / "0_63.safetensors"), "m", min_examples=2)
    outs = list(buf)
    assert [o.feature.feature_index for o in outs] == [5]


def test_pool_max_activation_windows():
    tokens = np.arange(2 * 12).reshape(2, 12)
    locs = np.array([[0, 3], [0, 4], [1, 9]], dtype=np.int64)
    acts = np.array([1.0, 5.0, 2.0], dtype=np.float32)
    record = FeatureRecord(Feature("m", 0))
    cfg = FeatureConfig(width=L, example_ctx_len=4, max_examples=10)
    pool_max_activation_windows(
        record, BufferOutput(Feature("m", 0), locs, acts), tokens, cfg
    )
    # Windows of 4: row0 win0 has max 5 (positions 3,4 -> window 0 has pos 3 val 1
    # and window 1 has pos 4 val 5); row1 win2 has 2.
    assert len(record.examples) == 3
    assert record.examples[0].max_activation == 5.0
    assert record.examples[1].max_activation == 2.0
    assert record.examples[2].max_activation == 1.0


def test_default_constructor_negatives():
    rng = np.random.default_rng(0)
    tokens = rng.integers(0, 100, size=(20, 16))
    locs = np.array([[0, 3], [1, 4]], dtype=np.int64)
    acts = np.array([1.0, 2.0], dtype=np.float32)
    record = FeatureRecord(Feature("m", 0))
    default_constructor(
        record,
        tokens,
        BufferOutput(Feature("m", 0), locs, acts),
        n_random=4,
        ctx_len=4,
        max_examples=10,
    )
    assert len(record.random_examples) == 4
    for ex in record.random_examples:
        assert ex.max_activation == 0.0


def test_samplers():
    from multimodal_sae_tpu.features import Example

    examples = [
        Example(tokens=np.array([i]), activations=np.array([float(100 - i)]))
        for i in range(100)
    ]
    cfg = ExperimentConfig(n_examples_train=10, train_type="top")
    rec = FeatureRecord(Feature("m", 1))
    rec.examples = examples
    sample(rec, cfg)
    assert rec.train == examples[:10]
    q = split_quantiles(examples, n_quantiles=10, n_samples=2)
    assert len(q) == 20


def test_upsample_mask_and_image_examples():
    acts = np.zeros((24, 24), dtype=np.float32)
    acts[10:14, 10:14] = 3.0
    mask = upsample_mask(acts, (336, 336))
    assert mask.size == (336, 336) and mask.mode == "L"
    m = np.asarray(mask)
    assert m[12 * 14, 12 * 14] == 0  # active region -> 0 (visible)
    assert m[0, 0] == 224  # inactive -> background value

    img = Image.new("RGB", (640, 480), (255, 0, 0))
    flat = np.zeros(8000, dtype=np.float32)
    flat[: 24 * 24] = acts.reshape(-1)
    examples = prepare_image_examples(
        np.zeros((1, 8000)), [flat], [img], num_image_tokens=576
    )
    ex = examples[0]
    assert ex.activation_image.size == (336, 336)
    arr = np.asarray(ex.activation_image)
    center = arr[168, 168]
    corner = arr[0, 0]
    assert center[0] > 200  # activated center keeps the red image
    assert corner.sum() < 60  # masked corner is (near) black


def test_feature_record_save_examples_roundtrip(tmp_path):
    """save(save_examples=True) must serialize Example dataclasses — stdlib
    json needs the dataclass default; the reference's orjson did it natively
    (review r3)."""
    from multimodal_sae_tpu.features import Example

    rec = FeatureRecord(Feature("layers.1", 7))
    rec.explanation = "fires on digits"
    rec.examples = [
        Example(tokens=np.array([3, 4]), activations=np.array([0.5, 2.0]))
    ]
    rec.train = rec.examples
    rec.save(str(tmp_path), save_examples=True)
    with open(tmp_path / "layers.1_feature7.json") as f:
        data = json.load(f)
    assert data["explanation"] == "fires on digits"
    assert data["examples"][0]["tokens"] == [3, 4]
    assert data["examples"][0]["activations"] == [0.5, 2.0]


def test_cache_row_offsets_with_passthrough_batches():
    """Pass-through prepared batches whose size differs from the configured
    batch_size must still land on contiguous global dataset rows (the old
    batch_number * batch_size offset left phantom gaps)."""
    import jax

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.features.cache import FeatureCache
    from multimodal_sae_tpu.sae import Sae

    d, width = 8, 16
    sae = Sae(d, SaeConfig(num_latents=width, k=3), key=jax.random.PRNGKey(0))
    rng = np.random.default_rng(0)

    def capture_fn(batch):
        ids = np.asarray(batch["input_ids"])
        h = rng2.normal(size=(*ids.shape, d)).astype(np.float32)
        return {"m": jnp.asarray(h)}

    # Two caches over the same 6 rows: one via the dataset path (batch 2),
    # one via pass-through 3-row prepared batches with batch_size=16.
    rows = [{"input_ids": list(map(int, r))} for r in rng.integers(1, 9, (6, 4))]

    rng2 = np.random.default_rng(1)
    ref = FeatureCache(capture_fn, {"m": sae}, batch_size=2)
    ref.run(0, rows, progress=False)

    rng2 = np.random.default_rng(1)
    odd = FeatureCache(capture_fn, {"m": sae}, batch_size=16)
    prepared = [
        {"input_ids": np.asarray([r["input_ids"] for r in rows[i : i + 3]])}
        for i in (0, 3)
    ]
    odd.run(0, iter(prepared), progress=False)

    np.testing.assert_array_equal(
        np.asarray(ref.cache.feature_locations["m"]),
        np.asarray(odd.cache.feature_locations["m"]),
    )
    np.testing.assert_array_equal(
        np.asarray(ref.cache.feature_activations["m"]),
        np.asarray(odd.cache.feature_activations["m"]),
    )


def test_split_activation_quantiles_descending_input():
    """Constructors produce examples sorted DESCENDING by max activation; the
    threshold-quantile sampler must not crash on them (the reference's
    transcription raised from empty quantiles)."""
    from multimodal_sae_tpu.features.features import Example
    from multimodal_sae_tpu.features.samplers import split_activation_quantiles

    examples = [
        Example(tokens=np.arange(4), activations=np.full(4, a, np.float32))
        for a in (9.0, 7.0, 5.0, 3.5, 2.0, 1.0, 0.5, 0.1)
    ]
    out = split_activation_quantiles(examples, n_quantiles=4, n_samples=2)
    assert len(out) == 4
    got = [e.max_activation for q in out for e in q]
    assert len(got) == len(set(id(e) for q in out for e in q))  # no dupes
    # Every example lands in the quantile its max activation belongs to.
    for qi, q in enumerate(out):
        lo = 9.0 * qi / 4
        hi = 9.0 * (qi + 1) / 4 if qi < 3 else np.inf
        for e in q:
            assert lo <= e.max_activation < hi or (qi == 3 and e.max_activation == 9.0)


def test_feature_record_save_image_examples(tmp_path):
    """ImageExample records carry PIL images; save(save_examples=True) must
    serialize them (base64 PNG) instead of crashing — the reference's orjson
    raised on PIL objects too."""
    img = Image.new("RGB", (640, 480), (0, 128, 255))
    flat = np.zeros(8000, dtype=np.float32)
    flat[:10] = 2.0
    examples = prepare_image_examples(
        np.zeros((1, 8000)), [flat], [img], num_image_tokens=576
    )
    rec = FeatureRecord(Feature("layers.1", 9))
    rec.explanation = "blue regions"
    rec.examples = examples
    rec.train = rec.test = []
    rec.save(str(tmp_path), save_examples=True)
    with open(tmp_path / "layers.1_feature9.json") as f:
        data = json.load(f)
    import base64
    import io

    blob = data["examples"][0]["image"]["__pil_png_b64__"]
    back = Image.open(io.BytesIO(base64.b64decode(blob)))
    np.testing.assert_array_equal(np.asarray(back), np.asarray(img))


def test_cache_zero_entry_first_batch():
    """A module whose FIRST batch has no above-threshold entries must not
    crash the arena (reserve(0) never allocates), and must stay appendable."""
    from multimodal_sae_tpu.features.cache import Cache

    c = Cache(shard_size=0, batch_size=2)
    c.add_topk(
        np.zeros((1, 2, 3), np.float16),  # all below threshold
        np.zeros((1, 2, 3), np.int64),
        batch_number=0,
        module_path="m",
    )
    c.add_topk(
        np.full((1, 2, 3), 2.0, np.float16),
        np.tile(np.arange(3), (1, 2, 1)).astype(np.int64),
        batch_number=1,
        module_path="m",
    )
    c.save()
    assert c.feature_locations["m"].shape[0] == 6
    assert c.feature_activations["m"].dtype == np.float16


def test_load_threaded_matches_sequential(tmp_path):
    """num_workers>1 parallelizes split IO + construction across buffers, but
    sampling runs on the consuming thread in buffer-then-record order — so a
    threaded load must yield records identical to the sequential path
    (examples AND sampled train sets; the samplers' global-RNG call sequence
    is pinned observable behavior, samplers.py:1-11)."""
    from functools import partial

    from multimodal_sae_tpu.config import ExperimentConfig

    _, batches = _fill_cache_via_pipeline(tmp_path)
    tokens = np.arange(12 * 8).reshape(12, 8)  # fake token ids per cached row
    fcfg = FeatureConfig(
        width=L, n_splits=4, min_examples=1, max_examples=16, example_ctx_len=4
    )
    ecfg = ExperimentConfig(n_examples_train=1, train_type="random")
    constructor = partial(pool_max_activation_windows, tokens=tokens, cfg=fcfg)
    sampler = partial(sample, cfg=ecfg)

    def snapshot(num_workers, features=None):
        ds = FeatureDataset(
            str(tmp_path), fcfg, modules=["layers.0"], features=features
        )
        out = []
        for records in ds.load(
            constructor=constructor, sampler=sampler, num_workers=num_workers
        ):
            for r in records:
                out.append(
                    (
                        str(r.feature),
                        [e.tokens.tolist() for e in r.examples],
                        [float(e.max_activation) for e in r.examples],
                        [e.tokens.tolist() for e in r.train],
                    )
                )
        return out

    seq = snapshot(num_workers=0)
    par = snapshot(num_workers=4)
    assert len(seq) > 0
    assert seq == par

    # Composition with the r4 membership prefilter: a feature-subset request
    # (TensorBuffer._load takes the LUT-prefilter path) must also be
    # thread-invariant, and must equal the subset of the unfiltered load.
    def fid(t):
        return int(t[0].split("feature")[-1])

    pick = {"layers.0": np.array(sorted(fid(t) for t in seq[::3]))}
    want = [t for t in seq if fid(t) in pick["layers.0"]]
    assert want and snapshot(0, pick) == want and snapshot(4, pick) == want

    # collate=True flattens identically too.
    ds = FeatureDataset(str(tmp_path), fcfg, modules=["layers.0"])
    flat = ds.load(
        collate=True, constructor=constructor, sampler=sampler, num_workers=4
    )
    assert len(flat) == len(seq)


def test_load_threaded_propagates_constructor_errors(tmp_path):
    """An exception inside a worker-thread construction must surface to the
    consumer at drain time (not hang the pool or vanish), and SkipRecord
    must stay a per-record skip, not an error."""
    from multimodal_sae_tpu.features.samplers import SkipRecord

    _fill_cache_via_pipeline(tmp_path)
    fcfg = FeatureConfig(width=L, n_splits=4, min_examples=1, max_examples=16)
    calls = []

    def exploding(record, buffer_output):
        calls.append(record)
        if len(calls) == 3:
            raise RuntimeError("constructor blew up")

    ds = FeatureDataset(str(tmp_path), fcfg, modules=["layers.0"])
    gen = ds.load(constructor=exploding, num_workers=4)
    with pytest.raises(RuntimeError, match="constructor blew up"):
        for _ in gen:
            pass

    def skipping(record, buffer_output):
        raise SkipRecord()

    ds = FeatureDataset(str(tmp_path), fcfg, modules=["layers.0"])
    out = list(ds.load(constructor=skipping, num_workers=4))
    assert all(records == [] for records in out)  # every record skipped


def test_preallocate_preserves_activation_dtype_and_scales_hint():
    """Review r5: (a) preallocating at the default f32 must not silently
    upcast a non-f32 activation_dtype cache — the arena's dtype is fixed at
    first allocation; (b) run()'s hint is per-ROW (the CLIs pass ctx_len),
    so the reservation must scale by the dataset length."""
    sae = _make_sae()

    def capture_fn(batch):
        return {"layers.0": batch["h"]}

    fc = FeatureCache(
        capture_fn,
        {"layers.0": sae},
        batch_size=2,
        shard_size=0,
        activation_dtype=np.float16,
    )
    rows = [
        {"h": np.asarray(jax.random.normal(jax.random.PRNGKey(i), (4, D_IN)))}
        for i in range(4)
    ]
    fc.run(n_tokens=4, tokens=rows, progress=False)
    arena = fc.cache._arenas["layers.0"]
    assert arena.act.dtype == np.float16, arena.act.dtype
    # hint = n_tokens(per row) * len(rows) * k, not n_tokens * k.
    assert arena.loc.shape[0] >= 4 * len(rows) * sae.cfg.k
    locs, acts = fc.cache.feature_locations["layers.0"], None
    assert len(locs) > 0


def test_feature_cache_warns_on_hookpoint_with_zero_entries(caplog):
    """A hookpoint whose capture never matches (name mismatch / truncated
    layer) must warn loudly instead of ending in silently-empty shards."""
    import logging

    sae = _make_sae()

    def capture_fn(batch):
        return {"layers.0": batch["h"]}  # never returns "layers.9"

    fc = FeatureCache(
        capture_fn,
        {"layers.0": sae, "layers.9": sae},
        batch_size=2,
        shard_size=0,
    )
    rows = [
        {"h": np.asarray(jax.random.normal(jax.random.PRNGKey(i), (4, D_IN)))}
        for i in range(2)
    ]
    with caplog.at_level(logging.WARNING):
        fc.run(n_tokens=4, tokens=rows, progress=False)
    assert fc.cache._arenas["layers.0"].n > 0  # the real hookpoint cached
    assert any("layers.9" in r.message for r in caplog.records)
    assert not any("'layers.0'" in r.message for r in caplog.records)


def test_concate_merges_ranks_in_numeric_order(tmp_path):
    """Rank shards must merge in NUMERIC rank order at world >= 10 —
    lexicographic sorting interleaves Rank10 between Rank1 and Rank2,
    breaking the merged file's row-major dataset ordering. (The reference
    is worse: its single-digit regex silently DROPS ranks >= 10 and its
    os.listdir order is arbitrary; both deliberately fixed.)"""
    from safetensors.numpy import load_file, save_file

    sae = _make_sae()
    fc = FeatureCache(lambda b: {}, {"layers.0": sae}, batch_size=1, shard_size=0)
    module_dir = tmp_path / "layers.0"
    module_dir.mkdir(parents=True)
    n_ranks = 12
    split_indices = fc._generate_split_indices(1)
    (start, end) = split_indices[0]
    for r in range(n_ranks):
        save_file(
            {
                # One row per rank whose dataset-row column IS the rank.
                "locations": np.array([[r, 0, 0]], dtype=np.int64),
                "activations": np.array([float(r)], dtype=np.float32),
            },
            str(module_dir / f"Rank{r}_{start}_{end}.safetensors"),
        )
    # concate reads modules from the cache's arenas; touch layers.0.
    fc.cache._arenas["layers.0"]
    fc.concate_safetensors(1, str(tmp_path))
    merged = load_file(str(module_dir / f"{start}_{end}.safetensors"))
    np.testing.assert_array_equal(
        merged["locations"][:, 0], np.arange(n_ranks, dtype=np.int64)
    )
    np.testing.assert_array_equal(
        merged["activations"], np.arange(n_ranks, dtype=np.float32)
    )


def test_feature_dataset_rejects_out_of_range_filter_ids(tmp_path):
    """A filter id at/over the SAE width (or negative) must fail with a
    clear ValueError at construction, not a raw IndexError or a nonsense
    shard path at load time."""
    _fill_cache_via_pipeline(tmp_path)
    for bad in (np.array([L]), np.array([-3])):
        with pytest.raises(ValueError, match="outside"):
            FeatureDataset(
                str(tmp_path),
                FeatureConfig(width=L, n_splits=4, min_examples=1),
                modules=["layers.0"],
                features={"layers.0": bad},
            )


def test_run_accepts_raw_token_rows():
    """The reference's plain tensor-dataset shape: raw (non-dict) rows are
    token-id sequences and must flow end-to-end as an input_ids batch."""
    sae = _make_sae()
    embed = np.asarray(
        jax.random.normal(jax.random.PRNGKey(7), (32, D_IN), dtype=jnp.float32)
    )

    def capture_fn(batch):
        return {"layers.0": embed[np.asarray(batch["input_ids"])]}

    fc = FeatureCache(capture_fn, {"layers.0": sae}, batch_size=2, shard_size=0)
    rows = np.random.default_rng(0).integers(0, 32, size=(4, 8))
    fc.run(n_tokens=8, tokens=rows, progress=False)
    assert fc.cache._arenas["layers.0"].n > 0


def test_image_cache_rejects_unknown_run_kwargs(tmp_path):
    """FeatureImageCache.run used to swallow **kw silently — an explicit
    skip_bos=False was discarded while True was forced."""
    from multimodal_sae_tpu.features import FeatureImageCache

    sae = _make_sae()
    fc = FeatureImageCache(lambda b: {}, {"layers.0": sae}, batch_size=1, shard_size=0)
    with pytest.raises(TypeError, match="skip_bos"):
        fc.run(4, [], skip_bos=False)
