"""Feature-index sidecars (.featidx) + the zero-copy mmap split reader.

The sidecar/mmap fast path must be INVISIBLE behaviorally: every record a
`TensorBuffer`/`FeatureDataset` yields through it must be byte-identical to
the plain `safetensors.load_file` + O(N)-scan path (which itself is pinned
against the reference's per-feature boolean masks, reference
sae_auto_interp/features/loader.py:92-118).  The canonical split files are a
bit-parity surface and are never modified — only `.featidx` files appear.
"""

import os

import numpy as np
import pytest
from safetensors.numpy import save_file

from multimodal_sae_tpu.config import FeatureConfig
from multimodal_sae_tpu.features.loader import FeatureDataset, TensorBuffer
from multimodal_sae_tpu.features.split_index import (
    ensure_index,
    index_path,
    mmap_safetensors,
    read_index,
    write_index,
)


def _write_split(path, n=600, width=64, rows=12, ctx=8, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    loc = np.stack(
        [
            rng.integers(0, rows, n),
            rng.integers(0, ctx, n),
            rng.integers(0, width, n),
        ],
        axis=1,
    ).astype(np.int64)
    # Row-major order like a real cache (written batch by batch).
    loc = loc[np.lexsort((loc[:, 1], loc[:, 0]))]
    acts = rng.random(n).astype(dtype)
    save_file({"locations": loc, "activations": acts}, str(path))
    return loc, acts


def _drain(buf):
    """Materialize a buffer's outputs as comparable tuples."""
    return [
        (o.feature.feature_index, o.locations.copy(), o.activations.copy())
        for o in buf
    ]


def _assert_same(outs_a, outs_b):
    assert len(outs_a) == len(outs_b)
    for (fa, la, aa), (fb, lb, ab) in zip(outs_a, outs_b):
        assert fa == fb
        np.testing.assert_array_equal(la, lb)
        np.testing.assert_array_equal(aa, ab)
        assert la.dtype == lb.dtype and aa.dtype == ab.dtype


def test_mmap_matches_load_file(tmp_path):
    from safetensors.numpy import load_file

    p = tmp_path / "0_63.safetensors"
    _write_split(p, dtype=np.float16)
    ref = load_file(str(p))
    got = mmap_safetensors(str(p))
    assert set(ref) == set(got)
    for k in ref:
        np.testing.assert_array_equal(ref[k], got[k])
        assert ref[k].dtype == got[k].dtype
        assert not got[k].flags.writeable  # page-cache views, not copies


@pytest.mark.parametrize("filtered", [False, True])
def test_sidecar_parity(tmp_path, filtered):
    """Outputs through a sidecar == outputs through the scan path, for both
    filtered and full-split iteration, including min_examples skips."""
    d = tmp_path / "m"
    d.mkdir()
    p = d / "0_63.safetensors"
    loc, _ = _write_split(p)
    feats = (
        np.array([3, 7, 11, 63, 2], dtype=np.int64) if filtered else None
    )

    def make():
        return TensorBuffer(str(p), "m", features=feats, min_examples=3)

    os.environ["MMSAE_NO_FEATIDX"] = "1"
    try:
        baseline = _drain(make())
    finally:
        os.environ.pop("MMSAE_NO_FEATIDX")

    assert write_index(str(p), loc[:, 2])
    assert os.path.exists(index_path(str(p)))
    _assert_same(baseline, _drain(make()))

    # The canonical split file itself was never touched.
    assert read_index(str(p), loc.shape[0]) is not None


def test_unfiltered_load_self_heals(tmp_path):
    """A full-split load already pays the feature sort; it persists the
    sidecar so later (filtered) loads are O(selected)."""
    d = tmp_path / "m"
    d.mkdir()
    p = d / "0_63.safetensors"
    _write_split(p)
    assert not os.path.exists(index_path(str(p)))
    first = _drain(TensorBuffer(str(p), "m", min_examples=1))
    assert os.path.exists(index_path(str(p)))
    # And the healed index is immediately valid + parity-preserving.
    second = _drain(TensorBuffer(str(p), "m", min_examples=1))
    _assert_same(first, second)


def test_stale_sidecar_ignored_and_replaced(tmp_path):
    """A regenerated split must never be read through the old permutation."""
    d = tmp_path / "m"
    d.mkdir()
    p = d / "0_63.safetensors"
    loc, _ = _write_split(p, seed=1)
    write_index(str(p), loc[:, 2])
    # Regenerate the split with different contents/size.
    loc2, acts2 = _write_split(p, n=400, seed=2)
    assert read_index(str(p), 400) is None  # stale: ignored

    buf = TensorBuffer(str(p), "m", min_examples=1)
    outs = list(buf)
    # Values must reflect the NEW split.
    total = sum(o.activations.shape[0] for o in outs)
    assert total == 400
    # The unfiltered load healed a fresh, valid index.
    idx = read_index(str(p), 400)
    assert idx is not None
    order, feats_sorted = idx
    np.testing.assert_array_equal(loc2[order, 2], feats_sorted)


def test_unwritable_sidecar_is_nonfatal(tmp_path, monkeypatch):
    """Sidecar persistence is best-effort: a read-only cache dir costs speed,
    never correctness (write_index returns False instead of raising)."""
    d = tmp_path / "m"
    d.mkdir()
    p = d / "0_63.safetensors"
    _write_split(p)

    def boom(*a, **k):
        raise OSError("read-only filesystem")

    monkeypatch.setattr(os, "replace", boom)
    outs = _drain(TensorBuffer(str(p), "m", min_examples=1))
    assert outs and not os.path.exists(index_path(str(p)))


def test_corrupt_ids_not_indexed(tmp_path):
    d = tmp_path / "m"
    d.mkdir()
    p = d / "0_63.safetensors"
    loc = np.array([[0, 0, -5], [1, 1, 3]], dtype=np.int64)
    save_file(
        {"locations": loc, "activations": np.ones(2, dtype=np.float32)}, str(p)
    )
    assert not write_index(str(p), loc[:, 2])
    assert not os.path.exists(index_path(str(p)))


def test_dataset_parity_through_sidecars(tmp_path):
    """FeatureDataset end-to-end: records constructed through indexed splits
    are byte-identical to the scan path (the scoring-bench path)."""
    from functools import partial

    from multimodal_sae_tpu.features.constructors import (
        pool_max_activation_windows,
    )

    width, n_splits, rows, ctx = 64, 4, 24, 16
    module = "model.layers.0"
    root = tmp_path / "cache"
    (root / module).mkdir(parents=True)
    rng = np.random.default_rng(3)
    edges = np.linspace(0, width, n_splits + 1).astype(np.int64)
    for s, e in zip(edges[:-1], edges[1:]):
        n = 800
        loc = np.stack(
            [
                rng.integers(0, rows, n),
                rng.integers(0, ctx, n),
                rng.integers(s, e, n),
            ],
            axis=1,
        ).astype(np.int64)
        loc = loc[np.lexsort((loc[:, 1], loc[:, 0]))]
        save_file(
            {
                "locations": loc,
                "activations": rng.random(n).astype(np.float32),
            },
            str(root / module / f"{s}_{e - 1}.safetensors"),
        )
    tokens = rng.integers(0, 1000, size=(rows, ctx))
    fcfg = FeatureConfig(
        width=width,
        n_splits=n_splits,
        min_examples=1,
        max_examples=5,
        example_ctx_len=4,
    )
    sel = np.array([1, 5, 17, 33, 50, 63], dtype=np.int64)
    ctor = partial(pool_max_activation_windows, tokens=tokens, cfg=fcfg)

    def records():
        ds = FeatureDataset(
            str(root), fcfg, modules=[module], features={module: sel}
        )
        out = []
        for recs in ds.load(constructor=ctor):
            for r in recs:
                out.append(
                    (
                        r.feature.feature_index,
                        [(e.tokens.copy(), e.activations.copy()) for e in r.examples],
                    )
                )
        return out

    os.environ["MMSAE_NO_FEATIDX"] = "1"
    try:
        baseline = records()
    finally:
        os.environ.pop("MMSAE_NO_FEATIDX")

    assert ensure_index(str(root)) == n_splits
    indexed = records()

    assert len(baseline) == len(indexed)
    for (fa, ea), (fb, eb) in zip(baseline, indexed):
        assert fa == fb and len(ea) == len(eb)
        for (ta, aa), (tb, ab) in zip(ea, eb):
            np.testing.assert_array_equal(ta, tb)
            np.testing.assert_array_equal(aa, ab)


def test_merger_emits_sidecars(tmp_path):
    """concate_safetensors writes a valid .featidx next to each merged split
    (the data is in memory at merge time — indexing there is near-free)."""
    pytest.importorskip("jax")
    from multimodal_sae_tpu.features.cache import Cache

    width, n_splits = 64, 2
    cache = Cache(shard_size=0, batch_size=4)
    rng = np.random.default_rng(7)
    module = "model.layers.0"
    for b in range(3):
        k = 8
        vals = rng.random((4, 6, k)).astype(np.float32)
        idx = rng.integers(0, width, (4, 6, k)).astype(np.int64)
        cache.add_topk(vals, idx, b, module)
    cache.save()

    from multimodal_sae_tpu.features.cache import FeatureCache

    fc = FeatureCache.__new__(FeatureCache)
    fc.cache = cache
    fc.width = width
    fc._stream = None
    fc.save_splits(n_splits, str(tmp_path), rank=0)
    fc.concate_safetensors(n_splits, str(tmp_path))

    edges = np.linspace(0, width, n_splits + 1).astype(np.int64)
    for s, e in zip(edges[:-1], edges[1:]):
        split = str(tmp_path / module / f"{s}_{e - 1}.safetensors")
        assert os.path.exists(split)
        m = mmap_safetensors(split)
        assert read_index(split, m["locations"].shape[0]) is not None
