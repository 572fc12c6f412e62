"""Streaming split-shard persistence (features/stream_writer.py): shards
written incrementally during the run must parse as valid safetensors, carry
arrays byte-identical to the buffered `save_splits` path, and produce
byte-identical merged `{start}_{end}.safetensors` files through
`concate_safetensors` (VERDICT r1 item 8; reference format cache.py:243-309).
"""

import os

import numpy as np
import pytest

import jax

from multimodal_sae_tpu.config import SaeConfig
from multimodal_sae_tpu.features.cache import FeatureCache
from multimodal_sae_tpu.sae import Sae

D_IN = 16
N_SPLITS = 4


def _make_sae():
    return Sae(D_IN, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0))


def _run_cache(tmp_path, streaming: bool, n_batches=6, bs=2, seq=8):
    sae = _make_sae()
    keys = jax.random.split(jax.random.PRNGKey(3), n_batches)
    batches = [jax.random.normal(k, (bs, seq, D_IN)) for k in keys]

    def capture_fn(batch):
        return {"layers.0": batch["h"]}

    fc = FeatureCache(capture_fn, {"layers.0": sae}, batch_size=bs, shard_size=0)
    if streaming:
        fc.enable_streaming(str(tmp_path), N_SPLITS, rank=0)
    for i, b in enumerate(batches):
        fc.process_batch({"h": b}, i)
    fc.cache.save()
    fc.save_splits(N_SPLITS, str(tmp_path), rank=0)
    return fc


def test_streamed_rank_shards_match_buffered(tmp_path):
    from safetensors.numpy import load_file

    buf_dir = tmp_path / "buffered"
    str_dir = tmp_path / "streamed"
    os.makedirs(buf_dir)
    os.makedirs(str_dir)
    _run_cache(buf_dir, streaming=False)
    _run_cache(str_dir, streaming=True)

    files = sorted(os.listdir(buf_dir / "layers.0"))
    assert files == sorted(os.listdir(str_dir / "layers.0"))
    assert len(files) == N_SPLITS
    assert not any(f.endswith(".acts") for f in files)  # sidecars cleaned up
    for f in files:
        a = load_file(str(buf_dir / "layers.0" / f))
        b = load_file(str(str_dir / "layers.0" / f))
        assert a["locations"].dtype == b["locations"].dtype == np.int64
        assert a["activations"].dtype == b["activations"].dtype
        np.testing.assert_array_equal(a["locations"], b["locations"])
        np.testing.assert_array_equal(
            a["activations"].view(np.uint8), b["activations"].view(np.uint8)
        )


def test_streamed_merged_files_byte_identical(tmp_path):
    buf_dir = tmp_path / "buffered"
    str_dir = tmp_path / "streamed"
    os.makedirs(buf_dir)
    os.makedirs(str_dir)
    fc_b = _run_cache(buf_dir, streaming=False)
    fc_s = _run_cache(str_dir, streaming=True)
    fc_b.concate_safetensors(N_SPLITS, str(buf_dir))
    fc_s.concate_safetensors(N_SPLITS, str(str_dir))

    files = sorted(os.listdir(buf_dir / "layers.0"))
    assert files == sorted(os.listdir(str_dir / "layers.0"))
    # Byte-identity covers the .featidx sidecars too: identical merged splits
    # must index identically (split_index.py keeps the sidecar deterministic).
    for f in files:
        assert (buf_dir / "layers.0" / f).read_bytes() == (
            str_dir / "layers.0" / f
        ).read_bytes(), f


def test_streaming_rejects_boundary_drop_and_split_mismatch(tmp_path):
    fc = _run_cache(tmp_path, streaming=False, n_batches=1)
    fc.enable_streaming(str(tmp_path / "s2"), N_SPLITS)
    with pytest.raises(ValueError):
        fc.save_splits(N_SPLITS, str(tmp_path / "s2"), replicate_boundary_drop=True)
    with pytest.raises(ValueError):
        fc.save_splits(N_SPLITS + 1, str(tmp_path / "s2"))


def test_streamed_empty_module_splits(tmp_path):
    """A filter keeping only low features leaves high splits empty; the
    streamed shards must still exist (like the buffered path) and merge."""
    from safetensors.numpy import load_file

    sae = _make_sae()

    def capture_fn(batch):
        return {"layers.0": batch["h"]}

    fc = FeatureCache(
        capture_fn,
        {"layers.0": sae},
        batch_size=2,
        shard_size=0,
        filters={"layers.0": np.array([0, 1, 2, 3])},
    )
    fc.enable_streaming(str(tmp_path), N_SPLITS, rank=0)
    fc.process_batch({"h": jax.random.normal(jax.random.PRNGKey(0), (2, 8, D_IN))}, 0)
    fc.cache.save()
    fc.save_splits(N_SPLITS, str(tmp_path), rank=0)
    files = sorted(os.listdir(tmp_path / "layers.0"))
    assert len(files) == N_SPLITS
    high = load_file(str(tmp_path / "layers.0" / files[-1]))
    assert high["locations"].shape == (0, 3)
    fc.concate_safetensors(N_SPLITS, str(tmp_path))
    # N_SPLITS canonical splits; the merger's .featidx sidecars (r5) ride
    # alongside and are not counted here.
    assert (
        len(
            [
                f
                for f in os.listdir(tmp_path / "layers.0")
                if f.endswith(".safetensors")
            ]
        )
        == N_SPLITS
    )


def test_writer_thread_death_surfaces_instead_of_hanging(tmp_path):
    """A dead worker (e.g. disk full) must raise on the producer side even
    when the bounded queue is full — not hang submit()/close() forever."""
    import numpy as np

    from multimodal_sae_tpu.features.stream_writer import StreamingSplitWriter

    w = StreamingSplitWriter(str(tmp_path), [(0, 31), (32, 63)], rank=0)

    def boom(*a, **k):
        raise OSError("No space left on device")

    w._append_chunk = boom  # simulate the failure inside the worker
    locs = np.zeros((8, 3), np.int64)
    acts = np.ones((8,), np.float32)
    import pytest

    with pytest.raises(OSError):
        for _ in range(64):  # enough to fill the maxsize-4 queue
            w.submit("layers.0", locs, acts)
    with pytest.raises(OSError):
        w.close()


def test_streamed_zero_entry_module_still_gets_shards(tmp_path):
    """A hookpoint whose filter excludes every fired feature produces ZERO
    COO entries; the streaming close must still write its (empty) Rank
    shards — the rank-0 merge iterates every cached module and would
    otherwise find no files at all (review r3)."""
    from safetensors.numpy import load_file

    sae = _make_sae()

    def capture_fn(batch):
        return {"layers.0": batch["h"], "layers.1": batch["h"]}

    fc = FeatureCache(
        capture_fn,
        {"layers.0": sae, "layers.1": sae},
        batch_size=2,
        shard_size=0,
        filters={
            "layers.0": np.arange(64),
            "layers.1": np.array([], dtype=np.int64),  # nothing ever kept
        },
    )
    fc.enable_streaming(str(tmp_path), N_SPLITS, rank=0)
    fc.process_batch({"h": jax.random.normal(jax.random.PRNGKey(0), (2, 8, D_IN))}, 0)
    fc.cache.save()
    fc.save_splits(N_SPLITS, str(tmp_path), rank=0)
    files = sorted(os.listdir(tmp_path / "layers.1"))
    assert len(files) == N_SPLITS
    for f in files:
        data = load_file(str(tmp_path / "layers.1" / f))
        assert data["locations"].shape == (0, 3)
    fc.concate_safetensors(N_SPLITS, str(tmp_path))
    merged = sorted(os.listdir(tmp_path / "layers.1"))
    # N_SPLITS canonical splits + N_SPLITS .featidx sidecars (r5 merger).
    assert len([f for f in merged if f.endswith(".safetensors")]) == N_SPLITS
    assert len([f for f in merged if f.endswith(".featidx")]) == N_SPLITS


def test_concate_raises_on_missing_rank_shards(tmp_path):
    """Zero shard files for a split means a rank's output is missing; the
    merge must say so instead of dying in np.concatenate([])."""
    fc = _run_cache(tmp_path, streaming=False)
    # Remove every shard of one split.
    for f in os.listdir(tmp_path / "layers.0"):
        if f.endswith("_15.safetensors"):
            os.remove(tmp_path / "layers.0" / f)
    with pytest.raises(FileNotFoundError, match="missing"):
        fc.concate_safetensors(N_SPLITS, str(tmp_path))


def test_streaming_rejects_unserializable_dtype(tmp_path):
    """An unsupported activation dtype must fail at enable time, not at
    finalize after the whole run."""
    from multimodal_sae_tpu.features.stream_writer import StreamingSplitWriter

    with pytest.raises(TypeError, match="cannot serialize"):
        StreamingSplitWriter(str(tmp_path), [(0, 7)], act_dtype=np.complex64)


def test_streaming_f64_roundtrip(tmp_path):
    """float64 shards (previously a KeyError at finalize) stream and parse."""
    from safetensors.numpy import load_file

    from multimodal_sae_tpu.features.stream_writer import StreamingSplitWriter

    w = StreamingSplitWriter(str(tmp_path), [(0, 7)], act_dtype=np.float64)
    locs = np.array([[0, 1, 2], [0, 3, 5]], np.int64)
    acts = np.array([1.5, 2.5], np.float64)
    w.submit("m", locs, acts)
    counts = w.close()
    assert counts == {"m": 2}
    data = load_file(str(tmp_path / "m" / "Rank0_0_7.safetensors"))
    assert data["activations"].dtype == np.float64
    np.testing.assert_array_equal(data["activations"], acts)
    np.testing.assert_array_equal(data["locations"], locs)


def test_streaming_worker_error_aborts_cleanly(tmp_path):
    """A worker failure must surface AND leave no partial zero-header shards
    behind for a retry/merge to choke on."""
    from multimodal_sae_tpu.features import stream_writer as swmod

    w = swmod.StreamingSplitWriter(str(tmp_path), [(0, 7)])
    locs = np.array([[0, 1, 2]], np.int64)
    acts = np.array([1.0], np.float32)
    w.submit("m", locs, acts)

    # Inject a failure into the worker's append path for the next chunk.
    def boom(*a, **k):
        raise OSError("disk full")

    w._append_chunk = boom
    with pytest.raises(OSError, match="disk full"):
        w.submit("m", locs, acts)
        w.close()
    leftovers = list(tmp_path.rglob("*.safetensors")) + list(tmp_path.rglob("*.acts"))
    assert leftovers == [], leftovers


def test_abort_joins_inflight_worker_before_removing_files(tmp_path):
    """abort() must stop+join the worker BEFORE deleting shard files: a
    worker mid-chunk (or with chunks still queued) at abort time would
    otherwise recreate appenders after the cleanup pass and leave
    zeroed-header partial shards that escape removal."""
    import threading

    from multimodal_sae_tpu.features import stream_writer as swmod

    w = swmod.StreamingSplitWriter(str(tmp_path), [(0, 7)])
    entered = threading.Event()
    release = threading.Event()
    orig = w._append_chunk

    def gated(module, locs, acts):
        entered.set()
        assert release.wait(30)
        orig(module, locs, acts)

    w._append_chunk = gated
    locs = np.array([[0, 1, 2]], np.int64)
    acts = np.array([1.0], np.float32)
    w.submit("m", locs, acts)  # worker picks this up and blocks in gated
    assert entered.wait(30)
    w.submit("m", locs, acts)  # a second chunk left sitting in the queue
    threading.Timer(0.2, release.set).start()
    w.abort()  # joins the worker, THEN removes whatever files it created
    assert not w._thread.is_alive()
    leftovers = list(tmp_path.rglob("*.safetensors")) + list(tmp_path.rglob("*.acts"))
    assert leftovers == [], leftovers


def test_run_failure_aborts_streaming(tmp_path):
    """An exception inside FeatureCache.run must abort the streaming writer:
    partial shards with zeroed (unparseable) headers would otherwise poison
    a later concate pass."""
    sae = _make_sae()
    fc = FeatureCache(
        lambda b: {"layers.0": b["h"]}, {"layers.0": sae}, batch_size=2, shard_size=0
    )
    fc.enable_streaming(str(tmp_path), N_SPLITS, rank=0)

    batches = [
        {"h": jax.random.normal(jax.random.PRNGKey(1), (2, 8, D_IN))},
        "poison",  # _device_step blows up on the second batch
    ]
    with pytest.raises(Exception):
        fc.run(0, batches, progress=False)
    leftover = [
        f
        for f in os.listdir(tmp_path / "layers.0")
        if f.startswith("Rank") or f.endswith(".acts")
    ] if (tmp_path / "layers.0").exists() else []
    assert leftover == [], leftover


def test_submit_after_abort_raises_instead_of_hanging(tmp_path):
    """After abort() the worker is dead and the queue never drains; a later
    submit() used to spin in _put forever once the bounded queue filled.
    It must raise immediately instead."""
    from multimodal_sae_tpu.features import stream_writer as swmod

    w = swmod.StreamingSplitWriter(str(tmp_path), [(0, 7)])
    w.abort()
    locs = np.array([[0, 1, 2]], np.int64)
    acts = np.array([1.0], np.float32)
    with pytest.raises(RuntimeError, match="aborted"):
        for _ in range(8):  # more than the 4-slot queue, would wedge pre-fix
            w.submit("m", locs, acts)


def test_abort_skips_file_removal_while_worker_wedged(tmp_path):
    """If the worker outlives the 30s join (wedged filesystem write), abort()
    must NOT delete files underneath it — a live append would recreate
    partial shards after the cleanup pass."""
    import threading

    from multimodal_sae_tpu.features import stream_writer as swmod

    w = swmod.StreamingSplitWriter(str(tmp_path), [(0, 7)])
    entered = threading.Event()
    release = threading.Event()
    orig = w._append_chunk
    calls = []

    def wedged(module, locs, acts):
        calls.append(1)
        if len(calls) == 1:  # first chunk writes normally, creating the shard
            return orig(module, locs, acts)
        entered.set()
        assert release.wait(60)
        orig(module, locs, acts)

    w._append_chunk = wedged
    locs = np.array([[0, 1, 2]], np.int64)
    acts = np.array([1.0], np.float32)
    w.submit("m", locs, acts)
    w.submit("m", locs, acts)  # worker wedges inside this one
    assert entered.wait(30)
    # Make the join timeout instant so the test doesn't sleep 30s.
    real_join = w._thread.join
    w._thread.join = lambda timeout=None: real_join(timeout=0.05)
    w.abort()
    assert w._thread.is_alive()  # worker genuinely still wedged
    # Files were left alone (partial shard still present, not deleted).
    assert list(tmp_path.rglob("*.safetensors")), "wedged shard was deleted"
    release.set()
    real_join(timeout=30)
