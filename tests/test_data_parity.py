"""Direct behavioral parity with the reference's data pipeline: when the
read-only reference mount is present, run its `chunk_and_tokenize` and ours on
the same dataset+tokenizer and require identical token streams."""

import importlib.util
import json
import sys
from pathlib import Path

import numpy as np
import pytest

REFERENCE_DATA = Path("/root/reference/train/sae/sae/data.py")

datasets = pytest.importorskip("datasets")
transformers = pytest.importorskip("transformers")


def _load_reference_module():
    spec = importlib.util.spec_from_file_location("_reference_data", REFERENCE_DATA)
    mod = importlib.util.module_from_spec(spec)
    # Register before exec so datasets' fingerprint pickling can resolve the
    # module's globals (e.g. its TypeVar) by name.
    sys.modules["_reference_data"] = mod
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def tokenizer(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    vocab = {chr(33 + i): i for i in range(90)}
    vocab["<|endoftext|>"] = 90
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text("#version: 0.2\n")
    tok = transformers.GPT2Tokenizer.from_pretrained(str(d))
    tok.model_max_length = 512
    return tok


@pytest.mark.skipif(not REFERENCE_DATA.exists(), reason="reference mount absent")
def test_chunk_and_tokenize_matches_reference(tokenizer):
    from multimodal_sae_tpu.train.data import chunk_and_tokenize

    rng = np.random.default_rng(0)
    texts = [
        "".join(chr(33 + int(c)) for c in rng.integers(0, 80, size=n))
        for n in rng.integers(5, 200, size=40)
    ]
    ds = datasets.Dataset.from_dict({"text": texts})

    ours = chunk_and_tokenize(
        ds, tokenizer, max_seq_len=16, num_proc=1, load_from_cache_file=False
    )
    ref_mod = _load_reference_module()
    theirs = ref_mod.chunk_and_tokenize(
        ds, tokenizer, max_seq_len=16, num_proc=1, load_from_cache_file=False
    )

    ours_ids = np.stack([np.asarray(r) for r in ours["input_ids"]])
    theirs_ids = np.stack([r.numpy() for r in theirs["input_ids"]])
    np.testing.assert_array_equal(ours_ids, theirs_ids)
    # Fixed-length chunks, EOS-joined stream starting with EOS.
    assert ours_ids.shape[1] == 16
    assert ours_ids[0, 0] == tokenizer.eos_token_id


@pytest.mark.skipif(not REFERENCE_DATA.exists(), reason="reference mount absent")
def test_memmap_dataset_matches_reference(tmp_path):
    from multimodal_sae_tpu.train.data import MemmapDataset

    ref_mod = _load_reference_module()
    arr = np.arange(4 * 64, dtype=np.uint16)
    path = tmp_path / "tokens.bin"
    arr.tofile(path)

    ours = MemmapDataset(str(path), ctx_len=16)
    theirs = ref_mod.MemmapDataset(str(path), ctx_len=16)
    assert len(ours) == len(theirs)
    np.testing.assert_array_equal(
        ours[3]["input_ids"], theirs[3]["input_ids"].numpy()
    )
    np.testing.assert_array_equal(
        ours.shard(3, 1)[0]["input_ids"], theirs.shard(3, 1)[0]["input_ids"].numpy()
    )
