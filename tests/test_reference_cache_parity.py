"""Byte-parity of emitted cache files against the reference's *own*
`FeatureCache` (imported from the read-only mount and driven on torch-CPU).

Strategy: both pipelines see bit-identical hidden states (an integer-valued
embedding lookup — exact in every framework) and share integer-valued SAE
weights, so the pre-activation matmul is exact integer arithmetic in both
torch and XLA and the emitted fp32 activations carry identical bits.  k is
chosen larger than any row's count of strictly-positive pre-activations, so
top-k tie-breaking differences cannot change the surviving (>1e-5) set.
Asserts byte-equality of every merged `{start}_{end}.safetensors` produced by
`run -> save_splits -> concate_safetensors` (reference features/cache.py:
158-309) with `replicate_boundary_drop=True` (the reference silently drops
features on split boundaries; cache.py:243-247,293-294).

Skipped when the mount is absent."""

import sys

import numpy as np
import pytest

from multimodal_sae_tpu.utils.reference_mount import (
    REFERENCE_ROOT as REF_ROOT,
    load_reference_cache_module as _load_reference_cache_module,
    load_reference_sae_module as _load_reference_sae,
)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


class _EmbedModel(torch.nn.Module):
    """Tiny subject model whose hookpoint output is an exact table lookup."""

    def __init__(self, table: torch.Tensor):
        super().__init__()
        self.embed = torch.nn.Embedding.from_pretrained(table.clone())

    @property
    def device(self):
        return torch.device("cpu")

    def forward(self, input_ids):
        return self.embed(input_ids)


D_IN, WIDTH, K = 16, 64, 48
VOCAB, N_ROWS, SEQ, BATCH = 32, 12, 6, 4
N_SPLITS = 3


@pytest.fixture(scope="module")
def shared_setup(tmp_path_factory):
    """Integer embedding table + integer-weight reference SAE checkpoint."""
    rng = np.random.default_rng(0)
    table = rng.integers(-3, 4, size=(VOCAB, D_IN)).astype(np.float32)
    tokens = rng.integers(0, VOCAB, size=(N_ROWS, SEQ)).astype(np.int64)

    ref_sae_mod = _load_reference_sae()
    ref_cfg_mod = sys.modules["_refsae.config"]
    torch.manual_seed(0)
    ref_sae = ref_sae_mod.Sae(
        D_IN, ref_cfg_mod.SaeConfig(num_latents=WIDTH, k=K)
    )
    with torch.no_grad():
        W = torch.tensor(
            rng.integers(-2, 3, size=(WIDTH, D_IN)).astype(np.float32)
        )
        ref_sae.encoder.weight.copy_(W)
        ref_sae.encoder.bias.copy_(
            torch.tensor(rng.integers(-2, 1, size=(WIDTH,)).astype(np.float32))
        )
        ref_sae.W_dec.copy_(W)
        ref_sae.b_dec.zero_()
    ckpt = tmp_path_factory.mktemp("ckpt") / "embed"
    ref_sae.save_to_disk(ckpt)

    # Precondition for byte-parity: no row may have >= K strictly-positive
    # pre-activations (otherwise top-k tie-breaking could differ).
    with torch.no_grad():
        pre = ref_sae.pre_acts(torch.tensor(table[tokens.reshape(-1)]))
    assert int((pre > 0).sum(-1).max()) < K
    return table, tokens, ref_sae, ckpt


def _run_reference(cache_mod, table, tokens, ref_sae, out_dir):
    import datasets

    model = _EmbedModel(torch.tensor(table))
    fc = cache_mod.FeatureCache(
        model,
        tokenizer=None,
        submodule_dict={"embed": ref_sae},
        batch_size=BATCH,
        shard_size=0,
    )
    ds = datasets.Dataset.from_dict({"input_ids": tokens.tolist()})
    ds = ds.with_format("torch")
    fc.run(n_tokens=BATCH * SEQ, tokens=ds)
    (out_dir / "embed").mkdir(parents=True, exist_ok=True)
    fc.save_splits(N_SPLITS, str(out_dir), rank=0)
    fc.concate_safetensors(N_SPLITS, str(out_dir))


def _run_ours(table, tokens, ckpt, out_dir):
    import jax.numpy as jnp

    from multimodal_sae_tpu.features.cache import FeatureCache
    from multimodal_sae_tpu.sae import Sae

    sae = Sae.load_from_disk(ckpt, dtype=jnp.float32)
    jtable = jnp.asarray(table)

    def capture_fn(batch):
        ids = jnp.asarray(np.asarray(batch["input_ids"]))
        return {"embed": jtable[ids]}

    fc = FeatureCache(
        capture_fn,
        {"embed": sae},
        batch_size=BATCH,
        shard_size=0,
        activation_dtype=np.float32,
    )
    rows = [{"input_ids": tokens[i]} for i in range(len(tokens))]
    fc.run(n_tokens=BATCH * SEQ, tokens=rows, progress=False)
    fc.save_splits(N_SPLITS, str(out_dir), rank=0, replicate_boundary_drop=True)
    fc.concate_safetensors(N_SPLITS, str(out_dir))


@pytest.mark.skipif(not REF_ROOT.exists(), reason="reference mount absent")
def test_cache_split_files_byte_equal(shared_setup, tmp_path):
    table, tokens, ref_sae, ckpt = shared_setup
    cache_mod = _load_reference_cache_module()

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()
    _run_reference(cache_mod, table, tokens, ref_sae, ref_dir)
    _run_ours(table, tokens, ckpt, our_dir)

    ref_files = sorted((ref_dir / "embed").glob("*.safetensors"))
    our_files = sorted((our_dir / "embed").glob("*.safetensors"))
    assert [f.name for f in ref_files] == [f.name for f in our_files]
    assert len(ref_files) == N_SPLITS
    total = 0
    for rf, of in zip(ref_files, our_files):
        assert rf.read_bytes() == of.read_bytes(), rf.name
        from safetensors.numpy import load_file

        total += len(load_file(rf)["activations"])
    assert total > 0  # the comparison actually covered data


@pytest.mark.skipif(not REF_ROOT.exists(), reason="reference mount absent")
def test_image_cache_bos_drop_matches_reference(shared_setup, tmp_path):
    """FeatureImageCache drops the leading BOS position before encoding
    (reference cache.py:402-409): drive the reference class with hooked
    activations and compare the merged files against our skip_bos path."""
    table, tokens, ref_sae, ckpt = shared_setup
    cache_mod = _load_reference_cache_module()

    ref_dir = tmp_path / "ref"
    our_dir = tmp_path / "ours"
    ref_dir.mkdir()
    our_dir.mkdir()

    # The reference image path: result[:, 1:, :] before cache.add — replicate
    # by running its FeatureCache on BOS-stripped latents, which is exactly
    # what FeatureImageCache.run does after the multimodal forward.
    model = _EmbedModel(torch.tensor(table))
    fc = cache_mod.FeatureCache(
        model,
        tokenizer=None,
        submodule_dict={"embed": ref_sae},
        batch_size=BATCH,
        shard_size=0,
    )
    import datasets

    ds = datasets.Dataset.from_dict({"input_ids": tokens[:, 1:].tolist()})
    fc.run(n_tokens=BATCH * (SEQ - 1), tokens=ds.with_format("torch"))
    fc.save_splits(N_SPLITS, str(ref_dir), rank=0)
    fc.concate_safetensors(N_SPLITS, str(ref_dir))

    import jax.numpy as jnp

    from multimodal_sae_tpu.features.cache import FeatureImageCache
    from multimodal_sae_tpu.sae import Sae

    sae = Sae.load_from_disk(ckpt, dtype=jnp.float32)
    jtable = jnp.asarray(table)

    def capture_fn(batch):
        ids = jnp.asarray(np.asarray(batch["input_ids"]))
        return {"embed": jtable[ids]}

    ic = FeatureImageCache(
        capture_fn, {"embed": sae}, batch_size=BATCH, shard_size=0
    )
    rows = [{"input_ids": tokens[i]} for i in range(len(tokens))]
    ic.run(n_tokens=BATCH * SEQ, tokens=rows, progress=False)
    ic.save_splits(N_SPLITS, str(our_dir), rank=0, replicate_boundary_drop=True)
    ic.concate_safetensors(N_SPLITS, str(our_dir))

    ref_files = sorted((ref_dir / "embed").glob("*.safetensors"))
    our_files = sorted((our_dir / "embed").glob("*.safetensors"))
    assert [f.name for f in ref_files] == [f.name for f in our_files]
    for rf, of in zip(ref_files, our_files):
        assert rf.read_bytes() == of.read_bytes(), rf.name
