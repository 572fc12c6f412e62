"""Trainer tests: loss decreases, invariants hold (unit-norm decoder,
grad-acc boundaries, dead-feature counters), checkpoint resume restores state
exactly, and the data-parallel step matches single-device results on the
8-device CPU mesh (SURVEY.md §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_sae_tpu.config import SaeConfig, TrainConfig
from multimodal_sae_tpu.models import SyntheticActivationSource
from multimodal_sae_tpu.parallel import get_mesh
from multimodal_sae_tpu.train import SaeTrainer


def _dataset(n=64, seq=16, vocab=128, seed=0):
    rng = np.random.default_rng(seed)
    ids = rng.integers(0, vocab, size=(n, seq))
    return [{"input_ids": row} for row in ids]


def _cfg(**kw):
    base = dict(
        sae=SaeConfig(expansion_factor=4, k=4),
        batch_size=8,
        lr=1e-3,
        # warmup 0: like the reference (transformers LambdaLR semantics) the
        # very first optimizer step under warmup has lr factor 0/warmup == 0,
        # which would make "params changed" assertions vacuous.
        lr_warmup_steps=0,
        log_to_wandb=False,
        save_every=10_000,
        hookpoints=["layers.1"],
    )
    base.update(kw)
    return TrainConfig(**base)


def test_fvu_decreases():
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=128)
    trainer = SaeTrainer(_cfg(lr=5e-3), ds, model)

    from collections import defaultdict

    fvus = []
    for _ in range(3):  # a few epochs over the small dataset
        for batch in _batches(ds, 8):
            metrics = {"layers.1": defaultdict(float)}
            trainer.step(batch, metrics)
            fvus.append(metrics["layers.1"]["fvu"])
    assert fvus[-1] < fvus[0] * 0.8, (fvus[0], fvus[-1])


def test_hookpoint_resolution_wildcards():
    model = SyntheticActivationSource(d_model=16, n_layers=12)
    cfg = _cfg(hookpoints=["layers.1*"])
    trainer = SaeTrainer(cfg, _dataset(), model)
    assert cfg.hookpoints == ["layers.1", "layers.10", "layers.11"]  # natsorted


def test_layers_selection():
    model = SyntheticActivationSource(d_model=16, n_layers=6)
    cfg = _cfg(hookpoints=[], layers=[2, 4])
    trainer = SaeTrainer(cfg, _dataset(), model)
    assert cfg.hookpoints == ["layers.2", "layers.4"]
    assert set(trainer.saes) == {"layers.2", "layers.4"}


def test_unit_norm_and_b_dec_init():
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=32)
    trainer = SaeTrainer(_cfg(), ds, model)
    for batch in _batches(ds, 8):
        trainer.step(batch)
    sae = trainer.saes["layers.1"]
    # b_dec was initialized from the geometric median (nonzero).
    assert float(jnp.abs(sae.params["b_dec"]).sum()) > 0
    # Renorm happens at the start of each accumulate; after the final apply the
    # rows drift slightly from 1 until the next step, but must stay close.
    norms = jnp.linalg.norm(sae.params["W_dec"], axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=0.1)


def test_grad_acc_boundary():
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=64)
    trainer = SaeTrainer(_cfg(grad_acc_steps=2), ds, model)
    batches = list(_batches(ds, 8))
    p0 = np.asarray(trainer.saes["layers.1"].params["W_enc"])
    trainer.step(batches[0])
    # b_dec init happens at step 0, but W_enc must be untouched mid-accumulation.
    p1 = np.asarray(trainer.saes["layers.1"].params["W_enc"])
    np.testing.assert_array_equal(p0, p1)
    assert trainer.opt_step == 0
    trainer.step(batches[1])
    p2 = np.asarray(trainer.saes["layers.1"].params["W_enc"])
    assert not np.array_equal(p1, p2)
    assert trainer.opt_step == 1


def test_dead_feature_counters():
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=32)
    trainer = SaeTrainer(_cfg(), ds, model)
    batches = list(_batches(ds, 8))
    trainer.step(batches[0])
    counts = trainer.num_tokens_since_fired["layers.1"]
    # Tokens processed: 8 seqs * 16 tokens = 128; latents that fired are 0.
    assert counts.max() == 128
    assert (counts == 0).sum() > 0


def test_micro_acc_steps_equivalent():
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=32)
    t1 = SaeTrainer(_cfg(), ds, model)
    t2 = SaeTrainer(_cfg(micro_acc_steps=2), ds, model)
    b = next(iter(_batches(ds, 8)))
    t1.step(b)
    t2.step(b)
    # Not exactly equal (loss normalization per chunk differs as in the
    # reference), but the same order of magnitude of update.
    d1 = np.linalg.norm(np.asarray(t1.saes["layers.1"].params["W_enc"]))
    d2 = np.linalg.norm(np.asarray(t2.saes["layers.1"].params["W_enc"]))
    np.testing.assert_allclose(d1, d2, rtol=0.05)


def test_checkpoint_resume(tmp_path):
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=64)
    cfg = _cfg(run_name=str(tmp_path / "run"))
    trainer = SaeTrainer(cfg, ds, model)
    batches = list(_batches(ds, 8))
    for b in batches[:3]:
        trainer.step(b)
    assert trainer.global_step == 3
    trainer.save()

    cfg2 = _cfg(run_name=str(tmp_path / "run"))
    restored = SaeTrainer(cfg2, ds, model)
    restored.load_state(str(tmp_path / "run"))
    assert restored.global_step == 3
    for k in trainer.saes["layers.1"].params:
        np.testing.assert_array_equal(
            np.asarray(restored.saes["layers.1"].params[k]),
            np.asarray(trainer.saes["layers.1"].params[k]),
        )
    np.testing.assert_array_equal(
        restored.num_tokens_since_fired["layers.1"],
        trainer.num_tokens_since_fired["layers.1"],
    )
    # Optimizer state restored leaf-for-leaf.
    l1 = jax.tree_util.tree_leaves(trainer.opt_states["layers.1"])
    l2 = jax.tree_util.tree_leaves(restored.opt_states["layers.1"])
    for a, b in zip(l1, l2):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # Resumed stepping works.
    restored.step(batches[3])


def test_data_parallel_matches_single_device():
    assert jax.device_count() >= 8, "conftest must provide 8 CPU devices"
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=64)
    batches = list(_batches(ds, 8))

    t1 = SaeTrainer(_cfg(), ds, model, mesh=get_mesh(devices=jax.devices()[:1]))
    t8 = SaeTrainer(_cfg(), ds, model, mesh=get_mesh(devices=jax.devices()[:8]))
    for b in batches[:2]:
        t1.step(b)
        t8.step(b)
    for k in t1.saes["layers.1"].params:
        np.testing.assert_allclose(
            np.asarray(t1.saes["layers.1"].params[k]),
            np.asarray(t8.saes["layers.1"].params[k]),
            rtol=2e-4,
            atol=2e-5,
        )


def test_distribute_modules_plan():
    model = SyntheticActivationSource(d_model=16, n_layers=8)
    cfg = _cfg(hookpoints=["layers.*"], distribute_modules=True)
    trainer = SaeTrainer(cfg, _dataset(), model, mesh=get_mesh())
    # All 8 hookpoints trained locally, one per device group.
    assert set(trainer.saes) == {f"layers.{i}" for i in range(8)}
    assert len(set(id(m) for m in trainer.device_groups.values())) == 8
    b = next(iter(_batches(_dataset(), 8)))
    trainer.step(b)  # must run without error across groups


def _batches(ds, bs):
    from multimodal_sae_tpu.train.trainer import _iter_batches

    return _iter_batches(ds, bs)


def test_wandb_log_frequency_zero_disables_logging():
    """wandb_log_frequency=0 means logging-off; it must not divide metric
    accumulation by zero on the first batch (review r3)."""
    from collections import defaultdict

    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=16)
    trainer = SaeTrainer(_cfg(wandb_log_frequency=0), ds, model)
    for batch in _batches(ds, 8):
        trainer.step(batch, {"layers.1": defaultdict(float)})
    assert trainer.global_step == 2


def test_sae_dtype_bfloat16():
    """TrainConfig.sae_dtype="bfloat16" initializes SAE params, grad
    accumulators, and optimizer state in bf16 (halves HBM at 131k width —
    the posture bench.py --train-e2e measures), and the step still runs
    and updates finitely."""
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=32)
    trainer = SaeTrainer(_cfg(sae_dtype="bfloat16"), ds, model)
    sae = trainer.saes["layers.1"]
    assert sae.params["W_enc"].dtype == jnp.bfloat16
    assert trainer.grad_accs["layers.1"]["W_enc"].dtype == jnp.bfloat16
    p0 = np.asarray(sae.params["W_enc"], dtype=np.float32)
    for batch in _batches(ds, 8):
        trainer.step(batch)
    p1 = np.asarray(sae.params["W_enc"], dtype=np.float32)
    assert sae.params["W_enc"].dtype == jnp.bfloat16
    assert np.isfinite(p1).all()
    assert not np.array_equal(p0, p1)


def test_approx_topk_trains():
    """TrainConfig.approx_topk routes the training selection threshold
    through approx_max_k (exact on the CPU backend, ~0.95 recall on TPU);
    the loop must still converge like the exact path."""
    from collections import defaultdict

    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=128)
    trainer = SaeTrainer(_cfg(lr=5e-3, approx_topk=True), ds, model)
    fvus = []
    for _ in range(3):
        for batch in _batches(ds, 8):
            metrics = {"layers.1": defaultdict(float)}
            trainer.step(batch, metrics)
            fvus.append(metrics["layers.1"]["fvu"])
    assert fvus[-1] < fvus[0] * 0.8, (fvus[0], fvus[-1])


def test_fired_accumulates_across_grad_acc_window():
    """The fired mask is OR-accumulated on device across the grad-acc window
    and read back once at the boundary (r5 sync reduction): a latent that
    fires in ANY of the window's steps must reset its counter at the
    boundary, exactly as the old per-step numpy OR did; and the
    device-cached dead mask must be refreshed there."""
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    ds = _dataset(n=64)
    trainer = SaeTrainer(_cfg(grad_acc_steps=2), ds, model)
    batches = list(_batches(ds, 8))
    trainer.step(batches[0])
    # Mid-window: pending fired lives on device, counters untouched.
    assert "layers.1" in trainer._fired_dev
    assert trainer.num_tokens_since_fired["layers.1"].max() == 0
    trainer.step(batches[1])
    # Boundary: pending flushed, counters advanced by the window's tokens,
    # fired latents reset, dead mask recomputed.
    assert "layers.1" not in trainer._fired_dev
    counts = trainer.num_tokens_since_fired["layers.1"]
    assert counts.max() == 2 * 8 * 16
    assert (counts == 0).sum() > 0
    assert "layers.1" in trainer._dead_mask_dev
    import numpy as _np

    _np.testing.assert_array_equal(
        _np.asarray(trainer._dead_mask_dev["layers.1"]),
        counts > trainer.cfg.dead_feature_threshold,
    )


def test_layers_past_model_depth_raises():
    """--layers fabricates hookpoint names (unlike the fnmatch path), so an
    index past the subject's depth — or one dropped by --truncate_layers —
    must fail loudly instead of training nothing (review r5)."""
    model = SyntheticActivationSource(d_model=16, n_layers=6)
    with pytest.raises(ValueError, match="do not exist"):
        SaeTrainer(_cfg(hookpoints=[], layers=[2, 30]), _dataset(), model)
