"""Preemption-safe training: SIGTERM mid-fit checkpoints at the batch
boundary and exits cleanly; --resume continues from the saved step."""

import numpy as np

from multimodal_sae_tpu.config import SaeConfig, TrainConfig
from multimodal_sae_tpu.models import SyntheticActivationSource
from multimodal_sae_tpu.train import SaeTrainer


def test_sigterm_checkpoints_and_stops(tmp_path):
    import os
    import signal

    model = SyntheticActivationSource(d_model=32, n_layers=2)
    rng = np.random.default_rng(0)
    ds = [{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(64)]
    cfg = TrainConfig(
        sae=SaeConfig(expansion_factor=4, k=4),
        batch_size=8,
        lr=1e-3,
        lr_warmup_steps=0,
        log_to_wandb=False,
        save_every=10_000,
        hookpoints=["layers.1"],
        run_name=str(tmp_path / "run"),
    )
    trainer = SaeTrainer(cfg, ds, model)

    # Deliver SIGTERM from inside the loop via a logging callback.
    def log_fn(step, info):
        if step == 2:
            os.kill(os.getpid(), signal.SIGTERM)

    trainer.fit(log_fn=log_fn)
    # Stopped early (not all 8 batches) and checkpointed.
    assert 2 <= trainer.global_step < 8
    assert (tmp_path / "run" / "layers.1" / "sae.safetensors").exists()

    # Resume picks up the saved step.
    restored = SaeTrainer(cfg, ds, model)
    restored.load_state(str(tmp_path / "run"))
    assert restored.global_step == trainer.global_step


def test_preemption_stops_only_at_accumulation_boundary(tmp_path):
    """With grad_acc_steps > 1, a SIGTERM mid-window must run the window to
    its optimizer update before checkpointing — checkpoints don't persist the
    partial grad_accs, so a mid-window save would resume into an update
    scaled for the full window but built from part of it (review r3)."""
    import os
    import signal

    model = SyntheticActivationSource(d_model=32, n_layers=2)
    rng = np.random.default_rng(0)
    ds = [{"input_ids": rng.integers(0, 128, size=(16,))} for _ in range(64)]
    cfg = TrainConfig(
        sae=SaeConfig(expansion_factor=4, k=4),
        batch_size=8,
        grad_acc_steps=4,
        lr=1e-3,
        lr_warmup_steps=0,
        log_to_wandb=False,
        save_every=10_000,
        hookpoints=["layers.1"],
        run_name=str(tmp_path / "run"),
    )
    trainer = SaeTrainer(cfg, ds, model)

    # Deliver the signal genuinely mid-window: after global_step 2 of a
    # 4-step accumulation window (log_fn would only fire at boundaries).
    orig_step = trainer.step

    def step(batch, avg_metrics=None):
        orig_step(batch, avg_metrics)
        if trainer.global_step == 2:
            os.kill(os.getpid(), signal.SIGTERM)

    trainer.step = step
    trainer.fit()
    assert trainer.global_step % cfg.grad_acc_steps == 0, trainer.global_step
    assert trainer.global_step == 4  # finished the window, then stopped
    assert (tmp_path / "run" / "layers.1" / "sae.safetensors").exists()
