"""Single-process oracle for the two-process DP parity test: one process,
2 virtual CPU devices, batch 4 over a pre-interleaved dataset so per-device
shard contents equal the two-process run's.  argv: <dataset_dir> <run_dir>."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))


def main():
    dataset_dir, run_dir = sys.argv[1:3]
    import jax

    assert len(jax.devices()) == 2, jax.devices()

    from datasets import Dataset

    from multimodal_sae_tpu.config import SaeConfig, TrainConfig
    from multimodal_sae_tpu.models import SyntheticActivationSource
    from multimodal_sae_tpu.train import SaeTrainer

    dataset = Dataset.load_from_disk(dataset_dir).with_format("numpy")
    cfg = TrainConfig(
        sae=SaeConfig(expansion_factor=2, k=4),
        batch_size=4,
        grad_acc_steps=2,
        lr_warmup_steps=2,
        hookpoints=["layers.1"],
        run_name=run_dir,
        log_to_wandb=False,
        save_every=10_000,
    )
    model = SyntheticActivationSource(d_model=32, n_layers=3, vocab=64)
    SaeTrainer(cfg, dataset, model).fit()


if __name__ == "__main__":
    main()
