"""Two-process driver for DP training: jax.distributed over localhost, the
dataset split exactly as the train CLI does (truncate-to-divisible + shard),
global batch-sharded hiddens over the 2-device mesh, rank-0 checkpoint.
Parity vs a single-process 2-virtual-device run is asserted by the parent
test.  argv: <dataset_dir> <run_dir>."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))

from multimodal_sae_tpu.parallel import initialize_distributed  # noqa: E402


def main():
    dataset_dir, run_dir = sys.argv[1:3]
    assert initialize_distributed(), "distributed bring-up failed"
    import jax

    world, rank = jax.process_count(), jax.process_index()
    assert world == 2 and len(jax.devices()) == 2

    from datasets import Dataset

    from multimodal_sae_tpu.config import SaeConfig, TrainConfig
    from multimodal_sae_tpu.models import SyntheticActivationSource
    from multimodal_sae_tpu.train import SaeTrainer

    dataset = Dataset.load_from_disk(dataset_dir).with_format("numpy")
    n = len(dataset) - (len(dataset) % world)
    dataset = dataset.select(range(n)).shard(world, rank)

    cfg = TrainConfig(
        sae=SaeConfig(expansion_factor=2, k=4),
        batch_size=2,
        grad_acc_steps=2,
        lr_warmup_steps=2,
        hookpoints=["layers.1"],
        run_name=run_dir,
        log_to_wandb=False,
        save_every=10_000,
    )
    model = SyntheticActivationSource(d_model=32, n_layers=3, vocab=64)
    trainer = SaeTrainer(cfg, dataset, model)
    trainer.fit()


if __name__ == "__main__":
    main()
