"""SAE training CLI: `python -m multimodal_sae_tpu <model> <dataset> ...`
(reference train/sae/sae/__main__.py:25-181, console script `sae`).

Single-controller launch: no torchrun/NCCL bring-up — `jax.distributed` is
initialized when multi-host env vars are present, the dataset is truncated to
a divisible length and sharded per process, and one global mesh carries the
data-parallel axis."""

from __future__ import annotations

from .config import RunConfig
from .parallel import initialize_distributed
from .train import MemmapDataset, SaeTrainer, chunk_and_tokenize, process_mm_data
from .utils import rank0_print
from .utils.cli import parse_dataclass


def load_artifacts(args: RunConfig):
    """Load the frozen subject model + training dataset
    (reference __main__.py:66-140). Models must be local checkpoint dirs in
    this zero-egress environment; `synthetic://dM,L,V` builds the test model."""
    import jax.numpy as jnp

    if args.model.startswith("synthetic://"):
        from .models import SyntheticActivationSource

        model = SyntheticActivationSource.from_spec(args.model)
        tokenizer = None
    else:
        from .launch.utils import load_subject_model

        model, _, tokenizer = load_subject_model(
            args.model,
            dtype=jnp.bfloat16,
            load_in_8bit=args.load_in_8bit,
            int8_matmul=args.int8_matmul,
            int8_vision=getattr(args, "int8_vision", False),
            flash_attention=args.flash_attention,
            tp=args.tp,
            dp=args.dp,
            hf_token=args.hf_token,
            truncate_layers=args.truncate_layers,
        )

    if args.dataset.endswith(".bin"):
        dataset = MemmapDataset(args.dataset, args.ctx_len, args.max_examples)
    else:
        from .launch.utils import load_any_dataset

        dataset = load_any_dataset(args.dataset, args.split)

        if "input_ids" not in dataset.column_names:
            assert tokenizer is not None, "synthetic model needs a tokenized dataset"
            if args.mm_data:
                dataset = process_mm_data(dataset, tokenizer)
            else:
                dataset = chunk_and_tokenize(
                    dataset,
                    tokenizer,
                    max_seq_len=args.ctx_len,
                    num_proc=args.data_preprocessing_num_proc,
                )
        else:
            rank0_print("Dataset already tokenized; skipping tokenization.")

        rank0_print(f"Shuffling dataset with seed {args.seed}")
        dataset = dataset.shuffle(args.seed)
        dataset = dataset.with_format("numpy")
        if limit := args.max_examples:
            dataset = dataset.select(range(limit))

    return model, dataset, tokenizer


def run():
    initialize_distributed()
    import jax

    args = parse_dataclass(RunConfig)

    model, dataset, tokenizer = load_artifacts(args)

    world, rank = jax.process_count(), jax.process_index()
    if world > 1:
        # Truncate to a divisible length then shard (reference __main__.py:164-166).
        n = len(dataset) - (len(dataset) % world)
        dataset = dataset.select(range(n))
        dataset = dataset.shard(world, rank)

    rank0_print(f"Training on '{args.dataset}' (split '{args.split}')")

    collator = None
    if args.mm_data:
        from .train.collator import DataCollatorForImage

        if tokenizer is None:
            raise ValueError(
                "--mm_data needs the subject checkpoint's tokenizer for "
                "padding; a synthetic:// subject has none"
            )
        collator = DataCollatorForImage(tokenizer=tokenizer)

    trainer = SaeTrainer(args, dataset, model, collator=collator)
    if args.resume:
        trainer.load_state(args.run_name or "sae-ckpts")

    trainer.fit()


if __name__ == "__main__":
    run()
