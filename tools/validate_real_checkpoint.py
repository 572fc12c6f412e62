"""Validate this framework's activation cache against the reference code on a
real (or fabricated) checkpoint — one command packaging the north-star claim
of BASELINE.md (VERDICT r2 item 3).

Given local directories for the subject model (e.g.
llava-hf/llama3-llava-next-8b-hf) and the SAE release (e.g.
lmms-lab/llama3-llava-next-8b-hf-sae-131k), this runs the reference caching
config (reference README.md:41-56: ctx 64, n_splits 128, sample dataset)
through BOTH:

  * this framework's cache path (fp32 JAX subject -> FeatureCache ->
    save_splits -> concate), and
  * the mounted reference code's own `FeatureCache`/`FeatureImageCache`
    (torch CPU, reference features/cache.py:95-429),

on a bounded row budget, then diffs the merged `{start}_{end}.safetensors`:
byte equality (strict), COO location-set overlap, and activation closeness on
shared locations (the meaningful criteria for cross-framework fp32 forwards,
where reduction order legitimately differs).

Real-checkpoint usage (blocked on weights in this egress-less environment;
runnable the day a checkpoint is local):

  python tools/validate_real_checkpoint.py \
      --model /ckpts/llama3-llava-next-8b-hf \
      --sae /ckpts/llama3-llava-next-8b-hf-sae-131k \
      --dataset /datasets/sae-sample-cache-dataset \
      --mode image --hookpoint model.layers.24 \
      --rows 8 --ctx-len 64 --n-splits 8 --out /tmp/validate_real

Self-test (used by CI, tests/test_validate_real_checkpoint.py):

  python tools/validate_real_checkpoint.py --self-test

fabricates a tiny text checkpoint + SAE and runs the same procedure end to
end, asserting the report passes.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_ours(args, out_dir: Path) -> None:
    """This framework's cache path at fp32 (the launch.cache.cache /
    cache_image flow without the process sharding)."""
    import jax.numpy as jnp

    from multimodal_sae_tpu.features.cache import FeatureCache, FeatureImageCache
    from multimodal_sae_tpu.interp_utils import load_saes
    from multimodal_sae_tpu.launch.utils import load_any_dataset, load_subject_model
    from multimodal_sae_tpu.train.data import chunk_and_tokenize

    model, _, tokenizer = load_subject_model(args.model, dtype=jnp.float32)
    dataset = load_any_dataset(args.dataset, args.split)

    submodules = load_saes(args.sae, dtype=jnp.float32)
    if args.hookpoint:
        submodules = {h: submodules[h] for h in args.hookpoint}
    hookpoints = list(submodules)

    if args.mode == "text":
        if "input_ids" not in dataset.column_names:
            dataset = chunk_and_tokenize(
                dataset, tokenizer, max_seq_len=args.ctx_len
            )
        dataset = dataset.select(range(min(args.rows, len(dataset))))

        def capture_fn(batch):
            return model.capture(batch, hookpoints)

        cache = FeatureCache(
            capture_fn,
            submodules,
            batch_size=args.batch_size,
            shard_size=0,
            activation_dtype=np.float32,
        )
    else:
        dataset = dataset.select(range(min(args.rows, len(dataset))))
        image_tokenizer_ids = tokenizer("<image>", add_special_tokens=True)[
            "input_ids"
        ]

        def capture_fn(batch):
            images = [im.convert("RGB") for im in batch["image"]]
            prompt_ids = [image_tokenizer_ids for _ in images]
            prepared = model.prepare_inputs(images=images, prompt_ids=prompt_ids)
            return model.capture(prepared, hookpoints)

        cache = FeatureImageCache(
            capture_fn,
            submodules,
            batch_size=args.batch_size,
            shard_size=0,
            activation_dtype=np.float32,
        )

    cache.run(args.ctx_len, dataset, progress=False)
    cache.save_splits(
        n_splits=args.n_splits,
        save_dir=str(out_dir),
        rank=0,
        replicate_boundary_drop=True,
    )
    cache.concate_safetensors(n_splits=args.n_splits, save_dir=str(out_dir))


def run_reference(args, out_dir: Path) -> None:
    """The mounted reference code's own cache path, torch CPU fp32
    (reference launch/cache/cache.py:79-97 without the DDP bring-up)."""
    import datasets as hf_datasets
    import torch
    import transformers

    from multimodal_sae_tpu.launch.utils import load_any_dataset
    from multimodal_sae_tpu.train.data import chunk_and_tokenize
    from multimodal_sae_tpu.utils.reference_mount import (
        load_reference_cache_module,
        load_reference_sae_module,
    )

    cache_mod = load_reference_cache_module()
    ref_sae_mod = load_reference_sae_module()

    hf_cfg = transformers.AutoConfig.from_pretrained(args.model)
    is_llava = "llava" in hf_cfg.model_type.lower()
    if is_llava:
        model = transformers.LlavaNextForConditionalGeneration.from_pretrained(
            args.model, torch_dtype=torch.float32
        ).eval()
    else:
        # The reference text path loads AutoModel (the bare transformer, so
        # hookpoints are `layers.N`; reference launch/utils.py:68-88).
        model = transformers.AutoModel.from_pretrained(
            args.model, torch_dtype=torch.float32
        ).eval()

    submodules = {}
    for hook in args.hookpoint or sorted(os.listdir(args.sae)):
        hook_dir = os.path.join(args.sae, hook)
        if os.path.isdir(hook_dir):
            submodules[hook] = ref_sae_mod.Sae.load_from_disk(hook_dir)

    # The reference resolves hookpoints against `model.language_model`
    # (reference features/cache.py:105-115), whose module naming depends on
    # the installed transformers: older versions expose LlamaForCausalLM
    # ("model.layers.N"), 4.5x exposes LlamaModel ("layers.N").  Resolve
    # leniently and rename output dirs back to the canonical hookpoint.
    resolve_on = model.language_model if is_llava else model
    key_map = {}
    for hook in list(submodules):
        try:
            resolve_on.get_submodule(hook)
            key_map[hook] = hook
        except AttributeError:
            alt = hook.split(".", 1)[1] if hook.startswith("model.") else hook
            resolve_on.get_submodule(alt)  # raises if still unresolvable
            key_map[alt] = hook
            submodules[alt] = submodules.pop(hook)

    dataset = load_any_dataset(args.dataset, args.split)

    if args.mode == "text":
        tokenizer = transformers.AutoTokenizer.from_pretrained(args.model)
        if "input_ids" not in dataset.column_names:
            dataset = chunk_and_tokenize(
                dataset, tokenizer, max_seq_len=args.ctx_len
            )
        dataset = dataset.select(range(min(args.rows, len(dataset))))
        ds = hf_datasets.Dataset.from_dict(
            {"input_ids": [list(map(int, r)) for r in dataset["input_ids"]]}
        ).with_format("torch")
        fc = cache_mod.FeatureCache(
            model,
            tokenizer=None,
            submodule_dict=submodules,
            batch_size=args.batch_size,
            shard_size=0,
        )
        fc.run(n_tokens=args.batch_size * args.ctx_len, tokens=ds)
    else:
        dataset = dataset.select(range(min(args.rows, len(dataset))))
        processor = transformers.LlavaNextProcessor.from_pretrained(args.model)
        fc = cache_mod.FeatureImageCache(
            model,
            tokenizer=None,
            submodule_dict=submodules,
            batch_size=args.batch_size,
            shard_size=0,
            processor=processor,
        )
        fc.run(n_tokens=args.batch_size * args.ctx_len, tokens=dataset)

    for hook in submodules:
        (out_dir / hook).mkdir(parents=True, exist_ok=True)
    fc.save_splits(args.n_splits, str(out_dir), rank=0)
    fc.concate_safetensors(args.n_splits, str(out_dir))
    for resolved, orig in key_map.items():
        if resolved != orig:
            (out_dir / resolved).rename(out_dir / orig)


def compare(ours_dir: Path, ref_dir: Path, rtol: float, atol: float,
            min_overlap: float) -> dict:
    """Diff the merged split files module by module."""
    from safetensors.numpy import load_file

    report = {"modules": {}, "byte_equal": True, "pass": True}
    modules = sorted(d.name for d in ref_dir.iterdir() if d.is_dir())
    assert modules, f"reference produced no modules under {ref_dir}"
    for module in modules:
        ref_files = sorted((ref_dir / module).glob("*.safetensors"))
        our_files = sorted((ours_dir / module).glob("*.safetensors"))
        mod_report = {
            "files": len(ref_files),
            "file_names_equal": [f.name for f in ref_files]
            == [f.name for f in our_files],
            "byte_equal": True,
        }
        ours_map, ref_map = {}, {}
        for files, dest in ((our_files, ours_map), (ref_files, ref_map)):
            for f in files:
                data = load_file(str(f))
                for loc, act in zip(data["locations"], data["activations"]):
                    dest[tuple(int(v) for v in loc)] = float(act)
        for rf, of in zip(ref_files, our_files):
            if rf.read_bytes() != of.read_bytes():
                mod_report["byte_equal"] = False
        shared = set(ours_map) & set(ref_map)
        denom = max(len(ours_map), len(ref_map), 1)
        overlap = len(shared) / denom
        a = np.array([ours_map[k] for k in shared], dtype=np.float64)
        b = np.array([ref_map[k] for k in shared], dtype=np.float64)
        close = bool(
            len(shared) > 0 and np.allclose(a, b, rtol=rtol, atol=atol)
        )
        mod_report.update(
            {
                "n_ours": len(ours_map),
                "n_ref": len(ref_map),
                "loc_overlap": overlap,
                "act_max_abs_diff": float(np.abs(a - b).max()) if len(shared) else None,
                "act_close": close,
            }
        )
        mod_report["pass"] = bool(
            mod_report["file_names_equal"]
            and (mod_report["byte_equal"] or (overlap >= min_overlap and close))
            # An empty module (e.g. every batch dropped as ragged) must not
            # count as a vacuous PASS — there is nothing validated.
            and len(ref_map) > 0
            and len(ours_map) > 0
        )
        report["modules"][module] = mod_report
        report["byte_equal"] &= mod_report["byte_equal"]
        report["pass"] &= mod_report["pass"]
    return report


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    parser.add_argument("--model", help="local subject-model checkpoint dir")
    parser.add_argument("--sae", help="local SAE release dir (per-hookpoint)")
    parser.add_argument("--dataset", help="HF dataset name or save_to_disk dir")
    parser.add_argument("--split", default="train")
    parser.add_argument(
        "--mode", choices=("text", "image"), default=None,
        help="cache path to validate (default: image for real runs, "
        "text for --self-test; --self-test --mode image fabricates a tiny "
        "LLaVA checkpoint instead)",
    )
    parser.add_argument(
        "--hookpoint", action="append", default=None,
        help="hookpoint(s) to validate (default: every SAE in --sae)",
    )
    parser.add_argument("--rows", type=int, default=8)
    parser.add_argument("--ctx-len", type=int, default=64)
    parser.add_argument("--batch-size", type=int, default=1)
    parser.add_argument("--n-splits", type=int, default=8)
    parser.add_argument("--out", default="/tmp/validate_real_checkpoint")
    parser.add_argument("--rtol", type=float, default=2e-3)
    parser.add_argument("--atol", type=float, default=2e-3)
    parser.add_argument("--min-overlap", type=float, default=0.97)
    parser.add_argument(
        "--self-test", action="store_true",
        help="fabricate a tiny checkpoint and validate the procedure itself",
    )
    parser.add_argument(
        "--scratch-dir", default=None,
        help="root for --self-test's fabricated files (default: a fresh "
        "temp dir removed at exit)",
    )
    args = parser.parse_args(argv)

    from multimodal_sae_tpu.utils.reference_mount import reference_available

    if not reference_available():
        print("reference mount absent — nothing to validate against", file=sys.stderr)
        return 2

    if args.mode is None:
        args.mode = "text" if args.self_test else "image"
    if args.self_test:
        _setup_self_test(args)

    for name in ("model", "sae", "dataset"):
        if getattr(args, name) is None:
            parser.error(f"--{name} is required (or pass --self-test)")

    # The whole point is fp32 parity: without this, TPU runs compute the
    # subject forward as single-pass bf16 MXU matmuls (~4e-3 relative error
    # per op) and the thresholds below would fail a byte-parity-correct
    # implementation.  (Tests force CPU where fp32 is native; the real
    # TPU run this tool packages needs the pin.)
    import jax

    jax.config.update("jax_default_matmul_precision", "highest")

    import shutil

    out = Path(args.out)
    ours_dir, ref_dir = out / "ours", out / "reference"
    for d in (ours_dir, ref_dir):
        # A rerun with different settings (n_splits/hookpoint/rows) must not
        # compare against stale files from the previous generation.
        if d.exists():
            shutil.rmtree(d)
        d.mkdir(parents=True)

    run_ours(args, ours_dir)
    run_reference(args, ref_dir)
    report = compare(ours_dir, ref_dir, args.rtol, args.atol, args.min_overlap)
    report["config"] = {
        k: getattr(args, k)
        for k in ("model", "sae", "dataset", "mode", "rows", "ctx_len",
                  "batch_size", "n_splits")
    }
    (out / "report.json").write_text(json.dumps(report, indent=2))
    # Compact single-line report as the LAST stdout line: upstream loaders
    # (torch/transformers/the mounted reference) print freely, so consumers
    # parse the final line rather than scanning for a brace.
    print(json.dumps(report))
    return 0 if report["pass"] else 1


def _setup_self_test(args) -> None:
    """Fabricate a tiny checkpoint + SAE + dataset for the requested mode:
    text -> plain LLaMA with a pre-tokenized dataset; image -> LLaVA-NeXT
    with a real saved LlavaNextProcessor and an image dataset (exercising
    the exact path the real llama3-llava-next-8b validation will take)."""
    import tempfile

    import torch
    import transformers
    from datasets import Dataset
    from tokenizers import Tokenizer, models, pre_tokenizers
    from transformers import PreTrainedTokenizerFast

    import jax

    from multimodal_sae_tpu.config import SaeConfig
    from multimodal_sae_tpu.sae import Sae

    if args.scratch_dir:
        tmp = Path(args.scratch_dir)
        tmp.mkdir(parents=True, exist_ok=True)
    else:
        import atexit
        import shutil

        tmp = Path(tempfile.mkdtemp(prefix="validate_selftest_"))
        atexit.register(shutil.rmtree, tmp, ignore_errors=True)
    sae_dir = tmp / "saes"
    rng = np.random.default_rng(0)
    ds_dir = tmp / "ds"
    torch.manual_seed(0)

    if args.mode == "image":
        # Directory name must contain "llava" (load_subject_model detects
        # the multimodal path by name).
        ckpt = tmp / "llava_ckpt"
        pinpoints = [[32, 64], [64, 32], [64, 64]]
        cfg = transformers.LlavaNextConfig(
            vision_config=transformers.CLIPVisionConfig(
                hidden_size=48,
                intermediate_size=96,
                num_hidden_layers=2,
                num_attention_heads=4,
                image_size=32,
                patch_size=16,
            ),
            text_config=transformers.LlamaConfig(
                vocab_size=260,
                hidden_size=32,
                intermediate_size=64,
                num_hidden_layers=3,
                num_attention_heads=4,
                num_key_value_heads=2,
            ),
            image_grid_pinpoints=pinpoints,
            image_token_index=256,
        )
        transformers.LlavaNextForConditionalGeneration(cfg).eval().save_pretrained(
            ckpt, safe_serialization=True
        )
        tok = Tokenizer(
            models.WordLevel({str(i): i for i in range(256)}, unk_token="0")
        )
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        # Register <image> on the RAW tokenizer so its id (256) is persisted
        # in tokenizer.json and survives from_pretrained (re-adding it at
        # the PreTrainedTokenizerFast layer gets a fresh id on reload).
        tok.add_special_tokens(["<image>"])
        fast = PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="0")
        fast.save_pretrained(ckpt)
        assert fast.convert_tokens_to_ids("<image>") == 256
        processor = transformers.LlavaNextProcessor(
            image_processor=transformers.LlavaNextImageProcessor(
                size={"shortest_edge": 32},
                crop_size={"height": 32, "width": 32},
                image_grid_pinpoints=pinpoints,
            ),
            tokenizer=fast,
            patch_size=16,
            vision_feature_select_strategy="default",
            image_token="<image>",
            num_additional_image_tokens=1,
        )
        processor.save_pretrained(ckpt)

        from PIL import Image

        import datasets as hf_datasets

        images = [
            Image.fromarray(
                rng.integers(0, 255, size=(40 + 4 * i, 52, 3), dtype=np.uint8)
            )
            for i in range(4)
        ]
        hf_datasets.Dataset.from_dict(
            {"image": images}
        ).cast_column("image", hf_datasets.Image()).save_to_disk(str(ds_dir))

        hook = "model.layers.1"
        Sae(
            32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0)
        ).save_to_disk(sae_dir / hook)
        args.rows = 4
        args.ctx_len = 64
        args.batch_size = 2
        args.n_splits = 2
    else:
        ckpt = tmp / "ckpt"
        cfg = transformers.LlamaConfig(
            vocab_size=128,
            hidden_size=32,
            intermediate_size=64,
            num_hidden_layers=3,
            num_attention_heads=4,
            num_key_value_heads=2,
            max_position_embeddings=64,
        )
        transformers.LlamaForCausalLM(cfg).save_pretrained(
            ckpt, safe_serialization=True
        )
        tok = Tokenizer(
            models.WordLevel({str(i): i for i in range(128)}, unk_token="0")
        )
        tok.pre_tokenizer = pre_tokenizers.Whitespace()
        PreTrainedTokenizerFast(tokenizer_object=tok, unk_token="0").save_pretrained(
            ckpt
        )
        Dataset.from_dict(
            {"input_ids": rng.integers(1, 128, size=(8, 8)).tolist()}
        ).save_to_disk(str(ds_dir))
        hook = "layers.1"
        Sae(
            32, SaeConfig(num_latents=64, k=4), key=jax.random.PRNGKey(0)
        ).save_to_disk(sae_dir / hook)
        args.rows = 8
        args.ctx_len = 8
        args.batch_size = 2
        args.n_splits = 2

    args.model = str(ckpt)
    args.sae = str(sae_dir)
    args.dataset = str(ds_dir)
    args.hookpoint = [hook]
    args.out = str(tmp / "out")


if __name__ == "__main__":
    raise SystemExit(main())
