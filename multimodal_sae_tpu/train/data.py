"""Dataset tokenization and manipulation (reference train/sae/sae/data.py).

Host-side; depends on HF `datasets`/`transformers` only where used, so the
TPU compute path never imports them.
"""

from __future__ import annotations

import math
from typing import Optional, TypeVar

import numpy as np

T = TypeVar("T")


def chunk_and_tokenize(
    data,
    tokenizer,
    *,
    format: str = "numpy",
    num_proc: int = 1,
    text_key: str = "text",
    max_seq_len: int = 2048,
    return_final_batch: bool = False,
    load_from_cache_file: bool = True,
):
    """GPT-style concat-with-EOS chunking to fixed `max_seq_len`
    (reference train/sae/sae/data.py:16-100): documents are joined with the
    EOS separator (the stream starts with one), split into exact-length
    chunks via overflow tokens, and the final ragged chunk is dropped unless
    `return_final_batch`."""

    def _tokenize_fn(x: dict):
        chunk_size = min(tokenizer.model_max_length, max_seq_len)
        sep = tokenizer.eos_token or "<|endoftext|>"
        joined_text = sep.join([""] + x[text_key])
        output = tokenizer(
            joined_text,
            max_length=chunk_size,
            return_attention_mask=False,
            return_overflowing_tokens=True,
            truncation=True,
        )

        if overflow := output.pop("overflowing_tokens", None):
            # Slow tokenizers return unnested lists of ints.
            assert isinstance(output["input_ids"][0], int)
            chunks = [output["input_ids"]] + [
                overflow[i * chunk_size : (i + 1) * chunk_size]
                for i in range(math.ceil(len(overflow) / chunk_size))
            ]
            output = {"input_ids": chunks}

        if not return_final_batch:
            output = {k: v[:-1] for k, v in output.items()}

        if len(output["input_ids"]) == 0:
            raise ValueError(
                "Not enough data to create a single complete batch."
                " Either allow the final batch to be returned,"
                " or supply more data."
            )
        return output

    data = data.map(
        _tokenize_fn,
        batched=True,
        batch_size=2048,
        num_proc=num_proc if num_proc > 1 else None,
        remove_columns=get_columns_all_equal(data),
        load_from_cache_file=load_from_cache_file,
    )
    return data.with_format(format, columns=["input_ids"])


def process_mm_data(
    data,
    tokenizer,
    *,
    format: str = "numpy",
    num_proc: int = 1,
    load_from_cache_file: bool = True,
):
    """LLaVA "conversations" (from/value) → chat-template input_ids, keeping
    the image column (reference train/sae/sae/data.py:103-142)."""

    def _tokenize_fn(x: dict):
        new_conv = []
        for conversation in x["conversations"]:
            conv_dict = {}
            for key, content in conversation.items():
                if key == "from":
                    if content == "human":
                        conv_dict["role"] = "user"
                    elif content == "gpt":
                        conv_dict["role"] = "assistant"
                    else:
                        conv_dict["role"] = "system"
                elif key == "value":
                    conv_dict["content"] = content
                else:
                    conv_dict[key] = content
            new_conv.append(conv_dict)

        input_ids = tokenizer.apply_chat_template(
            new_conv, return_tensors="np", add_generation_prompt=False
        )
        return {"input_ids": input_ids}

    remove_columns = [
        c for c in get_columns_all_equal(data) if c not in ("image", "input_ids")
    ]
    data = data.map(
        _tokenize_fn,
        num_proc=num_proc if num_proc > 1 else None,
        remove_columns=remove_columns,
        load_from_cache_file=load_from_cache_file,
    )
    return data.with_format(format)


def get_columns_all_equal(dataset) -> list:
    """Columns of a Dataset/DatasetDict, asserting split agreement
    (reference data.py:145-164)."""
    column_names = dataset.column_names
    if isinstance(column_names, dict):
        cols_by_split = column_names.values()
        columns = next(iter(cols_by_split))
        if not all(cols == columns for cols in cols_by_split):
            raise ValueError("All splits must have the same columns")
        return columns
    return column_names


class MemmapDataset:
    """Dataset backed by a memory-mapped uint16 token file
    (reference data.py:167-199)."""

    def __init__(
        self,
        data_path: str,
        ctx_len: int,
        max_examples: Optional[int] = None,
        dtype=np.uint16,
    ):
        mmap = np.memmap(data_path, dtype=dtype, mode="r").reshape(-1, ctx_len)
        self.mmap = mmap[:max_examples]

    def __len__(self):
        return len(self.mmap)

    def __getitem__(self, idx):
        return dict(input_ids=self.mmap[idx].astype(np.int64))

    def select(self, rng: range) -> "MemmapDataset":
        out = MemmapDataset.__new__(MemmapDataset)
        out.mmap = self.mmap[rng.start : rng.stop]
        return out

    def shard(self, num_shards: int, shard_id: int) -> "MemmapDataset":
        out = MemmapDataset.__new__(MemmapDataset)
        out.mmap = np.array_split(self.mmap, num_shards)[shard_id]
        return out
