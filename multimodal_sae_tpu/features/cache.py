"""Activation caching: frozen-LMM forward → TopK SAE latents → sparse COO
safetensors shards.

Re-designed from the reference (reference sae_auto_interp/features/cache.py)
for TPU:

* The reference registers forward hooks, scatters the top-k back into a dense
  (B, S, 131072) buffer, then scans it with `torch.nonzero` on device and
  copies COO triples to host (reference cache.py:158-230, 402-417).  Here the
  jitted device step returns the top-k (values, indices) directly — sorted by
  feature index on-device so the host-side COO stream is already in the
  reference's row-major (batch, seq, feature) order — and only (B, S, k)
  elements ever cross the host↔device boundary (~500× less traffic at
  k=256/width=131072).
* Subject-model access is a functional capture API (`capture_fn`) instead of
  hooks: any callable mapping a batch to {hookpoint: hiddens (B, S, d)}.

On-disk format is byte-compatible with the reference:
`{save_dir}/{module}/Rank{r}_{start}_{end}.safetensors` per-rank shards merged
into `{start}_{end}.safetensors` (reference cache.py:243-309), tensors
`locations (N, 3) int64` and `activations (N,)`.
"""

from __future__ import annotations

import os
import re
from collections import defaultdict
from functools import partial
from typing import Callable, Dict, Iterable, Optional, Sequence

import jax
import numpy as np

from ..config import SaeConfig
from ..sae import Sae
from ..sae.model import pre_acts as sae_pre_acts
from ..ops import sort_pairs_by_index, top_k


def topk_latents_step(params, x: jax.Array, cfg: SaeConfig):
    """Jitted cache step: pre_acts → top-k → sort by feature index.

    Returns (vals, idx) of shape (..., k), index-ascending within each
    position, so masking host-side in row-major order reproduces the
    reference's `torch.nonzero` ordering exactly (reference cache.py:80-81).
    """
    lead = x.shape[:-1]
    # Flatten (B, S, d) -> (B*S, d): the batched-matmul form schedules ~12%
    # slower end to end than one flat contraction (75.3 vs 66.8 ms per 4096
    # tokens, v5e d4096/131k/k256).
    latents = sae_pre_acts(params, x.reshape(-1, x.shape[-1]))
    # Materialization boundary between the encoder matmul and the top-k
    # selection: letting XLA interleave the two fusions costs ~11% end to end
    # (measured v5e: 74.7 -> 66.7 ms per 4096 tokens).
    latents = jax.lax.optimization_barrier(latents)
    # Post-ReLU latents are finite, so the -inf-defense clamp (a full
    # materialized copy) is skipped.
    vals, idx = top_k(latents, cfg.k, assume_finite=True)
    # Rank-permutation sort on the MXU: XLA's sort_key_val lowering costs
    # ~20 ms composed after the blockmax pipeline at (4096, 256) on v5e.
    idx, vals = sort_pairs_by_index(idx, vals, max_index=latents.shape[-1])
    return vals.reshape(*lead, cfg.k), idx.reshape(*lead, cfg.k)


class _Arena:
    """Pre-touched, grow-by-doubling COO buffers.

    On this host class, first-touch page faults on fresh GB-scale allocations
    cost ~50 us/page (~0.06 GB/s effective) while writes to already-touched
    pages stream at ~8 GB/s — measured 1-core VM, and the reason a per-batch
    `np.empty` + `.copy()` pipeline runs 50x slower than the extractor loop.
    One arena per module pays the fault cost once per capacity doubling; the
    steady-state per-batch cost is pure streaming."""

    __slots__ = ("loc", "act", "n")

    def __init__(self):
        self.loc: Optional[np.ndarray] = None
        self.act: Optional[np.ndarray] = None
        self.n = 0

    def reserve(self, extra: int, act_dtype=np.float32):
        need = self.n + extra
        cap = 0 if self.loc is None else self.loc.shape[0]
        if need <= cap:
            return
        new_cap = max(need, cap * 2, 1 << 20)
        from ..native.coo import populated_empty

        loc = populated_empty((new_cap, 3), np.int64)
        act = populated_empty(
            (new_cap,), act_dtype if self.act is None else self.act.dtype
        )
        if self.n:
            np.copyto(loc[: self.n], self.loc[: self.n])
            np.copyto(act[: self.n], self.act[: self.n])
        self.loc, self.act = loc, act

    def append(self, locations: np.ndarray, activations: np.ndarray):
        k = len(activations)
        if k == 0:
            # reserve(0) on a fresh arena never allocates — indexing the
            # still-None buffers would crash a run whose first batch has no
            # above-threshold entries.
            return
        self.reserve(k, act_dtype=activations.dtype)
        np.copyto(self.loc[self.n : self.n + k], locations)
        np.copyto(self.act[self.n : self.n + k], activations)
        self.n += k

    def views(self):
        if self.loc is None:  # nothing ever appended
            return np.empty((0, 3), np.int64), np.empty((0,), np.float32)
        return self.loc[: self.n], self.act[: self.n]


class Cache:
    """Host-side COO accumulator (reference cache.py:23-92).

    Stores per-module `locations (N, 3) int64` / `activations (N,)` arenas
    with the global row offset `batch_number * batch_size + shard_size`
    applied, so rows index into the full (cross-host) dataset (reference
    cache.py:55). `save()` publishes them as single arrays."""

    def __init__(
        self,
        shard_size: int,
        filters: Optional[Dict[str, np.ndarray]] = None,
        batch_size: int = 64,
    ):
        self.feature_locations = defaultdict(list)
        self.feature_activations = defaultdict(list)
        self._arenas: Dict[str, _Arena] = defaultdict(_Arena)
        self.filters = (
            {k: np.asarray(v) for k, v in filters.items()} if filters else None
        )
        self.batch_size = batch_size
        self.shard_size = shard_size

    def preallocate(self, module_path: str, n_entries: int, act_dtype=np.float32):
        """Pre-fault arena capacity for `n_entries` COO triples BEFORE the
        device loop starts.  On this host class fresh pages fault at
        ~0.13 GB/s (vs ~8 GB/s streaming to touched pages), so a mid-run
        capacity doubling to ~1 GB stalls the producer ~7 s in one batch —
        measured at the image-headline shape, see BASELINE.md host-persistence
        row.  Paying it up front overlaps the cost with the first jit compile
        (20-40 s) instead of the device loop.  An under-estimate is safe:
        growth falls back to doubling from the reserved capacity.

        `act_dtype` must match what `append` will write: the arena's
        activation dtype is fixed at first allocation, so preallocating at
        the default f32 would silently upcast a non-f32
        `FeatureCache(activation_dtype=...)` run on disk (review r5)."""
        if n_entries > 0:
            self._arenas[module_path].reserve(int(n_entries), act_dtype=act_dtype)

    def add_topk(
        self,
        vals: np.ndarray,
        idx: np.ndarray,
        batch_number: int,
        module_path: str,
        threshold: float = 1e-5,
        row_offset: Optional[int] = None,
    ):
        """Add a (B, S, k) top-k batch. Equivalent to the reference's
        dense-scatter + nonzero (cache.py:42-57, 209-218) without the dense
        buffer.  float32 batches route through the native single-pass C++
        extractor (native/coo.cpp) when it is built; other dtypes use numpy.

        `row_offset` overrides the `batch_number * batch_size` default — the
        run loop passes the ACTUAL consumed-row cursor so pass-through
        prepared batches whose size differs from `batch_size` still land on
        the right dataset rows."""
        vals = np.asarray(vals)
        idx = np.asarray(idx)
        if row_offset is None:
            row_offset = batch_number * self.batch_size
        row_offset += self.shard_size
        selected = self.filters[module_path] if self.filters is not None else None
        arena = self._arenas[module_path]

        if vals.dtype == np.float32:
            from ..native import coo_extract_topk

            arena.reserve(vals.size)
            n = coo_extract_topk(
                vals,
                idx,
                threshold=threshold,
                filter_ids=selected,
                row_offset=row_offset,
                out=(arena.loc[arena.n :], arena.act[arena.n :]),
            )
            arena.n += n
        else:
            mask = np.abs(vals) > threshold
            if selected is not None:
                mask &= np.isin(idx, selected)
            b, s, j = np.nonzero(mask)
            locations = np.empty((b.shape[0], 3), dtype=np.int64)
            locations[:, 0] = b + row_offset
            locations[:, 1] = s
            locations[:, 2] = idx[b, s, j]
            arena.append(locations, vals[mask])

    def add(self, latents: np.ndarray, batch_number: int, module_path: str):
        """Reference-compatible dense path: (B, S, F) masked latents
        (cache.py:42-57)."""
        latents = np.asarray(latents)
        locations, activations = self.get_nonzeros(latents, module_path)
        locations = locations.copy()
        locations[:, 0] += batch_number * self.batch_size + self.shard_size
        self._arenas[module_path].append(locations, activations)

    def get_nonzeros(self, latents: np.ndarray, module_path: str):
        mask = np.abs(latents) > 1e-5
        locations = np.argwhere(mask).astype(np.int64)
        activations = latents[mask]
        if self.filters is None:
            return locations, activations
        selected = self.filters[module_path]
        keep = np.isin(locations[:, 2], selected)
        return locations[keep], activations[keep]

    def save(self):
        """Publish the arenas as single per-module arrays (zero-copy views;
        reference cache.py:59-71 concatenates its per-batch list here)."""
        for module_path, arena in self._arenas.items():
            locations, activations = arena.views()
            self.feature_locations[module_path] = locations
            self.feature_activations[module_path] = activations

    def nonempty_modules(self) -> Iterable[str]:
        return set(self.feature_locations) | set(self._arenas)


class FeatureCache:
    """Drives caching over a token dataset (reference cache.py:95-310).

    Args:
        capture_fn: callable (batch) -> {module_path: hiddens (B, S, d)} — the
            functional replacement for the reference's forward hooks
            (reference cache.py:178-204).  `batch` is whatever the dataset
            yields (e.g. {"input_ids": (B, S)}).
        submodule_dict: {module_path: Sae}.
        shard_size: global row offset of this host's contiguous dataset shard.
        activation_dtype: dtype written to disk (reference writes the model
            dtype; fp32 gives bit-stable caches).
    """

    def __init__(
        self,
        capture_fn: Callable[[dict], Dict[str, jax.Array]],
        submodule_dict: Dict[str, Sae],
        batch_size: int,
        shard_size: int = 0,
        filters: Optional[Dict[str, np.ndarray]] = None,
        activation_dtype=np.float32,
    ):
        self.capture_fn = capture_fn
        self.submodule_dict = dict(submodule_dict)
        self.batch_size = batch_size
        self.activation_dtype = activation_dtype

        first_sae = next(iter(submodule_dict.values()))
        self.width = first_sae.cfg.num_latents_for(first_sae.d_in)

        self.cache = Cache(shard_size, filters, batch_size=batch_size)
        if filters is not None:
            self.filter_submodules(filters)

        self._topk_fns = {
            name: jax.jit(partial(topk_latents_step, cfg=sae.cfg))
            for name, sae in self.submodule_dict.items()
        }
        self._stream = None
        self._stream_n_splits = 0
        self._stream_marks: Dict[str, int] = {}
        self._row_cursor = 0  # dataset rows consumed (exact, any batch size)

    def enable_streaming(self, save_dir: str, n_splits: int, rank: int = 0):
        """Persist `Rank{r}_{start}_{end}.safetensors` shards incrementally
        DURING the run (background thread) instead of partition+write-at-end,
        amortizing `save_splits`' dead time (3.8 s/31M entries at flagship
        scale) into the device loop; `save_splits` then just finalizes shard
        headers (<0.5 s).  Call before `run()`."""
        from .stream_writer import StreamingSplitWriter

        os.makedirs(save_dir, exist_ok=True)
        self._stream = StreamingSplitWriter(
            save_dir,
            self._generate_split_indices(n_splits),
            rank=rank,
            act_dtype=self.activation_dtype,
        )
        self._stream_n_splits = n_splits
        self._stream_save_dir = save_dir
        self._stream_rank = rank
        self._stream_marks = {}

    def filter_submodules(self, filters: Dict[str, np.ndarray]):
        """Keep only hookpoints present in the filter (reference cache.py:151-156)."""
        self.submodule_dict = {
            k: v for k, v in self.submodule_dict.items() if k in filters
        }

    def _device_step(self, batch: dict, skip_bos: bool):
        """Dispatch one batch's device work (capture + per-hookpoint top-k)
        WITHOUT materializing results — JAX's async dispatch returns device
        arrays immediately, so the caller can overlap the previous batch's
        host-side extraction with this batch's device execution."""
        hiddens = self.capture_fn(batch)
        out = {}
        for module_path, h in hiddens.items():
            if module_path not in self.submodule_dict:
                continue
            if skip_bos:
                # Image path drops the leading BOS token (reference cache.py:402-409).
                h = h[:, 1:, :]
            sae = self.submodule_dict[module_path]
            out[module_path] = self._topk_fns[module_path](sae.params, h)
        return out

    def _host_step(self, dev_out: dict, batch_number: int, n_rows: int):
        """Materialize one batch's (vals, idx) and extract COO triples.

        `n_rows` is the batch's ACTUAL row count; the row cursor (not
        `batch_number * batch_size`) sets each row's global dataset index so
        pass-through batches of any size stay aligned."""
        for module_path, (vals, idx) in dev_out.items():
            vals = np.asarray(vals, dtype=self.activation_dtype)
            idx = np.asarray(idx)
            self.cache.add_topk(
                vals, idx, batch_number, module_path,
                row_offset=self._row_cursor,
            )
            if self._stream is not None:
                arena = self.cache._arenas[module_path]
                mark = self._stream_marks.get(module_path, 0)
                if arena.n > mark:
                    # Views into the arena are safe to hand off: the producer
                    # only appends past `n`, and growth reallocates (the old
                    # buffer stays alive under the submitted views).
                    self._stream.submit(
                        module_path,
                        arena.loc[mark : arena.n],
                        arena.act[mark : arena.n],
                    )
                    self._stream_marks[module_path] = arena.n
        self._row_cursor += n_rows

    def process_batch(self, batch: dict, batch_number: int, skip_bos: bool = False):
        """One cache step: capture hiddens, encode each hookpoint, accumulate."""
        self._host_step(
            self._device_step(batch, skip_bos), batch_number, _batch_rows(batch)
        )

    def _preallocate_arenas(self, n_tokens: int, tokens=None):
        """Size each hookpoint's arena from the RUN-WIDE token estimate:
        the CLIs call `run(cfg.ctx_len, dataset)` (reference API), so
        `n_tokens` is per-ROW — multiply by the dataset length when it has
        one (review r5: sizing from ctx_len alone reserved ~0.5M of a ~31M
        entry run, leaving the ~7 s mid-run fault stall this exists to
        remove).  Each token contributes k triples (every top-k entry of a
        TopK SAE is kept), scaled by the filter's coverage fraction when one
        is active (features assumed uniform).  Anyres image rows expand past
        ctx_len and prepared-batch iterables count batches, not rows — both
        only under-estimate, which is safe (growth resumes doubling).
        Capped by `MMSAE_PREALLOC_MAX_ENTRIES` (default 128M ~ 3.6 GB; 0
        disables)."""
        cap = int(os.environ.get("MMSAE_PREALLOC_MAX_ENTRIES", 128 * 1024 * 1024))
        if cap <= 0 or n_tokens <= 0:
            return
        try:
            n_rows = len(tokens) if tokens is not None else 0
        except TypeError:  # generator/iterator input: no length to use
            n_rows = 0
        total_tokens = n_tokens * n_rows if n_rows else n_tokens
        for module_path, sae in self.submodule_dict.items():
            expected = total_tokens * sae.cfg.k
            if self.cache.filters is not None:
                sel = self.cache.filters.get(module_path)
                if sel is not None and self.width:
                    expected = int(expected * (len(sel) / self.width)) + 1
            self.cache.preallocate(
                module_path, min(expected, cap), act_dtype=self.activation_dtype
            )

    def run(self, n_tokens: int, tokens, progress: bool = True, skip_bos: bool = False):
        """Iterate fixed-size batches over `tokens` (a sequence/dataset of
        {"input_ids": ...} rows or prepared batches) and fill the cache
        (reference cache.py:158-230).

        `n_tokens` is NOT a budget: like the reference (which accumulates
        `total_tokens` without ever breaking on it, cache.py:163-173), the
        whole dataset is cached regardless; the parameter is kept for API
        parity (the CLIs pass ctx_len) — and reused, together with
        `len(tokens)` when available, as the arena pre-reservation hint
        (see `Cache.preallocate`; an under-estimate just resumes doubling
        growth)."""
        self._preallocate_arenas(n_tokens, tokens)
        iterator = _batched(tokens, self.batch_size)
        try:
            from tqdm import tqdm

            iterator = tqdm(iterator, desc="Caching features", disable=not progress)
        except ImportError:
            pass
        # One-batch pipeline: dispatch batch N's device work, then extract
        # batch N-1 while N executes (the host-side COO extraction and the
        # subject forward otherwise strictly serialize).
        pending = None
        try:
            for batch_number, batch in enumerate(iterator):
                dev = self._device_step(batch, skip_bos)
                if pending is not None:
                    self._host_step(*pending)
                pending = (dev, batch_number, _batch_rows(batch))
            if pending is not None:
                self._host_step(*pending)
        except BaseException:
            if self._stream is not None:
                # Drop partial shards (zeroed headers are unparseable and
                # would poison a later concate) and stop the worker thread.
                self._stream.abort()
                self._stream = None
            raise
        if pending is not None:  # at least one batch was processed
            for module_path in self.submodule_dict:
                if self.cache._arenas[module_path].n == 0:
                    # Almost always a hookpoint-name mismatch (wrong prefix,
                    # or the layer was dropped by --truncate_layers): the
                    # capture returned nothing and hours of forwards would
                    # otherwise end in silently-empty shards. A filtered
                    # module CAN be legitimately empty, hence warn not raise.
                    from ..logger import logger

                    logger.warning(
                        f"hookpoint '{module_path}' produced 0 cache entries "
                        "over the entire run — check it matches the "
                        "subject's hookpoint names (prefix, layer index, "
                        "--truncate_layers); its shards will be empty"
                    )
        self.cache.save()

    # ---- persistence (format identical to the reference) -------------------
    def save(self, save_dir: str):
        """Write one `{module}.safetensors` per module (unsplit layout,
        reference cache.py:232-241)."""
        from safetensors.numpy import save_file

        for module_path in self.cache.nonempty_modules():
            save_file(
                {
                    "locations": self.cache.feature_locations[module_path],
                    "activations": self.cache.feature_activations[module_path],
                },
                f"{save_dir}/{module_path}.safetensors",
            )

    def _generate_split_indices(self, n_splits: int):
        boundaries = np.linspace(0, self.width, n_splits + 1).astype(np.int64)
        # End is made inclusive in the filename (reference cache.py:243-247).
        return list(zip(boundaries[:-1], boundaries[1:] - 1))

    def save_splits(
        self,
        n_splits: int,
        save_dir: str,
        rank: int = 0,
        *,
        replicate_boundary_drop: bool = False,
    ):
        """Write this rank's feature-range shards
        (`Rank{r}_{start}_{end}.safetensors`, reference cache.py:282-309).

        Note: the reference masks with `features < end` where `end` is the
        *inclusive* filename bound (reference cache.py:243-247, 293-294),
        silently dropping features that sit exactly on a split boundary
        (e.g. 128 features at width 131072 / 128 splits).  We keep those
        features by default; pass `replicate_boundary_drop=True` only when
        bit-matching reference-produced caches."""
        if getattr(self, "_stream", None) is not None:
            if replicate_boundary_drop:
                raise ValueError(
                    "streaming shard writes keep boundary features; disable "
                    "enable_streaming() to replicate the reference's "
                    "boundary-drop bug"
                )
            if n_splits != self._stream_n_splits:
                raise ValueError(
                    f"streaming was enabled with n_splits="
                    f"{self._stream_n_splits}, got {n_splits}"
                )
            # The streaming writer was configured with its own save_dir/rank;
            # silently ignoring mismatched arguments here would leave shards
            # in the wrong place for the caller's later merge.
            if os.path.abspath(save_dir) != os.path.abspath(self._stream_save_dir):
                raise ValueError(
                    f"streaming writes to {self._stream_save_dir!r}, but "
                    f"save_splits was called with save_dir={save_dir!r}"
                )
            if rank != self._stream_rank:
                raise ValueError(
                    f"streaming was enabled with rank={self._stream_rank}, "
                    f"got rank={rank}"
                )
            counts = self._stream.close(extra_modules=list(self.cache._arenas))
            self._stream = None
            for module_path, n in counts.items():
                have = self.cache._arenas[module_path].n
                # Explicit raise, not `assert`: this is the ONLY guard that
                # catches a streaming writer losing a chunk, and asserts are
                # compiled out under python -O (review r5) — truncated shards
                # must never persist silently.
                if n != have:
                    raise RuntimeError(
                        f"streaming writer persisted {n} entries for "
                        f"'{module_path}' but the arena holds {have} — the "
                        "shards on disk are incomplete; do not merge them"
                    )
            return
        from safetensors.numpy import save_file

        split_indices = self._generate_split_indices(n_splits)
        for module_path in self.cache.nonempty_modules():
            locations = self.cache.feature_locations[module_path]
            activations = self.cache.feature_activations[module_path]
            module_dir = f"{save_dir}/{module_path}"
            os.makedirs(module_dir, exist_ok=True)
            if not replicate_boundary_drop and activations.dtype == np.float32:
                # Native two-pass partition (one pass over the stream per
                # phase instead of n_splits boolean masks).
                from ..native import coo_partition_splits

                boundaries = np.array(
                    [s for s, _ in split_indices] + [split_indices[-1][1] + 1],
                    dtype=np.int64,
                )
                parts = coo_partition_splits(locations, activations, boundaries)
                for (start, end), (locs, acts) in zip(split_indices, parts):
                    save_file(
                        {"locations": locs, "activations": acts},
                        f"{module_dir}/Rank{rank}_{start}_{end}.safetensors",
                    )
                continue
            features = locations[:, 2]
            for start, end in split_indices:
                upper = end if replicate_boundary_drop else end + 1
                mask = (features >= start) & (features < upper)
                save_file(
                    {
                        "locations": locations[mask],
                        "activations": activations[mask],
                    },
                    f"{module_dir}/Rank{rank}_{start}_{end}.safetensors",
                )

    def concate_safetensors(self, n_splits: int, save_dir: str):
        """Merge per-rank shards into `{start}_{end}.safetensors`, deleting the
        shards (rank-0 only; reference cache.py:249-280)."""
        from safetensors.numpy import load_file, save_file

        split_indices = self._generate_split_indices(n_splits)
        for module_path in self.cache.nonempty_modules():
            module_dir = f"{save_dir}/{module_path}"
            for start, end in split_indices:
                shard_files = [
                    f
                    for f in os.listdir(module_dir)
                    if re.search(rf"Rank[0-9]+_{start}_{end}\.safetensors", f)
                ]
                if not shard_files:
                    # Every rank writes a (possibly empty) shard per split —
                    # zero files means a rank's output is missing, not an
                    # empty split; np.concatenate([]) would mask that.
                    raise FileNotFoundError(
                        f"no Rank*_{start}_{end}.safetensors shards in "
                        f"{module_dir}; a rank's save_splits output is missing"
                    )
                locations, activations = [], []
                # NUMERIC rank order, not lexicographic: sorted() alone
                # interleaves Rank10 between Rank1 and Rank2 at world >= 10,
                # breaking the merged file's row-major dataset ordering
                # (review r5). The reference is worse on both counts — its
                # single-digit regex `Rank[0-9]_` silently DROPS ranks >= 10
                # and it merges in unordered os.listdir order (reference
                # cache.py:259-268); both are deliberate fixes here.
                for fname in sorted(
                    shard_files,
                    key=lambda f: int(re.match(r"Rank([0-9]+)_", f).group(1)),
                ):
                    data = load_file(os.path.join(module_dir, fname))
                    locations.append(data["locations"])
                    activations.append(data["activations"])
                    os.remove(os.path.join(module_dir, fname))
                merged_locations = np.concatenate(locations, axis=0)
                save_file(
                    {
                        "locations": merged_locations,
                        "activations": np.concatenate(activations, axis=0),
                    },
                    f"{module_dir}/{start}_{end}.safetensors",
                )
                # Feature-index sidecar (.featidx): near-free here — the
                # merged data is already in memory — and it makes every later
                # filtered load O(selected entries) instead of O(split).  The
                # canonical .safetensors above stays byte-identical to the
                # reference format; best-effort by design (split_index.py).
                from .split_index import write_index

                write_index(
                    f"{module_dir}/{start}_{end}.safetensors",
                    merged_locations[:, 2],
                )


class FeatureImageCache(FeatureCache):
    """Image-input caching (reference cache.py:312-429): the capture_fn runs
    the multimodal forward on `"<image>"`-prompted inputs; the leading BOS
    position is dropped before encoding (reference cache.py:402-409)."""

    def run(self, n_tokens: int, tokens, progress: bool = True, **kw):
        if kw:
            # Previously **kw silently swallowed e.g. an explicit
            # skip_bos=False while forcing True anyway (review r5).
            raise TypeError(
                f"FeatureImageCache.run got unexpected kwargs {sorted(kw)}; "
                "the image cache always drops the BOS position "
                "(reference cache.py:402-409)"
            )
        super().run(n_tokens, tokens, progress=progress, skip_bos=True)


def _batch_rows(batch: dict) -> int:
    """Actual row count of a prepared batch (any leading key works: the
    collated keys all share the batch axis)."""
    for key in ("input_ids", "image", "images", "pixel_values"):
        if key in batch:
            return len(batch[key])
    return len(next(iter(batch.values())))


def _batched(items, batch_size: int):
    """Fixed-size batches, dropping the final ragged one (reference
    DataLoader(drop_last=True), cache.py:159-161). Iterables of pre-built
    batches pass through unchanged; a bare dict is rejected rather than
    silently iterated key-by-key."""
    if isinstance(items, dict):
        raise TypeError(
            "_batched got a plain dict — iterating it would yield keys, not "
            "batches. Pass a row dataset (supports __getitem__) or an "
            "iterator of prepared batch dicts (e.g. wrap one batch as "
            "iter([batch]) — a plain [batch] list would be re-collated "
            "row-wise and gain a spurious leading axis)."
        )
    if hasattr(items, "__getitem__"):
        n = len(items) // batch_size
        for i in range(n):
            chunk = [items[j] for j in range(i * batch_size, (i + 1) * batch_size)]
            yield _collate(chunk)
    else:
        yield from items


def _collate(chunk: Sequence):
    if isinstance(chunk[0], dict):
        out = {}
        for key in chunk[0]:
            vals = [c[key] for c in chunk]
            if isinstance(vals[0], (np.ndarray, list)) or np.isscalar(vals[0]):
                try:
                    out[key] = np.stack([np.asarray(v) for v in vals])
                    continue
                except Exception:
                    pass
            out[key] = vals
        return out
    # Raw (non-dict) rows are token-id sequences, the reference's plain
    # tensor-dataset shape (reference cache.py:159-173). Wrap them as an
    # input_ids batch: a bare ndarray would crash _batch_rows/capture_fn
    # downstream with an obscure AttributeError (review r5).
    return {"input_ids": np.stack([np.asarray(c) for c in chunk])}
