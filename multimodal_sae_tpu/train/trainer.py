"""SAE trainer — pjit data-parallel training of TopK SAEs on frozen-LMM
activations.

Re-design of the reference trainer (reference train/sae/sae/trainer.py) for
single-controller JAX:

* DDP (reference trainer.py:334-345) disappears: one jitted train step over a
  `('data',)` mesh with batch-sharded hiddens and replicated params; XLA
  inserts the gradient all-reduces.
* The per-batch loop is: renorm decoder → accumulate grads over micro chunks
  → clip → (on grad-acc boundary) project off decoder directions → Adam with
  linear-warmup schedule → dead-feature bookkeeping (reference
  trainer.py:188-461 step for step).
* b_dec is initialized to the geometric median of the first batch's (global)
  hiddens (reference trainer.py:325-332); with sharded hiddens the all-gather
  is compiled in.
* `distribute_modules` (reference trainer.py:495-538) becomes per-hookpoint
  device groups: each hookpoint's SAE/optimizer lives on its own sub-mesh and
  hidden states flow there as compiled transfers — the single-controller
  equivalent of the reference's `dist.all_to_all` hidden exchange.

Checkpoint layout keeps the reference's interchange files
({run}/{hookpoint}/sae.safetensors + cfg.json, reference trainer.py:540-569);
optimizer/scheduler state is saved as safetensors instead of torch .pt.
"""

from __future__ import annotations

import json
import os
from collections import defaultdict
from dataclasses import asdict
from fnmatch import fnmatchcase
from typing import Dict, Iterable

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import TrainConfig
from ..ops import geometric_median
from ..parallel import data_sharding, get_mesh, replicated_sharding
from ..sae import (
    Sae,
    forward,
    remove_gradient_parallel_to_decoder_directions,
    set_decoder_norm_to_unit_norm,
)
from ..utils import natsorted, rank0_print


def linear_warmup_schedule(warmup_steps: int, total_steps: int):
    """transformers.get_linear_schedule_with_warmup semantics
    (reference trainer.py:155-157): linear 0→1 over warmup, then linear decay
    to 0 at total_steps."""

    def schedule(step):
        # Pure host arithmetic (float32 to match the previous jnp version
        # bit-for-bit): the scale feeds `apply` as a python float, so
        # computing it on device forced a device_get sync that stalled the
        # apply dispatch every grad-acc boundary (measured in the composed
        # train loop, bench.py --train-e2e).
        step = np.float32(step)
        warm = step / np.maximum(np.float32(1.0), np.float32(warmup_steps))
        decay = np.maximum(
            np.float32(0.0),
            (np.float32(total_steps) - step)
            / np.maximum(np.float32(1.0), np.float32(total_steps - warmup_steps)),
        )
        return float(warm if step < warmup_steps else decay)

    return schedule


def _global_norm(tree):
    leaves = jax.tree_util.tree_leaves(tree)
    return jnp.sqrt(sum(jnp.sum(jnp.square(g)) for g in leaves))


class SaeTrainer:
    """Trains one SAE per hookpoint over a frozen subject model
    (reference trainer.py:67-461).

    Args:
        cfg: TrainConfig.
        dataset: indexable dataset of {"input_ids": (S,)} rows (already
            shuffled; reference shuffles before passing, __main__.py:133-134).
        model: an ActivationSource (see models/api.py).
        mesh: optional jax Mesh; defaults to all devices on a 'data' axis.
    """

    def __init__(self, cfg: TrainConfig, dataset, model, mesh=None, collator=None):
        self.model = model
        self.collator = collator  # e.g. DataCollatorForImage for mm_data
        all_names = model.hookpoint_names()

        if cfg.hookpoints:
            assert not cfg.layers, "Cannot specify both `hookpoints` and `layers`."
            raw = [
                name
                for name in all_names
                if any(fnmatchcase(name, pat) for pat in cfg.hookpoints)
            ]
            cfg.hookpoints = natsorted(raw)
        else:
            if not cfg.layers:
                n_layers = len(all_names)
                cfg.layers = list(range(0, n_layers, cfg.layer_stride))
            layers_name = model.layers_name()
            cfg.hookpoints = [f"{layers_name}.{i}" for i in cfg.layers]
            # Unlike the fnmatch path above (which can only select existing
            # names), --layers fabricates names — validate them, or a layer
            # index past the model's depth (or one dropped by
            # --truncate_layers) trains nothing and checkpoints an untouched
            # SAE without any error (review r5).
            missing = [h for h in cfg.hookpoints if h not in all_names]
            if missing:
                raise ValueError(
                    f"--layers resolved to hookpoint(s) {missing} that do "
                    f"not exist on the subject (it has {len(all_names)} "
                    "layers; --truncate_layers drops layers from the top)"
                )

        if not cfg.hookpoints:
            raise ValueError(
                "no hookpoints resolved — check --hookpoints patterns / "
                f"--layers against the model's modules (e.g. "
                f"{model.hookpoint_names()[:3]}...)"
            )
        self.cfg = cfg
        self.dataset = dataset
        self.mesh = mesh if mesh is not None else get_mesh(("data",))
        self.distribute_modules()

        num_examples = len(dataset)
        input_widths = model.resolve_widths(cfg.hookpoints)
        unique_widths = set(input_widths.values())
        if cfg.distribute_modules and len(unique_widths) > 1:
            raise ValueError(
                f"All modules must output tensors of the same shape when using "
                f"`distribute_modules=True`, got {unique_widths}"
            )
        self.input_widths = input_widths

        key = jax.random.PRNGKey(0)
        keys = jax.random.split(key, len(self.local_hookpoints()))
        sae_dtype = jnp.dtype(cfg.sae_dtype)
        self.saes: Dict[str, Sae] = {
            hook: Sae(input_widths[hook], cfg.sae, dtype=sae_dtype, key=k)
            for hook, k in zip(self.local_hookpoints(), keys)
        }

        # Per-SAE auto LR: 2e-4 / sqrt(num_latents / 2**14) (reference trainer.py:131).
        self.base_lrs = {
            name: cfg.lr or 2e-4 / (sae.num_latents / (2**14)) ** 0.5
            for name, sae in self.saes.items()
        }
        lrs = [f"{lr:.2e}" for lr in sorted(set(self.base_lrs.values()))]
        rank0_print(
            f"Learning rates: {lrs}" if len(lrs) > 1 else f"Learning rate: {lrs[0]}"
        )

        num_batches = num_examples // cfg.batch_size
        self.num_batches = num_batches
        # NOTE: the reference passes batches (not optimizer steps) as the decay
        # horizon (trainer.py:155-157); kept for parity.
        self.schedule = linear_warmup_schedule(cfg.lr_warmup_steps, num_batches)

        if cfg.adam_8bit:
            from ..ops.adam8bit import scale_by_adam8bit

            rank0_print("Using 8-bit blockwise Adam state")
            self.optimizer = scale_by_adam8bit(b1=0.9, b2=0.999, eps=1e-8)
        else:
            self.optimizer = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        self.opt_states = {
            name: self.optimizer.init(sae.params) for name, sae in self.saes.items()
        }
        self.grad_accs = {
            name: jax.tree_util.tree_map(jnp.zeros_like, sae.params)
            for name, sae in self.saes.items()
        }

        self.global_step = 0
        self.opt_step = 0  # number of optimizer updates so far
        self.num_tokens_since_fired = {
            name: np.zeros(sae.num_latents, dtype=np.int64)
            for name, sae in self.saes.items()
        }
        self._did_fire = {
            name: np.zeros(sae.num_latents, dtype=bool) for name, sae in self.saes.items()
        }
        # Host<->device traffic minimization (measured on the composed train
        # loop, bench.py --train-e2e): per-step `fired` readbacks are a hard
        # host sync each step (131 KB + queue drain), so fired masks are
        # OR-accumulated ON DEVICE and read back once per grad-acc boundary;
        # the dead mask similarly only changes at boundaries, so one
        # device-resident copy is reused across the window instead of
        # re-uploading 131 KB with every accumulate dispatch.
        self._fired_dev: Dict[str, jax.Array] = {}
        self._dead_mask_dev: Dict[str, jax.Array] = {}
        self._num_tokens_in_step = 0
        self._b_dec_initialized = False  # set on resume / after step 0

        self._build_jitted_fns()
        self._ensure_global_state()

    def _mesh_is_multiprocess(self, mesh) -> bool:
        return any(
            d.process_index != jax.process_index()
            for d in mesh.devices.flatten()
        )

    def _ensure_global_state(self):
        """Multi-process DP: promote per-process SAE/optimizer state to
        fully-replicated global arrays over the mesh (the reference's DDP
        parameter replication, reference trainer.py:334-345).  Single-process
        runs are untouched — jit commits local arrays lazily as before."""
        if not self._mesh_is_multiprocess(self.mesh):
            return
        for name, sae in self.saes.items():
            repl = replicated_sharding(self._mesh_for(name))
            globalize = lambda x: jax.device_put(jax.device_get(x), repl)
            sae.params = jax.tree_util.tree_map(globalize, sae.params)
            self.opt_states[name] = jax.tree_util.tree_map(
                globalize, self.opt_states[name]
            )
            self.grad_accs[name] = jax.tree_util.tree_map(
                globalize, self.grad_accs[name]
            )

    def _refresh_dead_mask(self, name: str):
        """Recompute the device-resident dead mask from the host counters.
        Called at grad-acc boundaries (the only time counters change) and on
        first use / resume — not per step: the 131 KB upload otherwise rides
        every accumulate dispatch."""
        mask = self.num_tokens_since_fired[name] > self.cfg.dead_feature_threshold
        self._dead_mask_dev[name] = jax.device_put(
            mask, replicated_sharding(self._mesh_for(name))
        )
        return self._dead_mask_dev[name]

    def _globalize_hiddens(self, name: str, hiddens):
        """Assemble each process's local (rows, d) hiddens into one global
        batch-sharded array over the hookpoint's mesh — the single-controller
        replacement for DDP's per-rank private batches: XLA sees one global
        (world*rows, d) operand and inserts the gradient all-reduces DDP did
        by hand (reference trainer.py:334-345)."""
        mesh = self._mesh_for(name)
        if not self._mesh_is_multiprocess(mesh):
            # A tensor-parallel subject leaves its captures on the ('model',)
            # mesh; the jitted train step pins batch-sharded operands on the
            # trainer's mesh — reshard on-device (one XLA copy, no host trip).
            sharding = getattr(hiddens, "sharding", None)
            if getattr(sharding, "mesh", None) is not None and sharding.mesh != mesh:
                hiddens = jax.device_put(hiddens, data_sharding(mesh))
            return hiddens
        local = np.asarray(jax.device_get(hiddens))
        # Ragged multimodal batches pad to each process's batch max — if the
        # processes disagree on the flattened row count, the inferred global
        # shapes differ and the compiled collectives hang.  The check must be
        # UNCONDITIONAL: gating it on per-process seen-shape state would have
        # one process enter the allgather while another skips it — the exact
        # deadlock it exists to prevent.  Cost: one tiny host allgather per
        # hookpoint per batch (~ms against a 100 ms+ step).
        from jax.experimental import multihost_utils

        all_shapes = multihost_utils.process_allgather(
            np.asarray(local.shape, np.int64)
        )
        if not (all_shapes == np.asarray(local.shape, np.int64)).all():
            raise ValueError(
                f"processes disagree on the local hiddens shape "
                f"({all_shapes.tolist()}).  Multi-process training needs "
                "every process's flattened token count to match each "
                "step: use a fixed ctx_len text pipeline, or for "
                "multimodal data ensure geometry-uniform batches (anyres "
                "expanded length varies per image pinpoint, so mixed "
                "image sizes across processes cannot align)"
            )
        return jax.make_array_from_process_local_data(
            data_sharding(mesh), local
        )

    # ------------------------------------------------------------------ setup
    def local_hookpoints(self):
        return (
            self.module_plan[0] if self.module_plan else self.cfg.hookpoints
        )

    def distribute_modules(self):
        """Module-sharding plan (reference trainer.py:495-511). With a single
        controller every hookpoint is driven from this process; the plan maps
        hookpoints to device groups instead of ranks."""
        if not self.cfg.distribute_modules:
            self.module_plan = []
            self.device_groups = {}
            rank0_print(f"Training on modules: {self.cfg.hookpoints}")
            return

        import jax as _jax

        if _jax.process_count() > 1:
            # The device-group formulation drives every group from this
            # process; on a multi-host mesh some groups would contain only
            # non-addressable devices and device_put/jit against them fails
            # (opaquely, mid-init).  The shard_map all_to_all formulation in
            # train/module_sharded.py is the multi-host module sharding.
            raise NotImplementedError(
                "distribute_modules device groups are single-host only; use "
                "train/module_sharded.py (ModuleShardedTrainer) for "
                "multi-host module sharding"
            )
        devices = list(self.mesh.devices.flatten())
        n_groups = min(len(devices), len(self.cfg.hookpoints))
        per_group, rem = divmod(len(self.cfg.hookpoints), n_groups)
        assert rem == 0, "Number of modules must be divisible by the group count"
        groups = [
            self.cfg.hookpoints[start : start + per_group]
            for start in range(0, len(self.cfg.hookpoints), per_group)
        ]
        # Flat plan: all hookpoints stay local; each maps to a device group.
        self.module_plan = [self.cfg.hookpoints]
        dev_groups = np.array_split(np.array(devices), n_groups)
        self.device_groups = {}
        for grp_idx, hooks in enumerate(groups):
            sub = get_mesh(("data",), devices=dev_groups[grp_idx])
            for h in hooks:
                self.device_groups[h] = sub
            rank0_print(f"Device group {grp_idx} modules: {hooks}")

    def _mesh_for(self, name: str):
        return self.device_groups.get(name, self.mesh)

    def _build_jitted_fns(self):
        cfg = self.cfg

        def accumulate(params, grad_acc, hiddens, dead_mask):
            """Forward/backward over micro chunks; returns clipped accumulated
            grads + metrics (reference trainer.py:347-391)."""
            params = (
                set_decoder_norm_to_unit_norm(params)
                if cfg.sae.normalize_decoder
                else params
            )
            micro = cfg.micro_acc_steps
            n = hiddens.shape[0]
            if n % micro != 0:
                raise ValueError(
                    f"batch tokens ({n}) must be divisible by micro_acc_steps "
                    f"({micro}) — static-shape microbatching cannot split a "
                    f"ragged remainder (pick batch_size*ctx_len % micro == 0)"
                )
            chunked = hiddens.reshape(micro, n // micro, hiddens.shape[-1])
            acc_steps = cfg.grad_acc_steps * cfg.micro_acc_steps

            def loss_fn(p, chunk):
                out = forward(
                    p,
                    chunk,
                    cfg.sae,
                    dead_mask if cfg.auxk_alpha > 0 else None,
                    approx_topk=cfg.approx_topk,
                )
                loss = (
                    out.fvu + cfg.auxk_alpha * out.auxk_loss + out.multi_topk_fvu / 8
                )
                return loss / acc_steps, out

            def body(carry, chunk):
                g_acc, fired_acc, fvu, auxk, mt = carry
                (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                    params, chunk
                )
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                fired_acc = jnp.logical_or(fired_acc, out.fired)
                return (g_acc, fired_acc, fvu + out.fvu, auxk + out.auxk_loss, mt + out.multi_topk_fvu), None

            L = params["b_enc"].shape[0]
            init = (
                grad_acc,
                jnp.zeros((L,), dtype=bool),
                jnp.zeros(()),
                jnp.zeros(()),
                jnp.zeros(()),
            )
            (grad_acc, fired, fvu, auxk, mt), _ = jax.lax.scan(body, init, chunked)

            # clip_grad_norm_(1.0) on the accumulated grads, every batch
            # (reference trainer.py:391).
            norm = _global_norm(grad_acc)
            scale = jnp.minimum(1.0, 1.0 / (norm + 1e-6))
            grad_acc = jax.tree_util.tree_map(lambda g: g * scale, grad_acc)
            # Sums over micro chunks; averaged by the caller like the
            # reference's avg_fvu accumulation (reference trainer.py:367-377).
            metrics = {"fvu": fvu, "auxk": auxk, "multi_topk_fvu": mt}
            return params, grad_acc, fired, metrics

        def apply_updates(params, opt_state, grad_acc, lr):
            """Project, Adam, reset accumulator (reference trainer.py:393-402)."""
            grads = grad_acc
            if cfg.sae.normalize_decoder:
                grads = remove_gradient_parallel_to_decoder_directions(params, grads)
            updates, opt_state = self.optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            zeros = jax.tree_util.tree_map(jnp.zeros_like, grad_acc)
            return params, opt_state, zeros

        def b_dec_init(params, hiddens):
            median = geometric_median(hiddens)
            return {**params, "b_dec": median.astype(params["b_dec"].dtype)}

        self._jit_cache = {}
        self._accumulate_raw = accumulate
        self._apply_raw = apply_updates
        self._b_dec_init_raw = b_dec_init

    def _jitted(self, kind: str, name: str):
        """Per-hookpoint jitted fns, compiled against that hookpoint's mesh
        with batch-sharded hiddens and replicated params."""
        key = (kind, name)
        if key in self._jit_cache:
            return self._jit_cache[key]
        mesh = self._mesh_for(name)
        repl = replicated_sharding(mesh)
        if kind == "accumulate":
            fn = jax.jit(
                self._accumulate_raw,
                in_shardings=(repl, repl, data_sharding(mesh), repl),
                donate_argnums=(1,),
            )
        elif kind == "apply":
            fn = jax.jit(self._apply_raw, donate_argnums=(0, 1, 2))
        else:
            fn = jax.jit(
                self._b_dec_init_raw, in_shardings=(repl, data_sharding(mesh))
            )
        self._jit_cache[key] = fn
        return fn

    # ------------------------------------------------------------------ train
    def fit(self, log_fn=None):
        cfg = self.cfg
        wandb = None
        if cfg.log_to_wandb and log_fn is None:
            try:
                import wandb as _wandb

                _wandb.init(
                    name=cfg.run_name,
                    project="sae",
                    config=asdict(cfg),
                    save_code=True,
                )
                wandb = _wandb
            except ImportError:
                rank0_print("Weights & Biases not installed, skipping logging.")
                cfg.log_to_wandb = False

        num_sae_params = sum(
            int(np.prod(p.shape)) for s in self.saes.values() for p in s.params.values()
        )
        rank0_print(f"Number of SAE parameters: {num_sae_params:_}")

        ds = self.dataset
        if self.global_step > 0:
            n = self.global_step * cfg.batch_size
            ds = ds.select(range(n, len(self.dataset)))

        # No sink, no metric accumulation: step()'s avg_metrics path calls
        # float() on the jitted accumulate's scalars — a blocking
        # host-device sync per batch per hookpoint that the rest of the hot
        # loop was explicitly de-synced around (device-side fired masks,
        # device-resident dead mask). With wandb off and no log_fn, skip it
        # entirely (review r5).
        avg_metrics = (
            {name: defaultdict(float) for name in self.saes}
            if (wandb is not None or log_fn is not None)
            else None
        )

        pbar = None
        try:
            from tqdm.auto import tqdm

            pbar = tqdm(
                desc="Training", initial=self.global_step, total=self.num_batches
            )
        except ImportError:
            pass

        from ..utils import maybe_trace

        with maybe_trace("sae_train"), _save_on_preemption(self):
            self._fit_loop(ds, avg_metrics, wandb, log_fn, pbar)

        self.save()
        if pbar is not None:
            pbar.close()

    def _fit_loop(self, ds, avg_metrics, wandb, log_fn, pbar):
        cfg = self.cfg
        for batch in _iter_batches(ds, cfg.batch_size, collator=self.collator):
            self.step(batch, avg_metrics)

            step, substep = divmod(self.global_step, cfg.grad_acc_steps)
            if avg_metrics is not None and substep == 0 and cfg.wandb_log_frequency and (
                step % cfg.wandb_log_frequency == 0
            ):
                info = {}
                for name in self.saes:
                    mask = (
                        self.num_tokens_since_fired[name]
                        > cfg.dead_feature_threshold
                    )
                    info[f"fvu/{name}"] = avg_metrics[name]["fvu"]
                    info[f"dead_pct/{name}"] = float(mask.mean())
                    if cfg.auxk_alpha > 0:
                        info[f"auxk/{name}"] = avg_metrics[name]["auxk"]
                    if cfg.sae.multi_topk:
                        info[f"multi_topk_fvu/{name}"] = avg_metrics[name][
                            "multi_topk_fvu"
                        ]
                    avg_metrics[name].clear()
                if wandb is not None:
                    wandb.log(info, step=step)
                if log_fn is not None:
                    log_fn(step, info)

            if substep == 0 and step % cfg.save_every == 0:
                self.save()

            # global_step is advanced inside step().
            if pbar is not None:
                pbar.update()
            if getattr(self, "_preempted", False) and substep == 0:
                # Preemption-safe exit (SURVEY.md §5: the reference has no
                # failure handling). Only stop at a gradient-accumulation
                # boundary: checkpoints persist global_step but not the
                # partial grad_accs window, so a mid-window save would resume
                # into an optimizer update built from a truncated window
                # still scaled by the full acc_steps. Worst case this delays
                # the stop by grad_acc_steps - 1 batches.
                rank0_print("Preemption signal received; checkpointing and stopping.")
                break

    def step(self, batch: dict, avg_metrics=None):
        """One batch: capture hiddens, accumulate grads for every hookpoint,
        apply on grad-acc boundaries (reference trainer.py:275-414)."""
        cfg = self.cfg
        hidden_dict = self.model.capture(batch, self.cfg.hookpoints)

        input_ids = np.asarray(batch["input_ids"])
        self._num_tokens_in_step += int(input_ids.size)

        for name, hiddens in hidden_dict.items():
            if name not in self.saes:
                continue
            sae = self.saes[name]
            # flatten(0,1).  Ragged mm batches give a per-batch-max n, so the
            # jitted accumulate retraces per distinct n — bounded in practice
            # by the anyres pinpoint count (~5 expanded lengths for a fixed
            # prompt template), not per-batch.  Multi-process runs verify
            # cross-process shape agreement in _globalize_hiddens.
            hiddens = hiddens.reshape(-1, hiddens.shape[-1])

            # Batch sharding needs the token count divisible by the mesh; mm
            # (anyres) batches are ragged, so pad with wrap-around rows —
            # duplicating <= ndev-1 of thousands of tokens, a negligible
            # perturbation of the batch statistics (the reference had no such
            # constraint because each DDP rank trained its own shard).
            ndev = int(np.prod(self._mesh_for(name).devices.shape))
            pad = (-hiddens.shape[0]) % ndev
            if pad:
                hiddens = jnp.concatenate([hiddens, hiddens[:pad]], axis=0)
            hiddens = self._globalize_hiddens(name, hiddens)

            if self.global_step == 0 and not self._b_dec_initialized:
                sae.params = self._jitted("b_dec_init", name)(sae.params, hiddens)

            # Device-resident dead mask, refreshed only when the counters
            # change (grad-acc boundaries / resume) — already placed on the
            # replicated sharding the jitted accumulate expects.
            dead_mask = self._dead_mask_dev.get(name)
            if dead_mask is None:
                dead_mask = self._refresh_dead_mask(name)
            params, grad_acc, fired, metrics = self._jitted("accumulate", name)(
                sae.params, self.grad_accs[name], hiddens, dead_mask
            )
            sae.params = params
            self.grad_accs[name] = grad_acc
            # OR on device (async dispatch), read back at the boundary.
            prev = self._fired_dev.get(name)
            self._fired_dev[name] = (
                fired if prev is None else jnp.logical_or(prev, fired)
            )
            if avg_metrics is not None and cfg.wandb_log_frequency:
                # Guarded on wandb_log_frequency: 0 disables logging in
                # _fit_loop, and would divide by zero here.
                denom = (
                    cfg.grad_acc_steps * cfg.micro_acc_steps * cfg.wandb_log_frequency
                )
                for k, v in metrics.items():
                    avg_metrics[name][k] += float(v) / denom

        self._b_dec_initialized = True

        step, substep = divmod(self.global_step + 1, cfg.grad_acc_steps)
        if substep == 0:
            # schedule() is pure host arithmetic — no device sync before the
            # apply dispatches.
            lr_scale = self.schedule(self.opt_step)
            for name, sae in self.saes.items():
                lr = self.base_lrs[name] * lr_scale
                sae.params, self.opt_states[name], self.grad_accs[name] = self._jitted(
                    "apply", name
                )(sae.params, self.opt_states[name], self.grad_accs[name], lr)
            self.opt_step += 1

            # Dead-feature bookkeeping (reference trainer.py:404-414) — the
            # window's device-accumulated fired mask is read back here, once
            # per boundary (after the applies were already dispatched).
            for name, counts in self.num_tokens_since_fired.items():
                counts += self._num_tokens_in_step
                fired_dev = self._fired_dev.pop(name, None)
                if fired_dev is not None:
                    self._did_fire[name] |= np.asarray(fired_dev)
                counts[self._did_fire[name]] = 0
                self._did_fire[name][:] = False
                self._refresh_dead_mask(name)
            self._num_tokens_in_step = 0

        self.global_step += 1

    # ------------------------------------------------------------ checkpoints
    def save(self):
        """Write checkpoint (reference trainer.py:540-569): per-hookpoint
        sae.safetensors + cfg.json (interchange format), plus trainer state
        as safetensors/json."""
        from safetensors.numpy import save_file

        from ..parallel import barrier

        path = self.cfg.run_name or "sae-ckpts"
        if jax.process_index() != 0:
            # Params are fully replicated; rank 0 writes, everyone syncs
            # (reference rank0-gated save + barrier, trainer.py:540-569).
            barrier("trainer_save")
            return
        rank0_print("Saving checkpoint")
        os.makedirs(path, exist_ok=True)

        for hook, sae in self.saes.items():
            sae.save_to_disk(f"{path}/{hook}")

        state_tensors = {
            f"num_tokens_since_fired/{name}": counts
            for name, counts in self.num_tokens_since_fired.items()
        }
        save_file(state_tensors, f"{path}/state.safetensors")
        for name in self.saes:
            flat = _flatten_opt_state(self.opt_states[name])
            save_file(flat, f"{path}/optimizer_{_safe(name)}.safetensors")
        with open(f"{path}/state.json", "w") as f:
            json.dump(
                {
                    "global_step": self.global_step,
                    "opt_step": self.opt_step,
                    # Bumped when the 8-bit moment encoding changes; v2 =
                    # cube-root-companded m with raw-absmax scales
                    # (ops/adam8bit.py). Lets resume fail loudly instead of
                    # silently misreading old moments.
                    "adam8bit_format": 2,
                },
                f,
            )
        with open(f"{path}/config.json", "w") as f:
            json.dump(asdict(self.cfg), f)
        barrier("trainer_save")

    def load_state(self, path: str):
        """Resume (reference trainer.py:161-186): restores step counters,
        dead-feature counts, optimizer states and SAE weights."""
        from safetensors.numpy import load_file

        with open(f"{path}/state.json") as f:
            st = json.load(f)
        if self.cfg.adam_8bit and st.get("adam8bit_format", 1) != 2:
            raise ValueError(
                f"checkpoint at '{path}' stores 8-bit Adam moments in format "
                f"{st.get('adam8bit_format', 1)}; this build reads format 2 "
                "(cube-root-companded m, raw-absmax scales — ops/adam8bit.py)."
                " Resume with the build that wrote it, or restart the run."
            )
        self.global_step = st["global_step"]
        self.opt_step = st.get("opt_step", self.global_step)
        rank0_print(
            f"\033[92mResuming training at step {self.global_step} from '{path}'\033[0m"
        )

        state_tensors = load_file(f"{path}/state.safetensors")
        for name in self.saes:
            self.num_tokens_since_fired[name] = state_tensors[
                f"num_tokens_since_fired/{name}"
            ].copy()

        for name, sae in self.saes.items():
            loaded = Sae.load_from_disk(f"{path}/{name}")
            sae.params = loaded.params
            flat = load_file(f"{path}/optimizer_{_safe(name)}.safetensors")
            self.opt_states[name] = _unflatten_opt_state(
                flat, self.opt_states[name]
            )
        self._b_dec_initialized = True
        # Restored counters invalidate any cached device-resident dead masks.
        self._dead_mask_dev = {}
        self._fired_dev = {}
        self._ensure_global_state()  # loaded arrays are process-local


from contextlib import contextmanager


@contextmanager
def _save_on_preemption(trainer: "SaeTrainer"):
    """Install SIGTERM/SIGINT handlers that request a graceful stop: the fit
    loop checkpoints at the next batch boundary instead of dying mid-update.
    Handlers are restored on exit; non-main-thread contexts are a no-op."""
    import signal
    import threading

    if threading.current_thread() is not threading.main_thread():
        yield
        return

    trainer._preempted = False

    def handler(signum, frame):
        trainer._preempted = True

    previous = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            previous[sig] = signal.signal(sig, handler)
        except (ValueError, OSError):  # pragma: no cover
            pass
    try:
        yield
    finally:
        for sig, old in previous.items():
            signal.signal(sig, old)


def _safe(name: str) -> str:
    return name.replace("/", "_").replace(".", "_")


def _flatten_opt_state(opt_state) -> Dict[str, np.ndarray]:
    leaves, _ = jax.tree_util.tree_flatten(opt_state)
    out = {}
    for i, leaf in enumerate(leaves):
        out[f"leaf_{i}"] = np.asarray(leaf)
    return out


def _unflatten_opt_state(flat: Dict[str, np.ndarray], like):
    leaves, treedef = jax.tree_util.tree_flatten(like)
    new_leaves = []
    for i, leaf in enumerate(leaves):
        arr = flat[f"leaf_{i}"]
        new_leaves.append(jnp.asarray(arr, dtype=leaf.dtype).reshape(leaf.shape))
    return jax.tree_util.tree_unflatten(treedef, new_leaves)


def _iter_batches(dataset, batch_size: int, collator=None) -> Iterable[dict]:
    """Sequential fixed-size batches (no shuffling — the dataset is shuffled
    upstream for reproducibility, reference trainer.py:235-241).  Batching +
    default collation delegate to the cache pipeline's `_batched` (one
    hardened implementation: drop-last, per-key stack-else-list)."""
    from ..features.cache import _batched

    if not hasattr(dataset, "__getitem__"):
        # _batched would pass-through each raw ROW of an iterable dataset as
        # a "prepared batch"; the trainer needs indexed row datasets.
        raise TypeError(
            f"SaeTrainer needs an indexable row dataset (got "
            f"{type(dataset).__name__}); materialize the iterable first"
        )
    if collator is None:
        yield from _batched(dataset, batch_size)
        return
    n = len(dataset)
    for i in range(n // batch_size):
        rows = [dataset[j] for j in range(i * batch_size, (i + 1) * batch_size)]
        yield collator(rows)
