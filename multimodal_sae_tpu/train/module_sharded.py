"""Module-sharded SAE training as one jitted shard_map program.

This is the literal TPU translation of the reference's `distribute_modules`
mode (reference train/sae/sae/trainer.py:495-538): there, every rank runs the
frozen model forward on its own batch shard, then `dist.all_to_all` exchanges
hidden states so each rank holds the FULL batch for ITS hookpoints, and each
rank trains its own SAE copy.  Here the same dataflow is a single compiled
program over a `('module',)` mesh axis:

* SAE parameters/optimizer state are stacked with a leading module axis and
  sharded `P('module')` — one SAE per device, never replicated;
* hidden states arrive stacked (M, N, d) and sharded over the *batch* dim
  (each device computed its batch shard for all modules);
* `jax.lax.all_to_all` inside `shard_map` re-shards batch→module over ICI —
  the exact collective the reference performs with NCCL;
* each device then runs the standard forward/backward/Adam update on its own
  module, with per-module metrics and fired-latent masks returned sharded.

`SaeTrainer` (train/trainer.py) keeps the simpler per-hookpoint device-group
formulation; this module provides the collective-based variant for topologies
where the hidden exchange should ride ICI explicitly.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import SaeConfig
from ..sae import (
    forward,
    init_params,
    remove_gradient_parallel_to_decoder_directions,
    set_decoder_norm_to_unit_norm,
)


class ModuleShardedState(NamedTuple):
    params: dict  # each leaf (M, ...) sharded P('module')
    opt_state: tuple


class ModuleShardedTrainer:
    """One SAE per device over a ('module',) mesh axis.

    Args:
        cfg: SaeConfig (shared across modules; the reference requires equal
            widths in this mode, trainer.py:114-119).
        d_in: hidden width (equal across hookpoints by the same requirement).
        num_modules: number of hookpoints == mesh axis size.
        mesh: a Mesh with a 'module' axis of size num_modules.
    """

    def __init__(
        self,
        cfg: SaeConfig,
        d_in: int,
        num_modules: int,
        mesh: Mesh,
        lr: float,
        auxk_alpha: float = 0.0,
        seed: int = 0,
    ):
        assert mesh.shape["module"] == num_modules
        self.cfg = cfg
        self.mesh = mesh
        self.num_modules = num_modules
        self.lr = lr
        self.auxk_alpha = auxk_alpha
        self.optimizer = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)

        keys = jax.random.split(jax.random.PRNGKey(seed), num_modules)
        params = jax.vmap(lambda k: init_params(k, d_in, cfg))(keys)
        opt_state = jax.vmap(self.optimizer.init)(params)

        shard = NamedSharding(mesh, P("module"))
        self.state = ModuleShardedState(
            params=jax.device_put(params, shard),
            opt_state=jax.device_put(opt_state, shard),
        )
        self._step = self._build_step()

    def _build_step(self):
        cfg, optimizer, lr, auxk_alpha = self.cfg, self.optimizer, self.lr, self.auxk_alpha

        def per_module_update(params, opt_state, hiddens, dead_mask):
            """Standard single-SAE update (renorm → grad → clip → project →
            Adam), running on one device for its module.

            Mirrors SaeTrainer's accumulate/apply_updates math
            (train/trainer.py): any change to the loss weighting, clip
            epsilon, or projection order there must land here too —
            tests/test_module_sharded.py's independent-training parity test
            is the drift tripwire."""
            if cfg.normalize_decoder:
                params = set_decoder_norm_to_unit_norm(params)

            def loss_fn(p):
                out = forward(p, hiddens, cfg, dead_mask if auxk_alpha > 0 else None)
                loss = out.fvu + auxk_alpha * out.auxk_loss + out.multi_topk_fvu / 8
                return loss, out

            (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            gnorm = jnp.sqrt(
                sum(jnp.sum(jnp.square(g)) for g in jax.tree_util.tree_leaves(grads))
            )
            scale = jnp.minimum(1.0, 1.0 / (gnorm + 1e-6))
            grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
            if cfg.normalize_decoder:
                grads = remove_gradient_parallel_to_decoder_directions(params, grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: -lr * u, updates)
            params = optax.apply_updates(params, updates)
            return params, opt_state, out.fvu, out.fired

        def sharded_step(params, opt_state, hiddens, dead_mask):
            # Local views: params/opt (1, ...); hiddens (M, N/M, d) — this
            # device's batch shard for every module; dead_mask (1, L).
            # The all_to_all swaps module<->batch sharding: afterwards this
            # device holds the FULL batch for its single module
            # (== reference scatter_hiddens, trainer.py:513-538).
            h = jax.lax.all_to_all(
                hiddens, "module", split_axis=0, concat_axis=1, tiled=True
            )
            # h: (1, N, d) — squeeze the module axis.
            p = jax.tree_util.tree_map(lambda a: a[0], params)
            o = jax.tree_util.tree_map(lambda a: a[0], opt_state)
            p, o, fvu, fired = per_module_update(p, o, h[0], dead_mask[0])
            expand = lambda a: a[None]
            return (
                jax.tree_util.tree_map(expand, p),
                jax.tree_util.tree_map(expand, o),
                fvu[None],
                fired[None],
            )

        mesh = self.mesh
        mapped = shard_map(
            sharded_step,
            mesh=mesh,
            in_specs=(P("module"), P("module"), P(None, "module"), P("module")),
            out_specs=(P("module"), P("module"), P("module"), P("module")),
            check_vma=False,
        )
        return jax.jit(mapped, donate_argnums=(0, 1))

    def step(self, hiddens_stacked: jax.Array, dead_mask: jax.Array):
        """Args:
            hiddens_stacked: (M, N, d) — hidden states for all M hookpoints
                over the global batch, batch-sharded over the mesh.
            dead_mask: (M, L) bool.
        Returns (fvu (M,), fired (M, L))."""
        M, N = hiddens_stacked.shape[:2]
        if M != self.num_modules or N % self.num_modules != 0:
            # The P(None, 'module') sharding + tiled all_to_all need an
            # (M, N, d) operand with M == num_modules and N divisible by it;
            # violations otherwise surface as opaque partitioner errors.
            raise ValueError(
                f"hiddens_stacked must be (num_modules={self.num_modules}, "
                f"N % {self.num_modules} == 0, d); got (M={M}, N={N}, ...)"
            )
        params, opt_state, fvu, fired = self._step(
            self.state.params, self.state.opt_state, hiddens_stacked, dead_mask
        )
        self.state = ModuleShardedState(params, opt_state)
        return fvu, fired

    def module_params(self, m: int) -> dict:
        """Unstacked parameters of module m (host-side convenience).

        Multi-host meshes shard the module axis across processes, so the
        leaves are not fully addressable locally — gather them with a host
        allgather instead of `device_get` (which raises there)."""
        if jax.process_count() > 1:
            from jax.experimental import multihost_utils

            return jax.tree_util.tree_map(
                lambda a: np.asarray(multihost_utils.process_allgather(a, tiled=True))[m],
                self.state.params,
            )
        return jax.tree_util.tree_map(lambda a: jax.device_get(a)[m], self.state.params)
