"""shard_map all_to_all module-sharded training: the collective-based variant
must reproduce independent per-module training run on one device."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from multimodal_sae_tpu.config import SaeConfig
from multimodal_sae_tpu.parallel import get_mesh
from multimodal_sae_tpu.sae import (
    forward,
    init_params,
    remove_gradient_parallel_to_decoder_directions,
    set_decoder_norm_to_unit_norm,
)
from multimodal_sae_tpu.train.module_sharded import ModuleShardedTrainer

M, D, N = 4, 32, 64
LR = 1e-3


def _reference_update(params, opt, optimizer, cfg, h):
    params = set_decoder_norm_to_unit_norm(params)

    def loss_fn(p):
        out = forward(p, h, cfg, None)
        return out.fvu + out.multi_topk_fvu / 8, out

    (_, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    gnorm = jnp.sqrt(sum(jnp.sum(g * g) for g in jax.tree_util.tree_leaves(grads)))
    scale = jnp.minimum(1.0, 1.0 / (gnorm + 1e-6))
    grads = jax.tree_util.tree_map(lambda g: g * scale, grads)
    grads = remove_gradient_parallel_to_decoder_directions(params, grads)
    updates, opt = optimizer.update(grads, opt, params)
    updates = jax.tree_util.tree_map(lambda u: -LR * u, updates)
    return optax.apply_updates(params, updates), opt, out.fvu


def test_all_to_all_matches_independent_training():
    assert jax.device_count() >= M
    mesh = get_mesh(("module",), devices=jax.devices()[:M])
    cfg = SaeConfig(expansion_factor=4, k=4)
    trainer = ModuleShardedTrainer(cfg, D, M, mesh, lr=LR)

    rng = np.random.default_rng(0)
    hiddens = jnp.asarray(rng.normal(size=(M, N, D)), dtype=jnp.float32)
    dead = jnp.zeros((M, D * 4), dtype=bool)

    # Independent single-device reference with the same initialization.
    keys = jax.random.split(jax.random.PRNGKey(0), M)
    optimizer = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
    ref_params = [init_params(k, D, cfg) for k in keys]
    ref_opts = [optimizer.init(p) for p in ref_params]

    for step in range(3):
        fvu, fired = trainer.step(hiddens, dead)
        assert fvu.shape == (M,)
        assert fired.shape == (M, D * 4)
        ref_fvus = []
        for m in range(M):
            ref_params[m], ref_opts[m], f = _reference_update(
                ref_params[m], ref_opts[m], optimizer, cfg, hiddens[m]
            )
            ref_fvus.append(float(f))
        np.testing.assert_allclose(np.asarray(fvu), ref_fvus, rtol=2e-4, atol=1e-6)

    for m in range(M):
        got = trainer.module_params(m)
        for k in got:
            np.testing.assert_allclose(
                got[k], np.asarray(ref_params[m][k]), rtol=3e-4, atol=3e-6
            )


def test_parameters_are_module_sharded():
    mesh = get_mesh(("module",), devices=jax.devices()[:M])
    trainer = ModuleShardedTrainer(SaeConfig(expansion_factor=2, k=2), D, M, mesh, lr=LR)
    sharding = trainer.state.params["W_enc"].sharding
    assert len(sharding.device_set) == M
