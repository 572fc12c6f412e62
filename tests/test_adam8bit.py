"""8-bit blockwise Adam (ops/adam8bit.py) — the TPU stand-in for the
reference's bitsandbytes Adam8bit (reference trainer.py:139-147)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import optax

from multimodal_sae_tpu.ops.adam8bit import (
    ScaleByAdam8bitState,
    _blocked,
    _deq,
    _deq_unsigned,
    _quant_signed,
    _quant_unsigned,
    _unblocked,
    scale_by_adam8bit,
)


def test_quant_roundtrip_error_bound():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 2048)).astype(np.float32))
    q, s = _quant_signed(x)
    err = np.abs(np.asarray(_deq(q, s)) - np.asarray(x))
    # Cube-root companding: |error| <= half a quantization step, widest at
    # the top of the range: 3 * absmax / 254 per block.
    bound = 3.0 * np.asarray(jnp.max(jnp.abs(x), axis=1)) / 254.0
    assert (err <= bound[:, None] + 1e-7).all()


def test_signed_companding_preserves_small_m():
    """Small first-moment coordinates sharing a block with a large-gradient
    outlier must NOT requantize to zero — the linear-map failure mode that
    froze their Adam update (measured ~10x-too-small updates)."""
    amax = 4.0
    m = np.array(
        [amax * 10.0**-k for k in range(0, 6)] + [-amax * 1e-5, 0.0],
        np.float32,
    )[None, :]
    q, s = _quant_signed(jnp.asarray(m))
    back = np.asarray(_deq(q, s))[0]
    for o, b in zip(m[0, :-1], back[:-1]):  # down to 1e-5 * absmax
        assert b != 0.0 and np.sign(b) == np.sign(o), (o, b)
        assert abs(b - o) <= 0.8 * abs(o), (o, b)
    assert back[-1] == 0.0  # exact zero stays zero


def test_small_gradient_coords_keep_updating():
    """Coordinates with |g| far below their block's absmax must receive
    ~full-size Adam updates (vs optax), and requantization noise must never
    exceed exact Adam's per-step bound max(1, (1-b1)/sqrt(1-b2))."""
    key = jax.random.PRNGKey(0)
    n = 8192
    # grads spanning 8 decades plus a per-block outlier
    g = jax.random.normal(key, (n,)) * jnp.exp(
        jax.random.uniform(jax.random.PRNGKey(1), (n,), minval=-18, maxval=0)
    )
    g = g.at[::2048].set(5.0)
    grads = {"w": g}
    params = {"w": jnp.zeros((n,))}
    ref, q8 = optax.scale_by_adam(), scale_by_adam8bit()
    rs, qs = ref.init(params), q8.init(params)
    for _ in range(20):
        ur, rs = ref.update(grads, rs)
        uq, qs = q8.update(grads, qs)
    ur, uq = np.asarray(ur["w"]), np.asarray(uq["w"])
    small = np.abs(np.asarray(g)) < 5.0 / 254
    # the linear-map regression gave mean |u| ~ 0.11 here (ref ~ 1.0)
    assert np.abs(uq[small]).mean() > 0.5 * np.abs(ur[small]).mean()
    bound = max(1.0, 0.1 / np.sqrt(0.001))
    assert np.abs(uq).max() <= bound + 1e-5


def test_unsigned_companding_precision_across_decades():
    """4th-root companding must hold ~relative precision over the many-decade
    spread of second moments instead of collapsing small entries to 0."""
    amax = 3.7
    v = jnp.asarray(
        np.array([amax * 10.0**-k for k in range(0, 7)] + [amax, 0.0], np.float32)
    )[None, :]
    q, s = _quant_unsigned(v)
    back = np.asarray(_deq_unsigned(q, s))[0]
    orig = np.asarray(v)[0]
    for o, b in zip(orig[:-1], back[:-1]):  # down to 1e-6 * absmax
        assert abs(b - o) <= 0.55 * o, (o, b)
    assert back[-1] == 0.0  # exact zero stays zero


def test_blocking_roundtrip_odd_shapes():
    rng = np.random.default_rng(1)
    for shape in [(3,), (7, 11), (2048,), (5, 2048)]:
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        assert np.array_equal(np.asarray(_unblocked(_blocked(x), shape)), np.asarray(x))


def test_state_is_8bit():
    params = {"w": jnp.zeros((128, 64)), "b": jnp.zeros((30,))}
    tx = scale_by_adam8bit()
    state = tx.init(params)
    assert isinstance(state, ScaleByAdam8bitState)
    assert state.m_q["w"].dtype == jnp.int8
    assert state.v_q["w"].dtype == jnp.uint8
    # Leaves under min_8bit_size keep fp32 moments (bitsandbytes semantics).
    assert state.m_q["b"].dtype == jnp.float32
    assert state.m_scale["b"].size == 0


def test_matches_fp32_adam_on_quadratic():
    """Both state paths at once (a quantized >=4096-element leaf and an fp32
    small leaf): 8-bit Adam must converge to the fp32-Adam solution."""
    rng = np.random.default_rng(2)
    target = {
        "big": jnp.asarray(rng.normal(size=(8192,)).astype(np.float32)),
        "small": jnp.asarray(rng.normal(size=(16,)).astype(np.float32)),
    }

    def loss(x):
        return sum(jnp.sum((x[k] - target[k]) ** 2) for k in x)

    def run(tx, steps=300, lr=3e-2):
        x = jax.tree_util.tree_map(jnp.zeros_like, target)
        state = tx.init(x)

        @jax.jit
        def step(x, state):
            g = jax.grad(loss)(x)
            u, state = tx.update(g, state, x)
            return jax.tree_util.tree_map(lambda a, b: a - lr * b, x, u), state

        for _ in range(steps):
            x, state = step(x, state)
        return x

    x8 = run(scale_by_adam8bit())
    x32 = run(optax.scale_by_adam())
    l8, l32 = float(loss(x8)), float(loss(x32))
    l0 = float(loss(jax.tree_util.tree_map(jnp.zeros_like, target)))
    assert l8 < 0.01 * l0  # converged
    assert l8 < l32 * 2 + 1e-2  # same regime as fp32 Adam
    for k in target:
        np.testing.assert_allclose(np.asarray(x8[k]), np.asarray(x32[k]), atol=0.08)


def test_trainer_adam8bit_step_and_checkpoint(tmp_path):
    """SaeTrainer with adam_8bit=True: steps run, params move, checkpoint
    save/load roundtrips the 8-bit moments through safetensors."""
    from multimodal_sae_tpu.config import SaeConfig, TrainConfig
    from multimodal_sae_tpu.models import SyntheticActivationSource
    from multimodal_sae_tpu.train import SaeTrainer

    rng = np.random.default_rng(3)
    ds = [{"input_ids": rng.integers(0, 128, size=16)} for _ in range(32)]
    cfg = TrainConfig(
        sae=SaeConfig(expansion_factor=4, k=4),
        batch_size=8,
        lr=1e-3,
        lr_warmup_steps=0,
        log_to_wandb=False,
        save_every=10_000,
        hookpoints=["layers.1"],
        adam_8bit=True,
        run_name=str(tmp_path / "run"),
    )
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    trainer = SaeTrainer(cfg, ds, model)
    w0 = np.asarray(trainer.saes["layers.1"].params["W_enc"]).copy()
    for i in range(3):
        trainer.step({"input_ids": np.stack([r["input_ids"] for r in ds[i * 8 : (i + 1) * 8]])})
    assert not np.array_equal(w0, np.asarray(trainer.saes["layers.1"].params["W_enc"]))

    leaves = jax.tree_util.tree_leaves(trainer.opt_states["layers.1"])
    assert any(l.dtype == jnp.int8 for l in leaves)
    assert any(l.dtype == jnp.uint8 for l in leaves)

    trainer.save()
    restored = SaeTrainer(cfg, ds, model)
    restored.load_state(cfg.run_name)
    for a, b in zip(
        jax.tree_util.tree_leaves(trainer.opt_states["layers.1"]),
        jax.tree_util.tree_leaves(restored.opt_states["layers.1"]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    restored.step({"input_ids": np.stack([r["input_ids"] for r in ds[:8]])})


def test_old_adam8bit_checkpoint_rejected(tmp_path):
    """A v1 (linear-quantized) optimizer checkpoint must fail loudly on
    resume rather than silently misreading the companded v2 encoding."""
    import json

    from multimodal_sae_tpu.config import SaeConfig, TrainConfig
    from multimodal_sae_tpu.models import SyntheticActivationSource
    from multimodal_sae_tpu.train import SaeTrainer

    rng = np.random.default_rng(4)
    ds = [{"input_ids": rng.integers(0, 128, size=16)} for _ in range(16)]
    cfg = TrainConfig(
        sae=SaeConfig(expansion_factor=4, k=4),
        batch_size=8,
        log_to_wandb=False,
        hookpoints=["layers.1"],
        adam_8bit=True,
        run_name=str(tmp_path / "run"),
    )
    model = SyntheticActivationSource(d_model=32, n_layers=2)
    trainer = SaeTrainer(cfg, ds, model)
    trainer.save()

    state_path = tmp_path / "run" / "state.json"
    st = json.loads(state_path.read_text())
    assert st["adam8bit_format"] == 2  # current format is stamped
    del st["adam8bit_format"]  # simulate a pre-companding checkpoint
    state_path.write_text(json.dumps(st))
    with pytest.raises(ValueError, match="format 1"):
        SaeTrainer(cfg, ds, model).load_state(cfg.run_name)
