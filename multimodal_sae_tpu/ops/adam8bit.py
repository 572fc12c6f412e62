"""8-bit Adam: blockwise-quantized optimizer moments, an optax transformation.

The reference trains its SAEs with bitsandbytes `Adam8bit` when available
(reference train/sae/sae/trainer.py:139-147) because fp32 Adam state at
131072x4096 is ~4.3 GB.  The TPU-shaped equivalent stores both moments in
8 bits with per-block absmax scales (block=2048 along the flattened leaf):
m (signed) as int8, v (non-negative) as uint8 — a 4x optimizer-memory
reduction (4.3 GB -> ~1.1 GB at flagship shape).  Each step dequantizes,
applies the standard bias-corrected Adam update, and requantizes — all
in-jit, so the fp32 moments exist only as fused temporaries.

bitsandbytes uses a non-linear dynamic quantization map; this uses power
companding (cube-root for the signed m, 4th-root for the non-negative v),
which is VPU-cheap and — unlike a LINEAR int8 map — keeps coordinates whose
moment is small relative to the block absmax from underflowing to zero.
That matters: with a linear map, any |m| < absmax/254 requantizes to 0
every step, so latents sharing a block with one large-gradient outlier
never accumulate momentum and their Adam update collapses (~10x too small,
measured vs `optax.scale_by_adam`).  Like bitsandbytes
(`min_8bit_size=4096`), leaves smaller than 4096 elements keep fp32
moments — quantization noise dominates tiny problems while saving nothing.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

_BLOCK = 2048


def _pad_len(n: int) -> int:
    return (-n) % _BLOCK


def _quant_signed(x: jax.Array):
    """f32 (nb, B) -> (int8, absmax (nb,)) with cube-root companding.

    q = round(127 * cbrt(m/absmax)): the smallest representable nonzero
    |m| is (0.5/127)^3 * absmax ~ 6e-8 * absmax (vs absmax/254 linear),
    so small-momentum coordinates keep updating even when their block
    holds a large-gradient outlier."""
    absmax = jnp.max(jnp.abs(x), axis=1)
    safe = jnp.where(absmax == 0, 1.0, absmax)
    r = x / safe[:, None]
    q = jnp.clip(jnp.round(127.0 * jnp.cbrt(r)), -127, 127).astype(jnp.int8)
    return q, absmax


def _quant_unsigned(x: jax.Array):
    """f32 (nb, B), x >= 0 -> (uint8, scale (nb,)) with 4th-root companding.

    The second moment spans many decades within a block; a LINEAR uint8 map
    collapses entries < absmax/510 to zero, which turns the Adam update into
    m/eps explosions for coordinates whose v underflows but m does not (the
    reason bitsandbytes uses a non-linear dynamic map).  Storing
    q = 255 * (v/absmax)^(1/4) keeps ~50% relative precision down to
    v ~ 1e-6 * absmax."""
    amax = jnp.max(x, axis=1)
    safe = jnp.where(amax == 0, 1.0, amax)
    r = (x / safe[:, None]) ** 0.25
    q = jnp.clip(jnp.round(255.0 * r), 0, 255).astype(jnp.uint8)
    return q, amax


def _deq_unsigned(q: jax.Array, amax: jax.Array) -> jax.Array:
    r = q.astype(jnp.float32) / 255.0
    return (r * r) * (r * r) * amax[:, None]


def _blocked(x: jax.Array) -> jax.Array:
    flat = x.reshape(-1).astype(jnp.float32)
    pad = _pad_len(flat.shape[0])
    if pad:
        flat = jnp.concatenate([flat, jnp.zeros((pad,), jnp.float32)])
    return flat.reshape(-1, _BLOCK)


def _unblocked(x2: jax.Array, shape) -> jax.Array:
    n = 1
    for s in shape:
        n *= s
    return x2.reshape(-1)[:n].reshape(shape)


def _deq(q: jax.Array, absmax: jax.Array) -> jax.Array:
    r = q.astype(jnp.float32) / 127.0
    return (r * r * r) * absmax[:, None]


class ScaleByAdam8bitState(NamedTuple):
    count: jax.Array  # int32 step counter
    m_q: optax.Params  # int8 (nb, B) per leaf
    m_scale: optax.Params  # f32 (nb,) per leaf
    v_q: optax.Params  # uint8 (nb, B) per leaf
    v_scale: optax.Params  # f32 (nb,) per leaf


def scale_by_adam8bit(
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    min_8bit_size: int = 4096,
) -> optax.GradientTransformation:
    """Drop-in for `optax.scale_by_adam` with 8-bit blockwise moment state."""

    def init_fn(params):
        def init_leaf(p):
            if p.size < min_8bit_size:  # fp32 moments for small leaves
                # Distinct arrays: aliased leaves break donation in jitted
                # optimizer steps ("attempt to donate the same buffer twice").
                return (
                    jnp.zeros(p.shape, jnp.float32),
                    jnp.zeros((0,), jnp.float32),
                    jnp.zeros(p.shape, jnp.float32),
                    jnp.zeros((0,), jnp.float32),
                )
            nb = (p.size + _pad_len(p.size)) // _BLOCK
            return (
                jnp.zeros((nb, _BLOCK), jnp.int8),
                jnp.zeros((nb,), jnp.float32),
                jnp.zeros((nb, _BLOCK), jnp.uint8),
                jnp.zeros((nb,), jnp.float32),
            )

        leaves, treedef = jax.tree_util.tree_flatten(params)
        per_leaf = [init_leaf(p) for p in leaves]
        unflatten = lambda i: jax.tree_util.tree_unflatten(
            treedef, [t[i] for t in per_leaf]
        )
        return ScaleByAdam8bitState(
            count=jnp.zeros((), jnp.int32),
            m_q=unflatten(0),
            m_scale=unflatten(1),
            v_q=unflatten(2),
            v_scale=unflatten(3),
        )

    def update_fn(updates, state, params=None):
        del params
        count = state.count + 1
        c = count.astype(jnp.float32)
        bc1 = 1.0 - b1**c
        bc2 = 1.0 - b2**c
        # Exact Adam's per-step update is bounded by max(1, (1-b1)/sqrt(1-b2))
        # (Kingma & Ba §2.1).  Requantization noise can violate it — e.g. v
        # underflowing its uint8 floor while m lands on its lowest nonzero
        # level gives m/eps-style spikes (measured 28x) — so the quantized
        # path clips to the bound exact Adam already satisfies.
        u_bound = max(1.0, (1.0 - b1) / (1.0 - b2) ** 0.5)

        def upd_leaf(g, mq, ms, vq, vs):
            if g.size < min_8bit_size:  # fp32 path for small leaves
                g32 = g.astype(jnp.float32)
                m = b1 * mq + (1.0 - b1) * g32
                v = b2 * vq + (1.0 - b2) * g32 * g32
                u = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
                return u.astype(g.dtype), m, ms, v, vs
            g2 = _blocked(g)
            m = b1 * _deq(mq, ms) + (1.0 - b1) * g2
            v = b2 * _deq_unsigned(vq, vs) + (1.0 - b2) * g2 * g2
            u2 = (m / bc1) / (jnp.sqrt(v / bc2) + eps)
            u2 = jnp.clip(u2, -u_bound, u_bound)
            mq2, ms2 = _quant_signed(m)
            vq2, vs2 = _quant_unsigned(v)
            return _unblocked(u2, g.shape).astype(g.dtype), mq2, ms2, vq2, vs2

        g_leaves, treedef = jax.tree_util.tree_flatten(updates)
        results = [
            upd_leaf(g, mq, ms, vq, vs)
            for g, mq, ms, vq, vs in zip(
                g_leaves,
                treedef.flatten_up_to(state.m_q),
                treedef.flatten_up_to(state.m_scale),
                treedef.flatten_up_to(state.v_q),
                treedef.flatten_up_to(state.v_scale),
            )
        ]
        unflatten = lambda i: jax.tree_util.tree_unflatten(
            treedef, [r[i] for r in results]
        )
        new_state = ScaleByAdam8bitState(
            count=count,
            m_q=unflatten(1),
            m_scale=unflatten(2),
            v_q=unflatten(3),
            v_scale=unflatten(4),
        )
        return unflatten(0), new_state

    return optax.GradientTransformation(init_fn, update_fn)
