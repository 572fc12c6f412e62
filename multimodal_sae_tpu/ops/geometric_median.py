"""Geometric median via IRLS (Weiszfeld), used to initialize the SAE decoder
bias (reference sae_auto_interp/sae/utils.py:36-62, applied at trainer step 0,
reference train/sae/sae/trainer.py:325-332)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def geometric_median(points: jax.Array, max_iter: int = 100, tol: float = 1e-5):
    """Compute the geometric median of `points` (N, d).

    Matches the reference algorithm exactly: start at the mean, iterate
    inverse-distance reweighted means, stop early when the step norm drops
    below `tol` (expressed as a `lax.while_loop` so it stays jittable).
    """
    points = points.astype(jnp.float32)
    guess = points.mean(axis=0)

    def cond(state):
        i, guess, prev, done = state
        return jnp.logical_and(i < max_iter, jnp.logical_not(done))

    def body(state):
        i, guess, prev, _ = state
        prev = guess
        # A point coinciding with the guess (e.g. duplicated rows) gives
        # norm 0 -> inf weight -> NaN; clamp to a tiny distance instead
        # (Weiszfeld's standard epsilon regularization).
        norms = jnp.maximum(jnp.linalg.norm(points - guess, axis=1), 1e-12)
        weights = 1.0 / norms
        weights = weights / weights.sum()
        guess = (weights[:, None] * points).sum(axis=0)
        done = jnp.linalg.norm(guess - prev) < tol
        return i + 1, guess, prev, done

    _, guess, _, _ = jax.lax.while_loop(
        cond, body, (0, guess, jnp.zeros_like(guess), jnp.array(False))
    )
    return guess
