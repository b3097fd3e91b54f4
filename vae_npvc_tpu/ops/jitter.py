"""Vectorized latent jitter (Chorowski et al., 2019).

The reference implements jitter as a per-frame Python loop that draws ONE
replacement decision per timestep shared across the whole batch
(vae_npvc/model/layers_vq.py:353-379) — a hot-loop bug flagged in SURVEY.md §2.1.

This version is a single gather: per-(batch, time) Bernoulli(p) replacement with a
uniform ±1 neighbor (ends use their only neighbor), which is the regularizer the
paper describes and is O(1) XLA ops instead of O(T) Python. Pass
``per_batch=False`` to draw per-timestep decisions shared across the batch, i.e.
the reference's exact sampling granularity.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def jitter(rng, x, probability, per_batch=True):
    """Randomly replace timesteps of ``x`` (B, T, D) with a temporal neighbor."""
    if probability == 0.0:
        return x
    B, T, D = x.shape
    shape = (B, T) if per_batch else (1, T)
    r_replace, r_dir = jax.random.split(rng)
    replace = jax.random.bernoulli(r_replace, probability, shape)
    direction = jnp.where(jax.random.bernoulli(r_dir, 0.5, shape), 1, -1)
    t = jnp.arange(T)[None, :]
    # ends can only take their single neighbor
    direction = jnp.where(t == 0, 1, jnp.where(t == T - 1, -1, direction))
    src = jnp.where(replace, t + direction, t)
    src = jnp.broadcast_to(src, (B, T))
    return jnp.take_along_axis(x, src[:, :, None], axis=1)
