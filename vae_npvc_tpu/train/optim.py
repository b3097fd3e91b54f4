"""Optimizer/schedule builders (optax).

Reference semantics (vae_npvc/trainer/basic.py:32-48): Adam or RAdam with betas
(0.5, 0.999), weight_decay 0, optional StepLR (lr × gamma every step_size
steps), and global-norm gradient clipping applied before the update
(basic.py:62-67). RAdam is optax's rectified Adam (the reference carries its own
from-scratch port of the same algorithm, trainer/radam.py:5-78).

The reference also ships two optimizer variants no shipped config uses
(inventory parity):

- ``PlainRAdam`` (radam.py:80-142) — RAdam without the 10-slot step-size
  cache; mathematically the same rectified update, so it maps to
  ``optax.radam`` too (the cache only quantizes the rectification term's
  recomputation, not its value);
- ``AdamW`` with linear warmup (radam.py:145-207) — decoupled weight decay
  where both the step size and the decay are scaled by
  ``1e-8 + step·lr/warmup`` until ``warmup`` steps, then ``lr``. Config keys:
  ``warmup``, ``weight_decay`` (top level or under ``optim_param``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import optax


def clip_by_global_norm_torch(max_norm):
    """Global-norm clip with torch semantics.

    torch.nn.utils.clip_grad_norm_ (the reference's clip, basic.py:62-67)
    scales by ``min(1, max_norm / (total_norm + 1e-6))`` — the 1e-6 in the
    denominator is the only difference from optax.clip_by_global_norm, kept
    so the lockstep training-dynamics study (tools/lockstep_parity.py)
    matches the reference exactly when clipping is active.
    """
    def init_fn(params):
        del params
        return optax.EmptyState()

    def update_fn(updates, state, params=None):
        del params
        norm = optax.global_norm(updates)
        scale = jnp.minimum(1.0, max_norm / (norm + 1e-6))
        return jax.tree_util.tree_map(lambda g: g * scale, updates), state

    return optax.GradientTransformation(init_fn, update_fn)


def build_schedule(config):
    """Learning-rate schedule from the reference config keys."""
    lr = config.get("learning_rate", 1e-3)
    if config.get("lr_scheduler") is None:
        return lr
    # StepLR: lr * gamma^floor(step / step_size)
    p = config.get("lr_param", {"step_size": 100000, "gamma": 0.5})
    return optax.exponential_decay(
        init_value=lr,
        transition_steps=p.get("step_size", 100000),
        decay_rate=p.get("gamma", 0.5),
        staircase=True,
    )


def _warmup_schedule(lr, warmup):
    """Reference AdamW warmup: 1e-8 + step·lr/warmup, then lr
    (radam.py:195-198)."""
    if not warmup:
        return lr
    return optax.join_schedules(
        [optax.linear_schedule(1e-8, lr, warmup), lambda _: lr], [warmup])


def build_optimizer(config):
    """Gradient transform: clip-by-global-norm → the configured optimizer."""
    schedule = build_schedule(config)
    optim_type = config.get("optim_type", "Adam")
    max_grad_norm = config.get("max_grad_norm", 5)
    extra = dict(config.get("optim_param", {}))
    warmup = config.get("warmup", extra.get("warmup", 0))
    weight_decay = config.get("weight_decay", extra.get("weight_decay", 0.0))

    # the reference VC trainer uses betas (0.5, 0.999) (trainer/basic.py:32-41);
    # other consumers (e.g. the PWG vocoder trainer, published betas
    # (0.9, 0.999)) override via the `betas` key
    b1, b2 = config.get("betas", extra.get("betas", (0.5, 0.999)))
    kind = optim_type.upper()
    if kind in ("RADAM", "PLAINRADAM"):
        # PlainRAdam = RAdam minus the step-size cache; same update values
        opt = optax.radam(schedule, b1=b1, b2=b2)
    elif kind == "ADAMW":
        # reference warmup-AdamW: betas default (0.9, 0.999) there
        # (radam.py:147); warmup scales step size AND decoupled decay.
        # An explicit `betas` key is honored here too (it used to be a
        # silently dead knob on this branch).
        wb1, wb2 = config.get("betas", extra.get("betas", (0.9, 0.999)))
        lr = config.get("learning_rate", 1e-3)
        sched = (_warmup_schedule(lr, warmup)
                 if config.get("lr_scheduler") is None else schedule)
        opt = optax.adamw(sched, b1=wb1, b2=wb2,
                          weight_decay=weight_decay)
    else:
        opt = optax.adam(schedule, b1=b1, b2=b2)

    chain = []
    if max_grad_norm and max_grad_norm > 0:
        chain.append(clip_by_global_norm_torch(max_grad_norm))
    chain.append(opt)
    return optax.chain(*chain)
