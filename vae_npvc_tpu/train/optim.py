"""Optimizer/schedule builders (optax).

Reference semantics (vae_npvc/trainer/basic.py:32-48): Adam or RAdam with betas
(0.5, 0.999), weight_decay 0, optional StepLR (lr × gamma every step_size
steps), and global-norm gradient clipping applied before the update
(basic.py:62-67). RAdam is optax's rectified Adam (the reference carries its own
from-scratch port of the same algorithm, trainer/radam.py:5-78).
"""

from __future__ import annotations

import optax


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


def build_optimizer(config):
    """Gradient transform: clip-by-global-norm → (R)Adam(0.5, 0.999)."""
    schedule = build_schedule(config)
    optim_type = config.get("optim_type", "Adam")
    max_grad_norm = config.get("max_grad_norm", 5)

    if optim_type.upper() == "RADAM":
        opt = optax.radam(schedule, b1=0.5, b2=0.999)
    else:
        opt = optax.adam(schedule, b1=0.5, b2=0.999)

    chain = []
    if max_grad_norm and max_grad_norm > 0:
        chain.append(optax.clip_by_global_norm(max_grad_norm))
    chain.append(opt)
    return optax.chain(*chain)
