"""Explicit shard_map data-parallel train step (psum collectives).

The default trainer relies on GSPMD: a jit over a mesh with sharded batch
inputs, XLA inserting the cross-chip reductions (train/trainer.py). This
module is the *explicit* formulation — ``shard_map`` over the ``data`` axis
with hand-placed ``psum``s — for when collective placement must be controlled
(or audited) rather than inferred:

- per-shard forward/backward, ``psum``-averaged gradients (classic DP);
- per-shard loss details ``pmean``-ed so logs match the global batch;
- EMA-VQ cluster statistics and dead-code restart candidates made
  shard-consistent inside the quantizer (ops/vq.py ``axis_name`` path).

``make_shard_map_step(trainer)`` returns a drop-in replacement for the
trainer's compiled step; numerically it matches the GSPMD step on the same
batch (see tests/test_parallel.py).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..train.trainer import TrainState

AXIS = "data"


def make_shard_map_step(trainer):
    """Build an explicit shard_map step bound to ``trainer``'s model/mesh.

    Only flat EMA models carry cross-shard state here; the step works for any
    registered model whose loss is a frame-mean (losses are pmean-ed, which
    equals the global frame_mean for equal shard sizes).
    """
    from jax import shard_map

    from ..models import build_model

    # an axis-aware clone of the trainer's model: the EMA quantizer psums its
    # statistics over the data axis (only valid inside the shard_map body;
    # the trainer's own model stays axis-free for init/eval)
    model = build_model({**dict(trainer.config), "dp_axis": AXIS})
    tx = trainer.tx
    mesh = trainer.mesh

    def per_shard(state: TrainState, feats, spks, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if trainer._renorm is not None:
            # mirror the GSPMD step's reference-dynamics codebook renorm
            # (normalized plain-VQ configs; trainer.py _train_step) — grads
            # are taken at the renormed point, identical on every shard
            state = state.replace(params=trainer._renorm(state.params))
        mutable = list(state.ema.keys())

        def loss_fn(params):
            variables = {"params": params, **state.ema}
            if mutable:
                (xhat, loss, detail), mut = model.apply(
                    variables, feats, spks, train=True, mutable=mutable,
                    rngs={"vq": step_rng})
            else:
                xhat, loss, detail = model.apply(
                    variables, feats, spks, train=True,
                    rngs={"vq": step_rng})
                mut = {}
            return loss, (mut, detail)

        grads, (mut, detail) = jax.grad(loss_fn, has_aux=True)(state.params)
        grads = jax.lax.pmean(grads, AXIS)
        detail = {k: jax.lax.pmean(v, AXIS) for k, v in detail.items()}
        updates, opt_state = tx.update(grads, state.opt_state, state.params)
        import optax
        params = optax.apply_updates(state.params, updates)
        if trainer.skip_nonfinite:
            # same production guard as the GSPMD step: grads are pmean-ed,
            # so 'ok' is shard-consistent by construction
            grad_sq = sum(jnp.sum(jnp.square(g))
                          for g in jax.tree_util.tree_leaves(grads))
            ok = jnp.isfinite(grad_sq)
            pick = lambda new, old: jax.tree_util.tree_map(
                lambda a, b: jnp.where(ok, a, b), new, old)
            params = pick(params, state.params)
            opt_state = pick(opt_state, state.opt_state)
            mut = pick(mut, {k: state.ema[k] for k in mut}) if mut else mut
            detail["skipped_nonfinite"] = (1.0 - ok.astype(jnp.float32))
        new_state = TrainState(step=state.step + 1, params=params,
                               ema={**state.ema, **mut},
                               opt_state=opt_state)
        return new_state, detail

    state_spec = P()  # replicated
    step = shard_map(
        per_shard, mesh=mesh,
        in_specs=(state_spec, P(AXIS), P(AXIS), state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(step, donate_argnums=(0,))


def enable_explicit_dp(config):
    """Config transform: route the model's EMA quantizer through the
    explicit-collectives path (sets the ``dp_axis`` arch key consumed by the
    model when built for a shard_map step)."""
    out = dict(config)
    out["dp_axis"] = AXIS
    return out
