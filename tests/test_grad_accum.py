"""Gradient accumulation (``grad_accum: k``): semantics and interplay.

Beyond-reference trainer feature (the reference trains full batches on one
GPU, reference vae_npvc/trainer/basic.py): one optimizer step from the mean
of k microbatch gradients via ``lax.scan``, peak activation memory ~1/k.
Pinned here:

- no-EMA families: accumulated step == full-batch step (gradient means are
  the full-batch gradient for the mean-reduced losses, up to float
  reassociation);
- EMA families: codebook statistics CHAIN through microbatches (== k
  sequential small-batch EMA updates) while params take one update — the
  documented semantics, matched against a hand-rolled oracle;
- indivisible batch raises; steps_per_call scan dispatch composes exactly.
"""

import jax
import numpy as np
import pytest

from tests.toy_config import toy_config
from vae_npvc_tpu.train.trainer import Trainer


def _batch(B=4, T=32, D=10, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(B, T, D)).astype(np.float32),
            (np.arange(B) % 3).astype(np.int32))


def _get(tree):
    return jax.device_get(tree)


def _allclose_tree(a, b, **kw):
    la = jax.tree_util.tree_leaves(a)
    lb = jax.tree_util.tree_leaves(b)
    assert len(la) == len(lb)
    for x, y in zip(la, lb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), **kw)


def test_no_ema_accum_equals_full_batch():
    """Plain-VQ (no EMA state): grad_accum=2 step == full-batch step."""
    cfg = toy_config()
    cfg["use_ema"] = False
    batch = _batch()

    tr_full = Trainer(cfg)
    tr_full.init_state(batch)
    d_full = tr_full.train_step(batch)

    tr_acc = Trainer(dict(cfg, grad_accum=2))
    tr_acc.init_state(batch)
    d_acc = tr_acc.train_step(batch)

    _allclose_tree(_get(tr_acc.state.params), _get(tr_full.state.params),
                   rtol=1e-5, atol=1e-6)
    # microbatch-mean loss details == full-batch details (mean reductions)
    assert float(np.asarray(d_acc["Total"])) == pytest.approx(
        float(np.asarray(d_full["Total"])), rel=1e-5)
    assert float(np.asarray(d_acc["grad_norm"])) == pytest.approx(
        float(np.asarray(d_full["grad_norm"])), rel=1e-4)


def test_ema_chaining_matches_oracle():
    """EMA path: grads averaged at chained EMA states, one optimizer step,
    final EMA == sequential per-microbatch mutation — vs a hand oracle."""
    import jax.numpy as jnp

    cfg = dict(toy_config(), grad_accum=2)
    batch = _batch(B=4)
    tr = Trainer(cfg)
    tr.init_state(batch)
    state0 = _get(tr.state)

    # --- hand oracle (no scan, plain python loop over microbatches)
    k = 2
    micro = [tuple(np.asarray(a)[i * 2:(i + 1) * 2] for a in batch)
             for i in range(k)]
    step_rng = jax.random.fold_in(tr.base_rng, 0)
    mutable = list(state0.ema.keys())

    def loss_fn(params, ema, mb, mrng):
        (xhat, loss, detail), mut = tr.model.apply(
            {"params": params, **ema}, *(jnp.asarray(x) for x in mb),
            train=True, mutable=mutable, rngs={"vq": mrng})
        return loss, (mut, detail)

    ema = state0.ema
    gsum = jax.tree_util.tree_map(jnp.zeros_like, state0.params)
    for i in range(k):
        grads, (mut, _) = jax.grad(loss_fn, has_aux=True)(
            state0.params, ema, micro[i], jax.random.fold_in(step_rng, i))
        ema = {**ema, **mut}
        gsum = jax.tree_util.tree_map(lambda a, g: a + g, gsum, grads)
    grads = jax.tree_util.tree_map(lambda g: g / k, gsum)
    updates, _ = tr.tx.update(grads, state0.opt_state, state0.params)
    want_params = jax.tree_util.tree_map(lambda p, u: p + u,
                                         state0.params, updates)

    tr.train_step(batch)
    _allclose_tree(_get(tr.state.params), _get(want_params),
                   rtol=1e-5, atol=1e-5)
    _allclose_tree(_get(tr.state.ema), _get(ema), rtol=1e-5, atol=1e-5)


def test_indivisible_batch_raises():
    tr = Trainer(dict(toy_config(), grad_accum=2))
    batch = _batch(B=3)
    tr.init_state(batch)
    with pytest.raises(ValueError, match="grad_accum"):
        tr.train_step(batch)


def test_accum_composes_with_steps_per_call():
    """train_steps (K-step scan dispatch) over the accumulating body ==
    K sequential accumulating train_step calls, exactly."""
    cfg = dict(toy_config(), grad_accum=2)
    b1, b2 = _batch(seed=1), _batch(seed=2)

    tr_seq = Trainer(cfg)
    tr_seq.init_state(b1)
    tr_seq.train_step(b1)
    tr_seq.train_step(b2)

    tr_scan = Trainer(cfg)
    tr_scan.init_state(b1)
    tr_scan.train_steps([b1, b2])

    _allclose_tree(_get(tr_scan.state.params), _get(tr_seq.state.params),
                   rtol=0, atol=0)
    _allclose_tree(_get(tr_scan.state.ema), _get(tr_seq.state.ema),
                   rtol=0, atol=0)


def test_accum_sharded_matches_single_device():
    """8-device data mesh + grad_accum: same numerics as one device."""
    from jax.sharding import Mesh

    cfg = dict(toy_config(), grad_accum=2)
    batch = _batch(B=16)

    tr_one = Trainer(cfg, mesh=Mesh(np.array(jax.devices()[:1]), ("data",)))
    tr_one.init_state(batch)
    tr_one.train_step(batch)

    tr_all = Trainer(cfg, mesh=Mesh(np.array(jax.devices()), ("data",)))
    tr_all.init_state(batch)
    tr_all.train_step(batch)

    _allclose_tree(_get(tr_all.state.params), _get(tr_one.state.params),
                   rtol=1e-5, atol=1e-6)


def test_gan_trainer_rejects_grad_accum():
    from vae_npvc_tpu.train.gan import GanTrainer

    cfg = dict(toy_config(), grad_accum=2, pre_iter=1)
    with pytest.raises(ValueError, match="GAN"):
        GanTrainer(cfg)
