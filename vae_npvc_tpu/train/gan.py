"""WGAN-GP adversarial trainer (working version of the reference spec).

The reference trainer (reference: vae_npvc/trainer/wgan_gp.py — Trainer) is a
legacy capability spec: missing imports, dead module paths (wgan_gp.py:44-48).
This is the functional TPU realization with the same 3-phase schedule
(wgan_gp.py:96-162):

- phase 1 (iteration ≤ ``pre_iter``): plain VAE generator updates;
- phase 2: critic update every ``discriminator_param.per_iteration`` steps:
  ``-D(x) + D(G(x)) + gp_weight · GP`` with the standard interpolated-sample
  gradient penalty (reference losses.py:7-28) — the double-backprop is a plain
  nested ``jax.grad``;
- phase 3: generator update every ``generator_param.per_iteration`` steps:
  VAE loss + ``gamma · (−mean D(G(x)))`` (the reference forgets the mean on
  the adv term, wgan_gp.py:150 — fixed).

Dual optimizers/schedules with the reference's default hyperparameters;
checkpoints carry {model, discriminator, optimizer_G, optimizer_D, ema,
iteration} (wgan_gp.py:172-183). Registered as
``vae_npvc.trainer.wgan_gp:Trainer``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import serialization, struct

from ..models.discriminator import Discriminator
from .optim import build_optimizer
from .trainer import Trainer, TrainState

GEN_DEFAULTS = {"per_iteration": 1, "optim_type": "RAdam",
                "learning_rate": 1e-4, "max_grad_norm": 10,
                "lr_scheduler": {"step_size": 100000, "gamma": 0.5}}
DISC_DEFAULTS = {"per_iteration": 1, "optim_type": "RAdam",
                 "learning_rate": 5e-5, "max_grad_norm": 1,
                 "lr_scheduler": {"step_size": 100000, "gamma": 0.5}}


def _sub_optimizer(param):
    cfg = {"optim_type": param.get("optim_type", "RAdam"),
           "learning_rate": param.get("learning_rate", 1e-4),
           "max_grad_norm": param.get("max_grad_norm", 0),
           "lr_scheduler": "StepLR" if param.get("lr_scheduler") else None,
           "lr_param": param.get("lr_scheduler", {})}
    if "betas" in param:        # honor generator_param/discriminator_param
        cfg["betas"] = tuple(param["betas"])
    return build_optimizer(cfg)


@struct.dataclass
class GanState:
    step: jnp.ndarray
    params: object          # generator params
    ema: object
    opt_state: object       # generator opt state
    d_params: object
    d_opt_state: object


class GanTrainer(Trainer):
    """3-phase WGAN-GP trainer; same external API as the basic Trainer."""

    # the critic/generator alternation is host-side per-iteration control
    # flow with phase-dependent detail keys — the base class's K-step scan
    # dispatch does not apply (bin/train.py falls back to sequential steps)
    supports_steps_per_call = False

    def __init__(self, config, mesh=None, seed=None):
        super().__init__(config, mesh=mesh, seed=seed)
        if self.grad_accum > 1:
            # the 3-phase adversarial schedule overrides train_step and
            # never routes through Trainer._step — fail loudly instead of
            # silently training full batches (same policy as
            # supports_steps_per_call above)
            raise ValueError("grad_accum is not supported by the GAN "
                             "trainer (3-phase step)")
        self.gamma = config.get("gamma", 1.0)
        self.gp_weight = config.get("gp_weight", 1.0)
        self.pre_iter = config.get("pre_iter", 1000)
        self.gen_param = {**GEN_DEFAULTS,
                          **config.get("generator_param", {})}
        self.disc_param = {**DISC_DEFAULTS,
                           **config.get("discriminator_param", {})}
        self.tx = _sub_optimizer(self.gen_param)
        self.tx_d = _sub_optimizer(self.disc_param)
        self.discriminator = Discriminator(config.get("discriminator", {}))
        self._host_iter = 0

    # ------------------------------------------------------------------ init
    def init_state(self, example_batch):
        feats, spks = example_batch
        self._batch_spec = tuple(
            (tuple(np.asarray(a).shape[1:]), np.asarray(a).dtype)
            for a in example_batch)
        x = jnp.zeros((1,) + tuple(feats.shape[1:]), jnp.float32)
        y = jnp.zeros((1,), jnp.int32)
        k1, k2, k3 = jax.random.split(self.base_rng, 3)
        variables = dict(self.model.init({"params": k1, "vq": k2}, x, y,
                                         train=True))
        params = variables.pop("params")
        d_params = self.discriminator.init(k3, x)["params"]
        state = GanState(step=jnp.zeros((), jnp.int32), params=params,
                         ema=variables, opt_state=self.tx.init(params),
                         d_params=d_params,
                         d_opt_state=self.tx_d.init(d_params))
        self.state = jax.device_put(state, self.repl)
        self._host_iter = 0
        return self.state

    # ----------------------------------------------------------------- steps
    def _g_forward(self, params, ema, feats, spks, rng):
        variables = {"params": params, **ema}
        mutable = list(ema.keys())
        if mutable:
            (xhat, loss, detail), mut = self.model.apply(
                variables, feats, spks, train=True, mutable=mutable,
                rngs={"vq": rng})
        else:
            xhat, loss, detail = self.model.apply(
                variables, feats, spks, train=True, rngs={"vq": rng})
            mut = {}
        return xhat, loss, detail, mut

    def _guard(self, grads, detail, new, old):
        """skip_nonfinite_updates for the GAN phases (same semantics as the
        base trainer's guard, trainer.py _train_step)."""
        if not self.skip_nonfinite:
            return new
        grad_sq = sum(jnp.sum(jnp.square(g))
                      for g in jax.tree_util.tree_leaves(grads))
        ok = jnp.isfinite(grad_sq)
        detail["skipped_nonfinite"] = (1.0 - ok.astype(jnp.float32))
        return tuple(jax.tree_util.tree_map(
            lambda a, b: jnp.where(ok, a, b), n, o)
            for n, o in zip(new, old))

    def _vae_step(self, state: GanState, feats, spks, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if self._renorm is not None:
            # reference training dynamics: normalized plain-VQ codebooks are
            # renormed at the top of every generator step (trainer.py)
            state = state.replace(params=self._renorm(state.params))

        def loss_fn(params):
            xhat, loss, detail, mut = self._g_forward(params, state.ema,
                                                      feats, spks, step_rng)
            return loss, (mut, detail)

        grads, (mut, detail) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        detail = dict(detail)
        params, opt_state, mut = self._guard(
            grads, detail, (params, opt_state, mut),
            (state.params, state.opt_state,
             {k: state.ema[k] for k in mut}))
        return state.replace(step=state.step + 1, params=params,
                             ema={**state.ema, **mut},
                             opt_state=opt_state), detail

    def _gp(self, d_params, x_real, x_fake, rng):
        alpha = jax.random.uniform(rng, (x_real.shape[0],) +
                                   (1,) * (x_real.ndim - 1))
        inter = alpha * x_real + (1.0 - alpha) * x_fake

        def critic_sum(x):
            return jnp.sum(self.discriminator.apply({"params": d_params}, x))

        grads = jax.grad(critic_sum)(inter)
        gnorm = jnp.sqrt(jnp.sum(grads.reshape(grads.shape[0], -1) ** 2,
                                 axis=-1) + 1e-12)
        return jnp.mean((gnorm - 1.0) ** 2)

    def _disc_step(self, state: GanState, feats, spks, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        gp_rng = jax.random.fold_in(step_rng, 1)
        xhat, _, _, _ = self._g_forward(state.params, state.ema, feats, spks,
                                        step_rng)
        x_fake = jax.lax.stop_gradient(xhat)

        def loss_fn(d_params):
            d = lambda x: self.discriminator.apply({"params": d_params}, x)
            disc_loss = -jnp.mean(d(feats)) + jnp.mean(d(x_fake))
            gp = self._gp(d_params, feats, x_fake, gp_rng)
            return disc_loss + self.gp_weight * gp, (disc_loss, gp)

        grads, (disc_loss, gp) = jax.grad(loss_fn, has_aux=True)(
            state.d_params)
        updates, d_opt_state = self.tx_d.update(grads, state.d_opt_state,
                                                state.d_params)
        d_params = optax.apply_updates(state.d_params, updates)
        detail = {"DISC loss": disc_loss, "gradient_penalty": gp}
        return state.replace(d_params=d_params,
                             d_opt_state=d_opt_state), detail

    def _gen_step(self, state: GanState, feats, spks, rng):
        step_rng = jax.random.fold_in(rng, state.step)
        if self._renorm is not None:
            state = state.replace(params=self._renorm(state.params))

        def loss_fn(params):
            xhat, loss, detail, mut = self._g_forward(params, state.ema,
                                                      feats, spks, step_rng)
            adv = -jnp.mean(self.discriminator.apply(
                {"params": state.d_params}, xhat))
            total = loss + self.gamma * adv
            detail = dict(detail)
            detail["Total"] = total
            detail["ADV loss"] = adv
            return total, (mut, detail)

        grads, (mut, detail) = jax.grad(loss_fn, has_aux=True)(state.params)
        updates, opt_state = self.tx.update(grads, state.opt_state,
                                            state.params)
        params = optax.apply_updates(state.params, updates)
        detail = dict(detail)
        params, opt_state, mut = self._guard(
            grads, detail, (params, opt_state, mut),
            (state.params, state.opt_state,
             {k: state.ema[k] for k in mut}))
        return state.replace(step=state.step + 1, params=params,
                             ema={**state.ema, **mut},
                             opt_state=opt_state), detail

    def train_step(self, batch):
        feats, spks = batch
        if not isinstance(feats, jax.Array):
            feats, spks = self.shard_batch(batch)
        it = self._host_iter
        # fold the host iteration in here: state.step only advances on
        # generator updates, so critic-only iterations (gen per_iteration > 1)
        # would otherwise reuse identical GP-interpolation alphas
        it_rng = jax.random.fold_in(self.base_rng, it)
        detail = {}
        if it <= self.pre_iter:
            step = self._get_compiled("vae", self._vae_step, donate=(0,))
            self.state, detail = step(self.state, feats, spks, it_rng)
        else:
            if it % self.disc_param["per_iteration"] == 0:
                dstep = self._get_compiled("disc", self._disc_step)
                self.state, d_detail = dstep(self.state, feats, spks, it_rng)
                detail.update(d_detail)
            if it % self.gen_param["per_iteration"] == 0:
                gstep = self._get_compiled("gen", self._gen_step, donate=(0,))
                self.state, g_detail = gstep(self.state, feats, spks, it_rng)
                detail.update(g_detail)
        self._host_iter += 1
        return detail

    def _valid_step(self, state, batch):
        variables = {"params": state.params, **state.ema}
        xhat, loss, detail = self.model.apply(variables, *batch, train=False)
        return detail

    @property
    def iteration(self):
        return self._host_iter

    # ------------------------------------------------------------- checkpoint
    def save_checkpoint(self, path):
        from ..utils.migrate import WN_AXIS_FORMAT
        state = jax.device_get(self.state)
        payload = {
            "wn_axis_format": WN_AXIS_FORMAT,
            "model": serialization.to_state_dict(state.params),
            "discriminator": serialization.to_state_dict(state.d_params),
            "ema": serialization.to_state_dict(state.ema),
            "optimizer_G": serialization.to_state_dict(state.opt_state),
            "optimizer_D": serialization.to_state_dict(state.d_opt_state),
            "iteration": int(state.step),
            # the disc/gen phase schedule runs on the host counter, which
            # diverges from state.step once critic-only iterations happen —
            # persist it so resume does not shift the schedule
            "host_iteration": self._host_iter,
        }
        with open(path, "wb") as f:
            f.write(serialization.msgpack_serialize(payload))

    def load_checkpoint(self, path, example_batch=None):
        if self.state is None:
            if example_batch is None:
                raise ValueError("call init_state first or pass example_batch")
            self.init_state(example_batch)
        with open(path, "rb") as f:
            payload = serialization.msgpack_restore(f.read())
        state = jax.device_get(self.state)
        from ..utils.migrate import maybe_migrate_model
        model_tree, wn_migrated = maybe_migrate_model(
            payload, serialization.to_state_dict(state.params))
        params = serialization.from_state_dict(state.params, model_tree)
        if wn_migrated:
            import logging
            logging.getLogger("vae_npvc_tpu.train").warning(
                "weight-norm axis migration applied: generator optimizer "
                "moments re-initialized (round-2-format checkpoint)")
        # basic-Trainer or torch-converted payloads carry no GAN pieces:
        # fall back to the freshly-initialized discriminator/optimizers
        # (fine-tune-with-adversary from a plain-VAE pretrain checkpoint)
        new = GanState(
            step=jnp.asarray(payload["iteration"], jnp.int32),
            params=params,
            ema=serialization.from_state_dict(state.ema,
                                              payload.get("ema", {})),
            opt_state=(self.tx.init(params)
                       if wn_migrated or not payload.get("optimizer_G") else
                       serialization.from_state_dict(state.opt_state,
                                                     payload["optimizer_G"])),
            d_params=(serialization.from_state_dict(state.d_params,
                                                    payload["discriminator"])
                      if payload.get("discriminator") else state.d_params),
            d_opt_state=(serialization.from_state_dict(
                state.d_opt_state, payload["optimizer_D"])
                if payload.get("optimizer_D") else state.d_opt_state),
        )
        self.state = jax.device_put(new, self.repl)
        self._host_iter = int(payload.get("host_iteration",
                                          payload["iteration"]))
        return self._host_iter
