"""Shape/jit/gradient tests for the flat VQ-VAE model (tiny configs for CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.smoke  # fast tier: pytest -m smoke

from vae_npvc_tpu.models import build_model

TINY = {
    "model_type": "vae_npvc.model.vqvae",
    "y_dim": 16, "y_num": 4, "z_dim": 8, "z_num": 16,
    "use_ema": True, "beta": 0.01, "mu": 0.9, "jitter_p": 0.0,
    "encoder": {
        "in_channels": [12], "out_channels": [16], "kernel_size": 3,
        "downsample_scales": [1], "z_channels": 8, "dilation": False,
        "stack_kernel_size": 3, "stack_layers": 1, "stacks": [2],
        "use_weight_norm": True,
    },
    "decoder": {
        "in_channels": [8], "out_channels": [16], "cond_channels": 16,
        "skip_channels": 16, "final_channels": 12, "kernel_size": 3,
        "upsample_scales": [1], "dilation": False, "stack_kernel_size": 3,
        "stacks": [2], "use_weight_norm": True,
    },
}


def make_variables(model, B=2, T=16, D=12):
    x = jnp.zeros((B, T, D))
    y = jnp.zeros((B,), jnp.int32)
    return model.init({"params": jax.random.PRNGKey(0),
                       "vq": jax.random.PRNGKey(1)}, x, y, train=True)


@pytest.fixture(scope="module")
def ema_model():
    model = build_model(TINY)
    return model, make_variables(model)


class TestFlatVqvaeEma:
    def test_forward_shapes_and_losses(self, ema_model):
        model, variables = ema_model
        B, T, D = 2, 16, 12
        x = jnp.array(np.random.default_rng(0).normal(size=(B, T, D)),
                      jnp.float32)
        y = jnp.array([0, 3], jnp.int32)
        (xhat, loss, detail), mut = model.apply(
            variables, x, y, train=True, mutable=["ema"],
            rngs={"vq": jax.random.PRNGKey(2)})
        assert xhat.shape == (B, T, D)
        assert np.isfinite(float(loss))
        for k in ("Total", "VQ loss", "X like", "entropy", "used_curr",
                  "usage", "diff_emb"):
            assert k in detail, k
        # EMA init happened on first batch
        assert bool(mut["ema"]["quantizer"].initted)

    def test_eval_forward_no_mutation(self, ema_model):
        model, variables = ema_model
        x = jnp.zeros((1, 16, 12))
        y = jnp.zeros((1,), jnp.int32)
        xhat, loss, detail = model.apply(variables, x, y, train=False)
        assert xhat.shape == (1, 16, 12)

    def test_encode_decode_infer(self, ema_model):
        model, variables = ema_model
        x = jnp.zeros((2, 16, 12))
        y = jnp.zeros((2,), jnp.int32)
        ids = model.apply(variables, x, method="encode")
        assert ids.shape == (2, 16) and ids.dtype == jnp.int32
        out = model.apply(variables, ids, y, method="decode")
        assert out.shape == (2, 16, 12)
        out2 = model.apply(variables, x, y, method="infer")
        assert out2.shape == (2, 16, 12)

    def test_train_step_grads_flow(self, ema_model):
        model, variables = ema_model
        x = jnp.array(np.random.default_rng(1).normal(size=(2, 16, 12)),
                      jnp.float32)
        y = jnp.array([1, 2], jnp.int32)

        def loss_fn(params):
            (xhat, loss, detail), mut = model.apply(
                {"params": params, "ema": variables["ema"]}, x, y, train=True,
                mutable=["ema"], rngs={"vq": jax.random.PRNGKey(3)})
            return loss

        grads = jax.grad(loss_fn)(variables["params"])
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(np.all(np.isfinite(l)) for l in leaves)
        # encoder must receive gradient through the straight-through estimator
        enc_g = jax.tree_util.tree_leaves(grads["encoder"])
        assert any(float(jnp.abs(l).max()) > 0 for l in enc_g)


class TestFlatVqvaePlain:
    def test_plain_vq_forward(self):
        cfg = dict(TINY, use_ema=False, embed_norm=True)
        model = build_model(cfg)
        variables = make_variables(model)
        x = jnp.array(np.random.default_rng(2).normal(size=(2, 16, 12)),
                      jnp.float32)
        y = jnp.array([0, 1], jnp.int32)
        xhat, loss, detail = model.apply(
            variables, x, y, train=True, rngs={"vq": jax.random.PRNGKey(0)})
        assert xhat.shape == (2, 16, 12)
        assert np.isfinite(float(loss))
        assert "quantizer_embedding" in variables["params"]

    def test_downsample_upsample_lengths(self):
        cfg = dict(TINY, use_ema=False)
        cfg["encoder"] = dict(TINY["encoder"], in_channels=[12, 16],
                              out_channels=[16, 16],
                              downsample_scales=[1, 4], stacks=[1, 1])
        # upsampling must precede the skip stages (reference decoder sums all
        # skip outputs, so every res-skip stage must share one time length)
        cfg["decoder"] = dict(TINY["decoder"], in_channels=[8, 16],
                              out_channels=[16, 16],
                              upsample_scales=[4, 1], stacks=[1, 1])
        model = build_model(cfg)
        x = jnp.zeros((1, 32, 12))
        y = jnp.zeros((1,), jnp.int32)
        variables = model.init({"params": jax.random.PRNGKey(0),
                                "vq": jax.random.PRNGKey(1)}, x, y, train=True)
        ids = model.apply(variables, x, method="encode")
        assert ids.shape == (1, 8)  # ÷4
        out = model.apply(variables, ids, y, method="decode")
        assert out.shape == (1, 32, 12)  # ×4 back

    def test_jit_forward(self):
        model = build_model(TINY)
        variables = make_variables(model)

        @jax.jit
        def step(v, x, y):
            return model.apply(v, x, y, train=False)

        xhat, loss, detail = step(variables, jnp.zeros((2, 16, 12)),
                                  jnp.zeros((2,), jnp.int32))
        assert xhat.shape == (2, 16, 12)
