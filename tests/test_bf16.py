"""bf16 compute-dtype path: forward/backward runs, params stay fp32."""

import numpy as np
import jax
import jax.numpy as jnp

from vae_npvc_tpu.models import build_model

CFG = {
    "model_type": "vae_npvc.model.vqvae", "compute_dtype": "bfloat16",
    "y_dim": 8, "y_num": 3, "z_dim": 8, "z_num": 16,
    "use_ema": True, "beta": 0.01, "mu": 0.9, "jitter_p": 0.0,
    "use_pallas_vq": False,
    "encoder": {"in_channels": [10], "out_channels": [16], "kernel_size": 3,
                "downsample_scales": [1], "z_channels": 8, "dilation": False,
                "stack_kernel_size": 3, "stack_layers": 1, "stacks": [1],
                "use_weight_norm": True},
    "decoder": {"in_channels": [8], "out_channels": [16], "cond_channels": 8,
                "skip_channels": 8, "final_channels": 10, "kernel_size": 3,
                "upsample_scales": [1], "dilation": False,
                "stack_kernel_size": 3, "stacks": [1],
                "use_weight_norm": True},
}


def test_bf16_forward_backward():
    model = build_model(CFG)
    assert model.dtype == jnp.bfloat16
    x = jnp.array(np.random.default_rng(0).normal(size=(2, 16, 10)),
                  jnp.float32)
    y = jnp.zeros((2,), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "vq": jax.random.PRNGKey(1)}, x, y, train=True)
    # params stay fp32 (master weights)
    for leaf in jax.tree_util.tree_leaves(variables["params"]):
        assert leaf.dtype == jnp.float32, leaf.dtype

    def loss_fn(params):
        (xhat, loss, detail), _ = model.apply(
            {"params": params, "ema": variables["ema"]}, x, y, train=True,
            mutable=["ema"], rngs={"vq": jax.random.PRNGKey(2)})
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    for g in jax.tree_util.tree_leaves(grads):
        assert g.dtype == jnp.float32
        assert np.all(np.isfinite(g))
