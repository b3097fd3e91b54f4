"""Pipeline parallelism (parallel/pp.py): GPipe ring over the decoder stack.

Exactness contract: the pipelined stack must equal the sequential stack —
same params, same math, only the schedule differs — for both the forward
and the parameter gradients (which stay sharded per stage).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from vae_npvc_tpu.models import build_model
from vae_npvc_tpu.nn.blocks import GLUResSkip
from vae_npvc_tpu.parallel import pp

WIDTH, SKIP, COND, L = 12, 8, 6, 4


def _model_and_params(stacks=L):
    cfg = {
        "model_type": "vae_npvc.model.vqvae",
        "y_dim": COND, "y_num": 3, "z_dim": 8, "z_num": 16,
        "use_ema": False, "beta": 0.01, "use_pallas_vq": False,
        "encoder": {"in_channels": [10], "out_channels": [WIDTH],
                    "kernel_size": 3, "downsample_scales": [1],
                    "z_channels": 8, "dilation": False,
                    "stack_kernel_size": 3, "stack_layers": 1, "stacks": [1],
                    "use_weight_norm": True},
        "decoder": {"in_channels": [8], "out_channels": [WIDTH],
                    "cond_channels": COND, "skip_channels": SKIP,
                    "final_channels": 10, "kernel_size": 3,
                    "upsample_scales": [1], "dilation": False,
                    "stack_kernel_size": 3, "stacks": [stacks],
                    "use_weight_norm": True},
    }
    model = build_model(cfg)
    x = jnp.zeros((2, 16, 10), jnp.float32)
    y = jnp.zeros((2,), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "vq": jax.random.PRNGKey(1)}, x, y, train=True)
    return cfg, variables["params"]["decoder"]


def _sequential(dec_params, h, cond):
    """Independent oracle: apply the stack blocks one by one."""
    blk = GLUResSkip(WIDTH, COND, SKIP, 3, dilation=1, use_weight_norm=True)
    skip_sum = jnp.zeros(h.shape[:2] + (SKIP,), h.dtype)
    for name in pp.decoder_stack_names({"stacks": [L], "dilation": False}):
        h, s = blk.apply({"params": dec_params[name]}, h, cond)
        skip_sum = skip_sum + s
    return h, skip_sum


@pytest.mark.parametrize("n_stages,microbatches", [(2, 4), (4, 4), (2, 3)])
def test_pipeline_matches_sequential(n_stages, microbatches):
    cfg, dec_params = _model_and_params()
    rng = np.random.default_rng(0)
    B = 2 * microbatches
    h = jnp.asarray(rng.normal(size=(B, 16, WIDTH)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(B, 1, COND)), jnp.float32)

    mesh = Mesh(np.array(jax.devices()[:n_stages]), ("pipe",))
    h_pp, skip_pp = pp.pipeline_decoder_stack(
        cfg, dec_params, h, cond, mesh, microbatches=microbatches)
    h_ref, skip_ref = _sequential(dec_params, h, cond)
    np.testing.assert_allclose(np.asarray(h_pp), np.asarray(h_ref),
                               rtol=0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(skip_pp), np.asarray(skip_ref),
                               rtol=0, atol=1e-6)


def test_pipeline_gradients_match_sequential():
    cfg, dec_params = _model_and_params()
    names = pp.decoder_stack_names(cfg["decoder"])
    stacked = pp.stack_layer_params(dec_params, names)
    rng = np.random.default_rng(1)
    M, mb, T = 4, 2, 16
    h = jnp.asarray(rng.normal(size=(M, mb, T, WIDTH)), jnp.float32)
    cond = jnp.asarray(rng.normal(size=(M, mb, 1, COND)), jnp.float32)
    skip0 = jnp.zeros((M, mb, T, SKIP), jnp.float32)
    tgt = jnp.asarray(rng.normal(size=(M, mb, T, SKIP)), jnp.float32)

    blk = GLUResSkip(WIDTH, COND, SKIP, 3, dilation=1, use_weight_norm=True)

    def block_apply(p, carry):
        hh, skip, c = carry
        h2, s = blk.apply({"params": p}, hh, c)
        return (h2, skip + s, c)

    mesh = Mesh(np.array(jax.devices()[:2]), ("pipe",))

    def loss_pp(sp):
        _, skip, _ = pp.pipeline_stack(block_apply, sp, (h, skip0, cond),
                                       mesh)
        return jnp.mean((skip - tgt) ** 2)

    def loss_seq(sp):
        def body(carry, p):
            return block_apply(p, carry), None

        def one(hm, sm, cm, tm):
            (_, skip, _), _ = jax.lax.scan(body, (hm, sm, cm), sp)
            return jnp.mean((skip - tm) ** 2)

        return jnp.mean(jax.vmap(one)(h, skip0, cond, tgt))

    l_pp, g_pp = jax.value_and_grad(loss_pp)(stacked)
    l_seq, g_seq = jax.value_and_grad(loss_seq)(stacked)
    np.testing.assert_allclose(float(l_pp), float(l_seq), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_pp), jax.tree.leaves(g_seq)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_stack_layer_params_requires_undilated():
    with pytest.raises(AssertionError):
        pp.decoder_stack_names({"stacks": [4], "dilation": True})
