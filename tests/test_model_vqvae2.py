"""Tests for the hierarchical VQ-VAE v2 (tiny 2/3-level configs)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_npvc_tpu.models import build_model


def enc_cfg(in_ch, ds, stacks=1):
    return {"in_channels": [in_ch], "out_channels": [16], "kernel_size": 3,
            "downsample_scales": [ds], "z_channels": 8, "dilation": False,
            "stack_kernel_size": 3, "stack_layers": 1, "stacks": [stacks],
            "use_weight_norm": True}


def dec_cfg(in_ch, cond, final):
    return {"in_channels": [in_ch], "out_channels": [16],
            "cond_channels": cond, "skip_channels": 8, "final_channels": final,
            "kernel_size": 3, "upsample_scales": [1], "dilation": False,
            "stack_kernel_size": 3, "stacks": [1], "use_weight_norm": True}


def make_cfg(use_gst=True, use_ema=False, levels=3):
    cfg = {
        "model_type": "vae_npvc.model.vqvae2",
        "levels": levels, "y_dim": 8, "y_num": 4, "beta": 0.01,
        "use_gst": use_gst, "use_ema": use_ema, "jitter_p": 0.0,
        "encoder.0": enc_cfg(10, 1),
        "encoder.1": enc_cfg(16, 2),
        "encoder.2": enc_cfg(16, 2),
        # decoder.0 consumes concat of all levels (3 × 8 channels) + speaker
        "decoder.0": dec_cfg(8 * levels, 8, 10),
        # decoder.i refines z conditioned on concat of coarser levels
        "decoder.1": dec_cfg(8, 16, 8),
        "decoder.2": dec_cfg(8, 8, 8),
        "quantizer.0": {"z_dim": 8, "z_num": 16, "normalize": True,
                        "mu": 0.9},
        "quantizer.1": {"z_dim": 8, "z_num": 16, "normalize": True,
                        "mu": 0.9},
        "quantizer.2": ({"ref_embed_dim": 8, "gst_tokens": 4,
                         "gst_token_dim": 8, "gst_heads": 2} if use_gst else
                        {"z_dim": 8, "z_num": 16, "normalize": True,
                         "mu": 0.9}),
    }
    return cfg


def init_model(cfg, B=2, T=16, D=10):
    model = build_model(cfg)
    x = jnp.zeros((B, T, D))
    y = jnp.zeros((B,), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "vq": jax.random.PRNGKey(1)}, x, y, train=True)
    return model, variables


class TestVqvae2Gst:
    def test_forward_losses_and_per_level_details(self):
        model, variables = init_model(make_cfg(use_gst=True))
        x = jnp.array(np.random.default_rng(0).normal(size=(2, 16, 10)),
                      jnp.float32)
        y = jnp.array([0, 3], jnp.int32)
        xhat, loss, detail = model.apply(
            variables, x, y, train=True, rngs={"vq": jax.random.PRNGKey(2)})
        assert xhat.shape == (2, 16, 10)
        assert np.isfinite(float(loss))
        # 2 VQ levels (top is GST) → per-level suffixed keys
        for k in ("Total", "VQ loss", "X like", "entropy.0", "entropy.1",
                  "quanti_err.0", "quanti_err.1", "z_rms.0", "z_rms.1"):
            assert k in detail, sorted(detail)
        # the scale-drift observability metrics (see nn/gst.py softmax
        # note): RMS of raw pre-quantizer latents per VQ level, plus the
        # GST level's input (the one place magnitude drifts unanchored)
        assert float(detail["z_rms.0"]) > 0
        assert float(detail["gst_in_rms"]) > 0

    def test_gst_scale_penalty_anchors_drift(self):
        """Opt-in gst_scale_penalty must push the GST-level encoder scale
        toward 1 where the unpenalized loss leaves it free (the flagship's
        measured 1e10→1e16 drift)."""
        import optax

        def run(penalty, steps=25):
            cfg = make_cfg(use_gst=True)
            if penalty:
                cfg["gst_scale_penalty"] = penalty
            model = build_model(cfg)
            x = jnp.array(np.random.default_rng(5).normal(
                size=(4, 16, 10)) * 3.0, jnp.float32)
            y = jnp.array([0, 1, 2, 3], jnp.int32)
            variables = model.init({"params": jax.random.PRNGKey(0),
                                    "vq": jax.random.PRNGKey(1)}, x, y,
                                   train=True)
            params = variables["params"]
            tx = optax.adam(1e-2)
            opt = tx.init(params)

            @jax.jit
            def step(params, opt, k):
                def loss_fn(p):
                    _, loss, detail = model.apply(
                        {"params": p}, x, y, train=True,
                        rngs={"vq": jax.random.PRNGKey(k)})
                    return loss, detail
                (_, detail), g = jax.value_and_grad(
                    loss_fn, has_aux=True)(params)
                up, opt2 = tx.update(g, opt)
                return optax.apply_updates(params, up), opt2, detail

            for k in range(steps):
                params, opt, detail = step(params, opt, k)
            return float(detail["gst_in_rms"])

        free = run(0.0)
        anchored = run(1.0)
        # anchored run ends much closer to rms 1 than the free run
        assert abs(np.log(anchored)) < abs(np.log(free)), (anchored, free)

    def test_encode_decode_infer(self):
        model, variables = init_model(make_cfg(use_gst=True))
        x = jnp.array(np.random.default_rng(1).normal(size=(2, 16, 10)),
                      jnp.float32)
        y = jnp.array([1, 2], jnp.int32)
        ids, style = model.apply(variables, x, method="encode")
        assert len(ids) == 2            # two VQ levels
        assert ids[0].shape == (2, 8)   # ÷2 level (coarse first; top is GST)
        assert ids[1].shape == (2, 16)  # ÷1 level
        assert style.shape == (2, 8)
        out = model.apply(variables, ids, y, style, 16, method="decode")
        assert out.shape == (2, 16, 10)
        out2 = model.apply(variables, x, y, method="infer")
        assert out2.shape == (2, 16, 10)
        # decode(encode(x)) == infer(x)
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-5, atol=1e-5)

    def test_grads_flow_all_levels(self):
        model, variables = init_model(make_cfg(use_gst=True))
        x = jnp.array(np.random.default_rng(2).normal(size=(2, 16, 10)),
                      jnp.float32)
        y = jnp.array([0, 1], jnp.int32)

        def loss_fn(params):
            _, loss, _ = model.apply({"params": params}, x, y, train=True,
                                     rngs={"vq": jax.random.PRNGKey(3)})
            return loss

        grads = jax.grad(loss_fn)(variables["params"])
        for name in ("encoder_0", "encoder_1", "encoder_2", "decoder_0",
                     "decoder_1", "decoder_2", "gst", "embeds"):
            leaves = jax.tree_util.tree_leaves(grads[name])
            assert any(float(jnp.abs(l).max()) > 0 for l in leaves), name


class TestVqvae2Ema:
    def test_ema_state_per_level(self):
        model, variables = init_model(make_cfg(use_gst=False, use_ema=True))
        x = jnp.array(np.random.default_rng(3).normal(size=(2, 16, 10)),
                      jnp.float32)
        y = jnp.array([0, 1], jnp.int32)
        (xhat, loss, detail), mut = model.apply(
            variables, x, y, train=True, mutable=["ema"],
            rngs={"vq": jax.random.PRNGKey(4)})
        assert set(mut["ema"]) == {"quantizer_0", "quantizer_1", "quantizer_2"}
        assert all(bool(s.initted) for s in mut["ema"].values())
        assert np.isfinite(float(loss))
        assert "entropy.2" in detail  # three VQ levels when no GST
