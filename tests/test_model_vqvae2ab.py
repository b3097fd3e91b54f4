"""Tests for vqvae2a (cascade) and vqvae2b (independent decoders + fusion)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from vae_npvc_tpu.models import build_model


def enc_cfg(in_ch, ds):
    return {"in_channels": [in_ch], "out_channels": [16], "kernel_size": 3,
            "downsample_scales": [ds], "z_channels": 8, "dilation": False,
            "stack_kernel_size": 3, "stack_layers": 1, "stacks": [1],
            "use_weight_norm": True}


def dec_cfg(in_ch, cond, final, us=1):
    return {"in_channels": [in_ch], "out_channels": [16],
            "cond_channels": cond, "skip_channels": 8, "final_channels": final,
            "kernel_size": 3, "upsample_scales": [us], "dilation": False,
            "stack_kernel_size": 3, "stacks": [1], "use_weight_norm": True}


def cfg_2a(use_gst=True, use_ema=False, use_quantizers=True, use_embeds=True):
    return {
        "model_type": "vae_npvc.model.vqvae2a",
        "levels": 3, "y_dim": 8, "y_num": 4, "beta": 0.01,
        "use_gst": use_gst, "use_ema": use_ema, "jitter_p": 0.0,
        "use_quantizers": use_quantizers, "use_embeds": use_embeds,
        "encoder.0": enc_cfg(10, 1),
        "encoder.1": enc_cfg(16, 2),
        "encoder.2": enc_cfg(16, 2),
        # cascade: dec2 sees top z_vq (8); dec1 sees cat(z1, dec2out); dec0
        # sees cat(z0, dec1out)
        "decoder.2": dec_cfg(8, 8, 8),
        "decoder.1": dec_cfg(16, 8, 8),
        "decoder.0": dec_cfg(16, 8, 10),
        "quantizer.0": {"z_dim": 8, "z_num": 16, "normalize": True},
        "quantizer.1": {"z_dim": 8, "z_num": 16, "normalize": True},
        "quantizer.2": ({"ref_embed_dim": 8, "gst_tokens": 4,
                         "gst_token_dim": 8, "gst_heads": 2} if use_gst else
                        {"z_dim": 8, "z_num": 16, "normalize": True}),
        "quantizer": {"z_dim": 8, "z_num": 16, "normalize": True},
    }


def cfg_2b():
    return {
        "model_type": "vae_npvc.model.vqvae2b",
        "levels": 2, "y_dim": 8, "y_num": 4, "beta": 0.01,
        "use_gst": False, "use_ema": False, "jitter_p": 0.0,
        "pooling_last": True,
        "encoder.0": enc_cfg(10, 1),
        "encoder.1": enc_cfg(16, 2),
        "decoder.0": dec_cfg(8, 8, 8),
        "decoder.1": dec_cfg(8, 8, 8),
        "final_decoder": dec_cfg(16, 0, 10),
        "quantizer.0": {"z_dim": 8, "z_num": 16, "normalize": True},
        "quantizer.1": {"z_dim": 8, "z_num": 16, "normalize": True},
    }


def init_model(cfg, B=2, T=16, D=10):
    model = build_model(cfg)
    x = jnp.zeros((B, T, D))
    y = jnp.zeros((B,), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "vq": jax.random.PRNGKey(1)}, x, y, train=True)
    return model, variables


class TestVqvae2a:
    def test_forward_and_roundtrip(self):
        model, variables = init_model(cfg_2a())
        x = jnp.array(np.random.default_rng(0).normal(size=(2, 16, 10)),
                      jnp.float32)
        y = jnp.array([0, 3], jnp.int32)
        xhat, loss, detail = model.apply(
            variables, x, y, train=True, rngs={"vq": jax.random.PRNGKey(2)})
        assert xhat.shape == (2, 16, 10) and np.isfinite(float(loss))
        assert "entropy.0" in detail and "entropy.1" in detail

        zs = model.apply(variables, x, method="encode")
        assert zs[0].shape == (2, 16)   # fine level ids
        assert zs[1].shape == (2, 8)    # /2 level ids
        assert zs[2].shape == (2, 8)    # GST style (pooled)
        # per-level speaker control: (B, levels) speaker matrix
        ys = jnp.array([[1, 2, 3], [0, 0, 0]], jnp.int32)
        out = model.apply(variables, zs, ys, 16, method="decode")
        assert out.shape == (2, 16, 10)
        out2 = model.apply(variables, x, ys, method="infer")
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-5, atol=1e-5)

    def test_shared_quantizer_and_single_embed(self):
        model, variables = init_model(cfg_2a(use_gst=False,
                                             use_quantizers=False,
                                             use_embeds=False))
        assert "quantizer_embedding" in variables["params"]
        assert "embed" in variables["params"]
        x = jnp.array(np.random.default_rng(1).normal(size=(2, 16, 10)),
                      jnp.float32)
        y = jnp.array([0, 1], jnp.int32)
        xhat, loss, detail = model.apply(
            variables, x, y, train=True, rngs={"vq": jax.random.PRNGKey(2)})
        assert np.isfinite(float(loss))
        assert "entropy.2" in detail  # 3 VQ levels share one codebook

    def test_upsample_last_mode(self):
        cfg = cfg_2a()
        cfg["upsample_last"] = True
        model, variables = init_model(cfg)
        x = jnp.array(np.random.default_rng(2).normal(size=(1, 16, 10)),
                      jnp.float32)
        xhat, loss, _ = model.apply(
            variables, x, jnp.zeros((1,), jnp.int32), train=True,
            rngs={"vq": jax.random.PRNGKey(0)})
        assert xhat.shape == (1, 16, 10) and np.isfinite(float(loss))


class TestVqvae2b:
    def test_forward_and_per_level_speakers(self):
        model, variables = init_model(cfg_2b())
        x = jnp.array(np.random.default_rng(0).normal(size=(2, 16, 10)),
                      jnp.float32)
        y = jnp.array([0, 3], jnp.int32)
        xhat, loss, detail = model.apply(
            variables, x, y, train=True, rngs={"vq": jax.random.PRNGKey(2)})
        assert xhat.shape == (2, 16, 10) and np.isfinite(float(loss))
        assert "quanti_err.0" in detail and "quanti_err.1" in detail

        zs = model.apply(variables, x, method="encode")
        assert zs[0].shape == (2, 16)
        assert zs[1].shape == (2, 1)    # pooled top level → 1 frame of ids
        ys = jnp.array([[1, 2], [3, 0]], jnp.int32)
        out = model.apply(variables, zs, ys, 16, method="decode")
        assert out.shape == (2, 16, 10)
        out2 = model.apply(variables, x, ys, method="infer")
        np.testing.assert_allclose(np.asarray(out), np.asarray(out2),
                                   rtol=1e-5, atol=1e-5)
        # changing one level's speaker changes the output
        ys2 = jnp.array([[1, 3], [3, 0]], jnp.int32)
        out3 = model.apply(variables, zs, ys2, 16, method="decode")
        assert float(jnp.abs(out3 - out).max()) > 1e-6
