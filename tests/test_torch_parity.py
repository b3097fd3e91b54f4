"""Golden parity: converted reference checkpoints reproduce reference outputs.

Random-initializes the ACTUAL reference PyTorch model (imported from the
read-only checkout), converts its checkpoint with utils/torch_convert, and
asserts our forward/infer match the torch outputs frame by frame. This pins
down conv/transposed-conv semantics, weight-norm collapse, GroupNorm
statistics, quantizer math, and the loss contract in one shot.

Skipped when the reference checkout or torch is unavailable.
"""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(not os.path.isdir(REF),
                                reason="reference checkout not available")
torch = pytest.importorskip("torch")

if REF not in sys.path:
    sys.path.insert(0, REF)

CFG = {
    "model_type": "vae_npvc.model.vqvae",
    "y_dim": 12, "y_num": 5, "z_dim": 12, "z_num": 24,
    "beta": 0.01, "mu": 0.9, "jitter_p": 0.0,
    "encoder": {"in_channels": [10], "out_channels": [14], "kernel_size": 3,
                "downsample_scales": [1], "z_channels": 12, "dilation": True,
                "stack_kernel_size": 3, "stack_layers": 2, "stacks": [2],
                "use_weight_norm": True},
    "decoder": {"in_channels": [12], "out_channels": [14],
                "cond_channels": 12, "skip_channels": 10,
                "final_channels": 10, "kernel_size": 3,
                "upsample_scales": [1], "dilation": True,
                "stack_kernel_size": 3, "stacks": [2],
                "use_weight_norm": True},
}


def _setup(tmp_path, use_ema):
    import jax
    from flax import serialization

    from vae_npvc.model import vqvae as ref_vqvae  # reference, read-only

    from vae_npvc_tpu.models import build_model
    from vae_npvc_tpu.utils.torch_convert import convert_checkpoint_file

    cfg = dict(CFG, use_ema=use_ema, embed_norm=True)
    torch.manual_seed(0)
    ref = ref_vqvae.Model(cfg)
    ref.eval()
    if use_ema:
        with torch.no_grad():
            ref.quantizer.emb_init.fill_(True)
            ref.quantizer.embeddings.normal_()
            ref.quantizer.emb_sum.copy_(ref.quantizer.embeddings)
            ref.quantizer.emb_elem.fill_(1.0)

    ckpt = tmp_path / "ref.pt"
    torch.save({"model": ref.state_dict(), "iteration": 5}, ckpt)
    out = tmp_path / "ours.msgpack"
    assert convert_checkpoint_file(ckpt, cfg, out) == 5

    model = build_model(cfg)
    import jax.numpy as jnp
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 10)), jnp.zeros((1,), jnp.int32), train=True))
    with open(out, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(variables.pop("params"),
                                           payload["model"])
    ema = serialization.from_state_dict(variables, payload["ema"])
    return ref, model, {"params": params, **ema}, cfg


@pytest.mark.parametrize("use_ema", [False, True])
def test_converted_checkpoint_matches_reference(tmp_path, use_ema):
    import jax.numpy as jnp

    ref, model, variables, cfg = _setup(tmp_path, use_ema)

    rng = np.random.default_rng(0)
    B, T, D = 2, 24, 10
    x = rng.normal(size=(B, T, D)).astype(np.float32)
    y = np.array([1, 3], np.int64)

    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))  # (B, D, T)
        yt = torch.from_numpy(y).view(-1, 1)
        ref_xhat, ref_loss, ref_detail = ref((xt, yt))
        ref_infer = ref.infer((xt, yt))
        ref_ids = ref.encode(xt)

    xhat, loss, detail = model.apply(variables, jnp.asarray(x),
                                     jnp.asarray(y, jnp.int32), train=False)
    ids = model.apply(variables, jnp.asarray(x), method="encode")
    out = model.apply(variables, jnp.asarray(x),
                      jnp.asarray(y, jnp.int32), method="infer")

    np.testing.assert_array_equal(np.asarray(ids),
                                  ref_ids.squeeze(-1).numpy()
                                  if ref_ids.ndim == 3 else ref_ids.numpy())
    np.testing.assert_allclose(
        np.asarray(xhat), np.transpose(ref_xhat.numpy(), (0, 2, 1)),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(
        np.asarray(out), np.transpose(ref_infer.numpy(), (0, 2, 1)),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(detail["X like"]),
                               float(ref_detail["X like"]), rtol=1e-4)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


# --------------------------------------------------------------------------
# hierarchical family (vqvae2, GST top, plain VQ)
# --------------------------------------------------------------------------

def _enc2(in_ch, ds):
    return {"in_channels": [in_ch], "out_channels": [14], "kernel_size": 3,
            "downsample_scales": [ds], "z_channels": 8, "dilation": True,
            "stack_kernel_size": 3, "stack_layers": 2, "stacks": [2],
            "use_weight_norm": True, "use_causal_conv": False}


def _dec2(in_ch, cond, final):
    return {"in_channels": [in_ch], "out_channels": [14],
            "cond_channels": cond, "skip_channels": 8, "final_channels": final,
            "kernel_size": 3, "upsample_scales": [1], "dilation": True,
            "stack_kernel_size": 3, "stacks": [2], "use_weight_norm": True,
            "use_causal_conv": False}


CFG2 = {
    "model_type": "vae_npvc.model.vqvae2",
    "levels": 3, "y_dim": 8, "y_num": 5, "beta": 0.01,
    "use_gst": True, "use_ema": False, "jitter_p": 0.0,
    "encoder.0": _enc2(10, 1),
    "encoder.1": _enc2(14, 2),
    "encoder.2": _enc2(14, 2),
    "decoder.0": _dec2(24, 8, 10),
    "decoder.1": _dec2(8, 16, 8),
    "decoder.2": _dec2(8, 8, 8),
    "quantizer.0": {"z_dim": 8, "z_num": 24, "normalize": True},
    "quantizer.1": {"z_dim": 8, "z_num": 24, "normalize": True},
    "quantizer.2": {"ref_embed_dim": 8, "gst_tokens": 4,
                    "gst_token_dim": 8, "gst_heads": 2},
}


def test_converted_vqvae2_matches_reference(tmp_path):
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from vae_npvc.model import vqvae2 as ref_vqvae2  # reference, read-only

    from vae_npvc_tpu.models import build_model
    from vae_npvc_tpu.utils.torch_convert import convert_checkpoint_file

    torch.manual_seed(0)
    ref = ref_vqvae2.Model(CFG2)
    ref.eval()
    ckpt = tmp_path / "ref2.pt"
    torch.save({"model": ref.state_dict(), "iteration": 1}, ckpt)
    out = tmp_path / "ours2.msgpack"
    convert_checkpoint_file(ckpt, CFG2, out)

    model = build_model(CFG2)
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 10)), jnp.zeros((1,), jnp.int32), train=True))
    with open(out, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(variables.pop("params"),
                                           payload["model"])
    v = {"params": params}

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16, 10)).astype(np.float32)
    y = np.array([2, 4], np.int64)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))
        yt = torch.from_numpy(y).view(-1, 1)
        ref_xhat, ref_loss, ref_detail = ref((xt, yt))

    xhat, loss, detail = model.apply(v, jnp.asarray(x),
                                     jnp.asarray(y, jnp.int32), train=False)
    np.testing.assert_allclose(
        np.asarray(xhat), np.transpose(ref_xhat.numpy(), (0, 2, 1)),
        rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(float(detail["X like"]),
                               float(ref_detail["X like"]), rtol=1e-4)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-4)


# --------------------------------------------------------------------------
# vqvae2a (cascade) and vqvae2b (fusion) forward parity
# --------------------------------------------------------------------------

def _convert_and_load(tmp_path, ref_module_name, cfg, tag):
    import importlib

    import jax
    import jax.numpy as jnp
    from flax import serialization

    from vae_npvc_tpu.models import build_model
    from vae_npvc_tpu.utils.torch_convert import convert_checkpoint_file

    ref_mod = importlib.import_module(f"vae_npvc.model.{ref_module_name}")
    torch.manual_seed(0)
    ref = ref_mod.Model(cfg)
    ref.eval()
    ckpt = tmp_path / f"{tag}.pt"
    torch.save({"model": ref.state_dict(), "iteration": 1}, ckpt)
    out = tmp_path / f"{tag}.msgpack"
    convert_checkpoint_file(ckpt, cfg, out)

    model = build_model(cfg)
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 10)), jnp.zeros((1,), jnp.int32), train=True))
    with open(out, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(variables.pop("params"),
                                           payload["model"])
    return ref, model, {"params": params}


def _forward_parity(ref, model, v, rtol=1e-4):
    import jax.numpy as jnp

    rng = np.random.default_rng(2)
    x = rng.normal(size=(2, 16, 10)).astype(np.float32)
    y = np.array([1, 4], np.int64)
    with torch.no_grad():
        ref_xhat, ref_loss, ref_detail = ref(
            (torch.from_numpy(np.transpose(x, (0, 2, 1))),
             torch.from_numpy(y).view(-1, 1)))
    xhat, loss, detail = model.apply(v, jnp.asarray(x),
                                     jnp.asarray(y, jnp.int32), train=False)
    np.testing.assert_allclose(
        np.asarray(xhat), np.transpose(ref_xhat.numpy(), (0, 2, 1)),
        rtol=rtol, atol=rtol)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=rtol)


def test_converted_vqvae2a_matches_reference(tmp_path):
    cfg = {
        "model_type": "vae_npvc.model.vqvae2a",
        "levels": 3, "y_dim": 8, "y_num": 5, "beta": 0.01,
        "use_gst": True, "use_ema": False, "jitter_p": 0.0,
        "use_quantizers": True, "use_embeds": True,
        "pooling_last": True, "upsample_last": False,
        "encoder.0": _enc2(10, 1),
        "encoder.1": _enc2(14, 2),
        "encoder.2": _enc2(14, 2),
        "decoder.2": _dec2(8, 8, 8),
        "decoder.1": _dec2(16, 8, 8),
        "decoder.0": _dec2(16, 8, 10),
        "quantizer.0": {"z_dim": 8, "z_num": 24, "normalize": True},
        "quantizer.1": {"z_dim": 8, "z_num": 24, "normalize": True},
        "quantizer.2": {"ref_embed_dim": 8, "gst_tokens": 4,
                        "gst_token_dim": 8, "gst_heads": 2},
    }
    ref, model, v = _convert_and_load(tmp_path, "vqvae2a", cfg, "v2a")
    _forward_parity(ref, model, v)


def test_converted_vqvae2b_matches_reference(tmp_path):
    dec_b = dict(_dec2(8, 8, 8))
    final = dict(_dec2(16, 0, 10))
    final["cond_channels"] = 0
    cfg = {
        "model_type": "vae_npvc.model.vqvae2b",
        "levels": 2, "y_dim": 8, "y_num": 5, "beta": 0.01,
        "use_gst": False, "use_ema": False, "jitter_p": 0.0,
        "pooling_last": True,
        "encoder.0": _enc2(10, 1),
        "encoder.1": _enc2(14, 2),
        "decoder.0": dec_b,
        "decoder.1": dict(dec_b),
        "final_decoder": final,
        "quantizer.0": {"z_dim": 8, "z_num": 24, "normalize": True},
        "quantizer.1": {"z_dim": 8, "z_num": 24, "normalize": True},
    }
    ref, model, v = _convert_and_load(tmp_path, "vqvae2b", cfg, "v2b")
    _forward_parity(ref, model, v)


def test_converted_strided_vqvae_matches_reference(tmp_path):
    """Covers the strided ConvTranspose converter mapping (us > 1)."""
    import jax
    import jax.numpy as jnp
    from flax import serialization

    from vae_npvc.model import vqvae as ref_vqvae

    from vae_npvc_tpu.models import build_model
    from vae_npvc_tpu.utils.torch_convert import convert_checkpoint_file

    cfg = {
        "model_type": "vae_npvc.model.vqvae",
        "y_dim": 8, "y_num": 5, "z_dim": 8, "z_num": 16,
        "use_ema": False, "embed_norm": True, "beta": 0.01, "jitter_p": 0.0,
        "encoder": {"in_channels": [10, 14], "out_channels": [14, 14],
                    "kernel_size": 3, "downsample_scales": [1, 2],
                    "z_channels": 8, "dilation": False,
                    "stack_kernel_size": 3, "stack_layers": 1,
                    "stacks": [1, 1], "use_weight_norm": True},
        "decoder": {"in_channels": [8, 14], "out_channels": [14, 14],
                    "cond_channels": 8, "skip_channels": 8,
                    "final_channels": 10, "kernel_size": 3,
                    "upsample_scales": [2, 1], "dilation": False,
                    "stack_kernel_size": 3, "stacks": [1, 1],
                    "use_weight_norm": True},
    }
    torch.manual_seed(0)
    ref = ref_vqvae.Model(cfg)
    ref.eval()
    ckpt = tmp_path / "refs.pt"
    torch.save({"model": ref.state_dict(), "iteration": 1}, ckpt)
    out = tmp_path / "ourss.msgpack"
    convert_checkpoint_file(ckpt, cfg, out)

    model = build_model(cfg)
    variables = dict(model.init(
        {"params": jax.random.PRNGKey(0), "vq": jax.random.PRNGKey(1)},
        jnp.zeros((1, 16, 10)), jnp.zeros((1,), jnp.int32), train=True))
    with open(out, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    params = serialization.from_state_dict(variables.pop("params"),
                                           payload["model"])
    v = {"params": params}

    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 16, 10)).astype(np.float32)
    y = np.array([0, 2], np.int64)
    with torch.no_grad():
        ref_out = ref.infer((torch.from_numpy(np.transpose(x, (0, 2, 1))),
                             torch.from_numpy(y).view(-1, 1)))
    out_j = model.apply(v, jnp.asarray(x), jnp.asarray(y, jnp.int32),
                        method="infer")
    np.testing.assert_allclose(
        np.asarray(out_j), np.transpose(ref_out.numpy(), (0, 2, 1)),
        rtol=1e-4, atol=1e-4)
