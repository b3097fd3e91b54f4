"""Golden export parity: our checkpoints load into the ACTUAL reference
torch model (strict state_dict) and reproduce our outputs frame by frame.

The reverse direction of tests/test_torch_parity.py — together they pin the
two-way migration story (import → fine-tune → export, or train here →
evaluate with reference tooling). Skipped when the reference checkout or
torch is unavailable.
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

# same toy shapes as test_torch_parity (dilated stacks, 2 layers each)
CFG = {
    "model_type": "vae_npvc.model.vqvae",
    "y_dim": 12, "y_num": 5, "z_dim": 12, "z_num": 24,
    "beta": 0.01, "mu": 0.9, "jitter_p": 0.0, "embed_norm": True,
    "optim_type": "Adam", "learning_rate": 1e-3, "max_grad_norm": 10,
    "use_pallas_vq": False,
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


@pytest.mark.parametrize("use_ema", [False, True])
def test_exported_checkpoint_matches_ours(tmp_path, use_ema):
    import jax.numpy as jnp

    from vae_npvc.model import vqvae as ref_vqvae  # reference, read-only

    from vae_npvc_tpu.train.trainer import Trainer
    from vae_npvc_tpu.utils.torch_export import export_checkpoint_file

    cfg = dict(CFG, use_ema=use_ema)
    tr = Trainer(cfg)
    rng = np.random.default_rng(0)
    batch = (rng.normal(size=(2, 24, 10)).astype(np.float32),
             np.asarray([1, 3], np.int32))
    tr.init_state(batch)
    for _ in range(3):                      # real trained weights, EMA moved
        tr.train_step(batch)
    ck = tmp_path / "ours.msgpack"
    tr.save_checkpoint(ck)

    pt = tmp_path / "exported.pt"
    export_checkpoint_file(ck, cfg, pt)

    torch.manual_seed(0)
    ref = ref_vqvae.Model(cfg)
    data = torch.load(pt, map_location="cpu", weights_only=False)
    # the reference overrides load_state_dict (codebook migration,
    # vqvae.py:106-119) without a strict kwarg — use the base method so
    # missing/unexpected keys fail loudly
    torch.nn.Module.load_state_dict(ref, data["model"], strict=True)
    ref.eval()

    x = rng.normal(size=(2, 24, 10)).astype(np.float32)
    y = np.array([2, 0], np.int64)
    with torch.no_grad():
        xt = torch.from_numpy(np.transpose(x, (0, 2, 1)))
        yt = torch.from_numpy(y).view(-1, 1)
        ref_xhat, ref_loss, ref_detail = ref((xt, yt))
        ref_infer = ref.infer((xt, yt))
        ref_ids = ref.encode(xt)

    import jax
    state = tr.state
    model = tr.model
    variables = {"params": jax.device_get(state.params),
                 **jax.device_get(state.ema)}
    xhat, loss, detail = model.apply(variables, jnp.asarray(x),
                                     jnp.asarray(y, jnp.int32), train=False)
    ids = model.apply(variables, jnp.asarray(x), method="encode")
    out = model.apply(variables, jnp.asarray(x),
                      jnp.asarray(y, jnp.int32), method="infer")

    np.testing.assert_array_equal(
        np.asarray(ids), ref_ids.squeeze(-1).numpy()
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


def test_roundtrip_import_export_identity(tmp_path):
    """torch → ours → torch: the re-exported state_dict equals the original
    (weight-norm (g, v) map at the same parameterization point)."""
    from vae_npvc.model import vqvae as ref_vqvae

    from vae_npvc_tpu.utils.torch_convert import convert_checkpoint_file
    from vae_npvc_tpu.utils.torch_export import export_checkpoint_file

    cfg = dict(CFG, use_ema=True)
    torch.manual_seed(1)
    ref = ref_vqvae.Model(cfg)
    with torch.no_grad():
        ref.quantizer.emb_init.fill_(True)
        ref.quantizer.embeddings.normal_()
        ref.quantizer.emb_sum.copy_(ref.quantizer.embeddings)
        ref.quantizer.emb_elem.fill_(1.0)
    src = tmp_path / "ref.pt"
    torch.save({"model": ref.state_dict(), "iteration": 7}, src)

    ours = tmp_path / "ours.msgpack"
    convert_checkpoint_file(src, cfg, ours)
    back = tmp_path / "back.pt"
    assert export_checkpoint_file(ours, cfg, back) == 7

    sd0 = ref.state_dict()
    sd1 = torch.load(back, map_location="cpu", weights_only=False)["model"]
    assert set(sd0) == set(sd1)
    for k in sd0:
        np.testing.assert_allclose(sd0[k].float().numpy(),
                                   sd1[k].float().numpy(),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


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


def test_roundtrip_vqvae2_identity(tmp_path):
    """Hierarchical family (3 levels + GST): torch → ours → torch identity."""
    from vae_npvc.model import vqvae2 as ref_vqvae2

    from vae_npvc_tpu.utils.torch_convert import convert_checkpoint_file
    from vae_npvc_tpu.utils.torch_export import export_checkpoint_file

    torch.manual_seed(2)
    ref = ref_vqvae2.Model(CFG2)
    src = tmp_path / "ref2.pt"
    torch.save({"model": ref.state_dict(), "iteration": 3}, src)

    ours = tmp_path / "ours2.msgpack"
    convert_checkpoint_file(src, CFG2, ours)
    back = tmp_path / "back2.pt"
    assert export_checkpoint_file(ours, CFG2, back) == 3

    sd0 = ref.state_dict()
    sd1 = torch.load(back, map_location="cpu", weights_only=False)["model"]
    assert set(sd0) == set(sd1)
    for k in sd0:
        np.testing.assert_allclose(sd0[k].float().numpy(),
                                   sd1[k].float().numpy(),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def _roundtrip_identity(tmp_path, ref_module_name, cfg, tag):
    import importlib

    from vae_npvc_tpu.utils.torch_convert import convert_checkpoint_file
    from vae_npvc_tpu.utils.torch_export import export_checkpoint_file

    ref_mod = importlib.import_module(f"vae_npvc.model.{ref_module_name}")
    torch.manual_seed(4)
    ref = ref_mod.Model(cfg)
    src = tmp_path / f"{tag}.pt"
    torch.save({"model": ref.state_dict(), "iteration": 2}, src)
    ours = tmp_path / f"{tag}.msgpack"
    convert_checkpoint_file(src, cfg, ours)
    back = tmp_path / f"{tag}_back.pt"
    assert export_checkpoint_file(ours, cfg, back) == 2
    sd0 = ref.state_dict()
    sd1 = torch.load(back, map_location="cpu", weights_only=False)["model"]
    assert set(sd0) == set(sd1)
    for k in sd0:
        np.testing.assert_allclose(sd0[k].float().numpy(),
                                   sd1[k].float().numpy(),
                                   rtol=1e-6, atol=1e-6, err_msg=k)


def test_roundtrip_vqvae2a_identity(tmp_path):
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
    _roundtrip_identity(tmp_path, "vqvae2a", cfg, "v2a")


def test_roundtrip_vqvae2b_identity(tmp_path):
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
    _roundtrip_identity(tmp_path, "vqvae2b", cfg, "v2b")
