"""Convert reference PyTorch checkpoints to this framework's format.

Lets users of the reference (Sinica-SLAM/vae_npvc) carry trained models over:
``torch.save({'model': state_dict, ...})`` checkpoints of the flat VQ-VAE
(reference: vae_npvc/model/vqvae.py, trainer/basic.py:109-115) are mapped onto
our flax param tree + EMA collection, preserving the effective weights exactly:

- torch ``weight_norm`` layers are collapsed to their effective weight
  ``w = g · v / ||v||`` (torch normalizes ConvTranspose over dim 0 — the
  *input*-channel axis — while our blocks normalize per output channel; using
  the effective weight sidesteps the parameterization mismatch, and our
  ``g``/``v`` are re-derived so the forward function is identical);
- torch Conv1d weights (out, in, k) → our (k, in, out);
- the reference's stride-1 ConvTranspose1d "deconv" layers are forward convs
  with flipped kernels here (nn/blocks.py), so their weights map with a kernel
  flip + in/out transpose; strided ConvTranspose maps without the flip;
- GroupNorm weight/bias → scale/bias; embeddings and (EMA) codebook buffers
  map directly.

Numerical parity of the converted model is asserted against the actual
reference implementation in tests/test_torch_parity.py (skipped when the
reference checkout or torch is unavailable).
"""

from __future__ import annotations

import numpy as np


def _wn_effective(sd, prefix):
    """Effective weight of a (possibly weight-normed) torch conv + bias."""
    if f"{prefix}.weight_v" in sd:
        v = np.asarray(sd[f"{prefix}.weight_v"], np.float64)
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float64)
        axes = tuple(range(1, v.ndim))  # torch weight_norm dim=0
        norm = np.sqrt(np.sum(v * v, axis=axes, keepdims=True))
        w = (g * v / norm).astype(np.float32)
    else:
        w = np.asarray(sd[f"{prefix}.weight"], np.float32)
    b = np.asarray(sd[f"{prefix}.bias"], np.float32)
    return w, b


def _conv_params(sd, prefix):
    """torch Conv1d (out, in, k) → our WNConv1d {v (k,in,out), g (out,), b}.

    When the checkpoint carries torch weight-norm params, (g, v) are mapped
    DIRECTLY (same parameterization point, so fine-tuning a converted
    checkpoint reproduces the reference's weight-norm gradient geometry, not
    just its forward); otherwise g is re-derived as the per-out-channel norm
    (then g·v/||v|| == w, the same forward function)."""
    if f"{prefix}.weight_v" in sd:
        v = np.transpose(np.asarray(sd[f"{prefix}.weight_v"], np.float32),
                         (2, 1, 0)).copy()
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float32).reshape(-1)
        return {"v": v, "g": g,
                "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}
    w, b = _wn_effective(sd, prefix)
    v = np.transpose(w, (2, 1, 0)).astype(np.float32)
    g = np.linalg.norm(v.reshape(-1, v.shape[-1]), axis=0).astype(np.float32)
    return {"v": v, "g": g, "b": b}


def _deconv1_params(sd, prefix):
    """Stride-1 torch ConvTranspose1d (in, out, k) → our forward WNConv1d
    with ``wn_dim='in'`` (g indexed by input channel — torch weight_norm dim 0
    of a ConvT weight is the INPUT axis).

    ConvT(x; W) ≡ conv(x; W') with W'[k-1-j, i, o] = W[i, o, j]; the flip is
    norm-invariant so (g, v) map directly when present."""
    if f"{prefix}.weight_v" in sd:
        wv = np.asarray(sd[f"{prefix}.weight_v"], np.float32)
        v = np.transpose(wv, (2, 0, 1))[::-1].copy()
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float32).reshape(-1)
        return {"v": v, "g": g,
                "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}
    w, b = _wn_effective(sd, prefix)
    v = np.transpose(w, (2, 0, 1))[::-1].copy().astype(np.float32)
    g = np.sqrt(np.sum(v * v, axis=(0, 2))).astype(np.float32)  # (in,)
    return {"v": v, "g": g, "b": b}


def _deconvs_params(sd, prefix):
    """Strided torch ConvTranspose1d → our WNConvTranspose1d (v[j,i,o]=W[i,o,j],
    the flip happens inside our layer; g per input channel, wn_dim='in')."""
    if f"{prefix}.weight_v" in sd:
        wv = np.asarray(sd[f"{prefix}.weight_v"], np.float32)
        v = np.transpose(wv, (2, 0, 1)).copy()
        g = np.asarray(sd[f"{prefix}.weight_g"], np.float32).reshape(-1)
        return {"v": v, "g": g,
                "b": np.asarray(sd[f"{prefix}.bias"], np.float32)}
    w, b = _wn_effective(sd, prefix)
    v = np.transpose(w, (2, 0, 1)).copy().astype(np.float32)
    g = np.sqrt(np.sum(v * v, axis=(0, 2))).astype(np.float32)  # (in,)
    return {"v": v, "g": g, "b": b}


def _norm_params(sd, prefix):
    return {"scale": np.asarray(sd[f"{prefix}.weight"], np.float32),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _encoder_tree(sd, prefix, enc_arch, z_proj_name=None):
    """Reference Encoder (Sequential + optional separate z_proj) → our tree."""
    out = {}
    stacks = enc_arch.get("stacks", [3])
    stack_layers = enc_arch.get("stack_layers", 2)
    seq = 0
    for i, n_stack in enumerate(stacks):
        out[f"conv_{i}"] = _conv_params(sd, f"{prefix}.encode.{seq}")
        seq += 1
        for j in range(n_stack):
            blk = {}
            base = f"{prefix}.encode.{seq}"
            for l in range(stack_layers):
                blk[f"conv_{l}"] = _conv_params(sd, f"{base}.stack.{3*l+1}")
                blk[f"norm_{l}"] = _norm_params(sd, f"{base}.stack.{3*l+2}")
            blk["skip"] = _conv_params(sd, f"{base}.skip_layer")
            out[f"stack_{i}_{j}"] = blk
            seq += 1
        seq += 1  # LeakyReLU
    if z_proj_name:  # vqvae2-family encoders keep z_proj outside the Sequential
        out["proj"] = _conv_params(sd, f"{prefix}.{z_proj_name}")
    else:
        out["proj"] = _conv_params(sd, f"{prefix}.encode.{seq}")
    return out


def _decoder_tree(sd, prefix, dec_arch):
    """Reference Decoder (ModuleList + final_layer) → our tree."""
    out = {}
    d_stacks = dec_arch.get("stacks", [3])
    upsample = dec_arch.get("upsample_scales", [1] * len(d_stacks))
    li = 0
    for i, (n_stack, us) in enumerate(zip(d_stacks, upsample)):
        base = f"{prefix}.layers.{li}"
        out[f"up_{i}"] = (_deconv1_params(sd, base) if us == 1
                          else _deconvs_params(sd, base))
        li += 1
        for j in range(n_stack):
            base = f"{prefix}.layers.{li}"
            blk = {"conv_in": _deconv1_params(sd, f"{base}.conv_in"),
                   "norm": _norm_params(sd, f"{base}.norm_layer"),
                   "res_skip": _conv_params(sd, f"{base}.res_skip_layers")}
            if f"{base}.conv_cond.weight" in sd or                     f"{base}.conv_cond.weight_v" in sd:
                blk["conv_cond"] = _conv_params(sd, f"{base}.conv_cond")
            out[f"stack_{i}_{j}"] = blk
            li += 1
    out["final_0"] = _conv_params(sd, f"{prefix}.final_layer.1")
    out["final_1"] = _conv_params(sd, f"{prefix}.final_layer.3")
    return out


def _dense_params(sd, prefix):
    """torch Linear (out, in) → flax Dense {kernel (in, out), bias}."""
    return {"kernel": np.asarray(sd[f"{prefix}.weight"], np.float32).T.copy(),
            "bias": np.asarray(sd[f"{prefix}.bias"], np.float32)}


def _gst_tree(sd, prefix):
    return {"gst_embs": np.asarray(sd[f"{prefix}.gst_embs"], np.float32),
            "mha": {n: _dense_params(sd, f"{prefix}.mha.{n}")
                    for n in ("linear_q", "linear_k", "linear_v",
                              "linear_out")}}


def convert_vqvae2_family(state_dict, config):
    """Reference vqvae2 / vqvae2a / vqvae2b state_dict → (params, ema)."""
    from ..ops.vq import EmaVqState

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    model_type = config.get("model_type", "vae_npvc.model.vqvae2")
    short = model_type.split(":")[0].rsplit(".", 1)[-1]
    levels = config.get("levels", 3)
    use_gst = config.get("use_gst", True) if (levels > 1 or short == "vqvae2")         else False
    use_ema = config.get("use_ema", True)
    use_quantizers = config.get("use_quantizers", True)         if short == "vqvae2a" else True
    use_embeds = config.get("use_embeds", True) if short == "vqvae2a" else True

    params, ema_col = {}, {}
    for i in range(levels):
        params[f"encoder_{i}"] = _encoder_tree(
            sd, f"encoders.{i}", config[f"encoder.{i}"], z_proj_name="z_proj")
        params[f"decoder_{i}"] = _decoder_tree(
            sd, f"decoders.{i}", config[f"decoder.{i}"])

    if short == "vqvae2b":
        params["final_decoder"] = _decoder_tree(sd, "final_decoder",
                                                config["final_decoder"])

    # speaker embeddings
    if short == "vqvae2":
        params["embeds"] = {"embedding": np.asarray(
            sd["embeds._embedding.weight"], np.float32)}
    elif short == "vqvae2b" or (short == "vqvae2a" and use_embeds):
        for i in range(levels):
            params[f"embeds_{i}"] = {"embedding": np.asarray(
                sd[f"embeds.{i}._embedding.weight"], np.float32)}
    else:
        params["embed"] = {"embedding": np.asarray(
            sd["embed._embedding.weight"], np.float32)}

    # quantizers
    def _ema_state(prefix):
        return EmaVqState(
            initted=np.asarray(sd[f"{prefix}.emb_init"], bool).reshape(()),
            emb=np.asarray(sd[f"{prefix}.embeddings"], np.float32),
            emb_sum=np.asarray(sd[f"{prefix}.emb_sum"], np.float32),
            emb_elem=np.asarray(sd[f"{prefix}.emb_elem"], np.float32))

    if not use_quantizers:  # shared quantizer (vqvae2a)
        if use_ema:
            ema_col["quantizer"] = _ema_state("quantizer")
        else:
            params["quantizer_embedding"] = np.asarray(
                sd["quantizer.embeddings"], np.float32)
    else:
        for i in range(levels):
            if use_gst and i == levels - 1:
                params["gst"] = _gst_tree(sd, f"quantizers.{i}")
            elif use_ema:
                ema_col[f"quantizer_{i}"] = _ema_state(f"quantizers.{i}")
            else:
                params[f"quantizer_embedding_{i}"] = np.asarray(
                    sd[f"quantizers.{i}.embeddings"], np.float32)

    ema = {"ema": ema_col} if ema_col else {}
    return params, ema


def convert_flat_vqvae(state_dict, config):
    """Reference flat-VQVAE state_dict + experiment config → (params, ema).

    Walks the reference encoder's ``nn.Sequential`` index layout
    (vqvae.py:146-176: per stage [Conv1d, stacks…, LeakyReLU], final 1×1) and
    the decoder's ``ModuleList`` (vqvae.py:243-283).
    """
    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    enc_a = config.get("encoder", {})
    dec_a = config.get("decoder", {})

    params = {"encoder": {}, "decoder": {}, "embeds": {}}

    # ---------------- encoder (Sequential indices) ----------------
    stacks = enc_a.get("stacks", [3])
    stack_layers = enc_a.get("stack_layers", 2)
    seq = 0
    for i, n_stack in enumerate(stacks):
        params["encoder"][f"conv_{i}"] = _conv_params(
            sd, f"encoder.encode.{seq}")
        seq += 1
        for j in range(n_stack):
            blk = {}
            base = f"encoder.encode.{seq}"
            for l in range(stack_layers):
                # stack indices: [LReLU, Conv1d, GroupNorm] per layer
                blk[f"conv_{l}"] = _conv_params(sd, f"{base}.stack.{3*l+1}")
                blk[f"norm_{l}"] = _norm_params(sd, f"{base}.stack.{3*l+2}")
            blk["skip"] = _conv_params(sd, f"{base}.skip_layer")
            params["encoder"][f"stack_{i}_{j}"] = blk
            seq += 1
        seq += 1  # LeakyReLU
    params["encoder"]["proj"] = _conv_params(sd, f"encoder.encode.{seq}")

    # ---------------- decoder (ModuleList indices) ----------------
    d_stacks = dec_a.get("stacks", [3])
    upsample = dec_a.get("upsample_scales", [1] * len(d_stacks))
    li = 0
    for i, (n_stack, us) in enumerate(zip(d_stacks, upsample)):
        base = f"decoder.layers.{li}"
        params["decoder"][f"up_{i}"] = (
            _deconv1_params(sd, base) if us == 1 else _deconvs_params(sd, base))
        li += 1
        for j in range(n_stack):
            base = f"decoder.layers.{li}"
            blk = {"conv_in": _deconv1_params(sd, f"{base}.conv_in"),
                   "norm": _norm_params(sd, f"{base}.norm_layer"),
                   "res_skip": _conv_params(sd, f"{base}.res_skip_layers")}
            if f"{base}.conv_cond.weight" in sd or \
                    f"{base}.conv_cond.weight_v" in sd:
                blk["conv_cond"] = _conv_params(sd, f"{base}.conv_cond")
            params["decoder"][f"stack_{i}_{j}"] = blk
            li += 1
    params["decoder"]["final_0"] = _conv_params(sd, "decoder.final_layer.1")
    params["decoder"]["final_1"] = _conv_params(sd, "decoder.final_layer.3")

    # ---------------- embeddings + quantizer ----------------
    params["embeds"]["embedding"] = np.asarray(sd["embeds._embedding.weight"],
                                               np.float32)
    ema = {}
    if config.get("use_ema", False):
        from ..ops.vq import EmaVqState
        ema = {"ema": {"quantizer": EmaVqState(
            initted=np.asarray(sd["quantizer.emb_init"], bool).reshape(()),
            emb=np.asarray(sd["quantizer.embeddings"], np.float32),
            emb_sum=np.asarray(sd["quantizer.emb_sum"], np.float32),
            emb_elem=np.asarray(sd["quantizer.emb_elem"], np.float32))}}
    else:
        params["quantizer_embedding"] = np.asarray(
            sd["quantizer.embeddings"], np.float32)
    return params, ema


def convert_checkpoint_file(torch_ckpt_path, config, out_path):
    """Full pipeline: torch .pt/.ckpt → our msgpack checkpoint file."""
    import torch
    from flax import serialization

    data = torch.load(torch_ckpt_path, map_location="cpu",
                      weights_only=False)
    sd = {k: v.numpy() for k, v in data["model"].items()}
    short = config.get("model_type", "vae_npvc.model.vqvae").split(":")[0]         .rsplit(".", 1)[-1]
    if short in ("vqvae2", "vqvae2a", "vqvae2b"):
        params, ema = convert_vqvae2_family(sd, config)
    else:
        params, ema = convert_flat_vqvae(sd, config)
    from .migrate import WN_AXIS_FORMAT
    payload = {
        "model": serialization.to_state_dict(params),
        "ema": serialization.to_state_dict(ema),
        "optimizer": {},
        "iteration": int(data.get("iteration", 0)),
        # converter emits the post-03818d8 (g per torch-dim-0) layout
        "wn_axis_format": WN_AXIS_FORMAT,
    }
    with open(out_path, "wb") as f:
        f.write(serialization.msgpack_serialize(payload))
    return payload["iteration"]
