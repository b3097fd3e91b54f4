"""Export this framework's checkpoints to reference-PyTorch format.

The inverse of :mod:`utils.torch_convert` — lets users move trained models
BACK to the reference (Sinica-SLAM/vae_npvc): our msgpack checkpoint becomes
a ``torch.save({'model': state_dict, 'iteration': N})`` file that the
reference's resume path loads directly (reference: vae_npvc/trainer/
basic.py:109-115 checkpoint format, train.py:55-57 ``--checkpoint``).
Together the two directions make migration two-way: import, fine-tune here,
export; or train here from scratch and evaluate/serve with reference
tooling.

Per-layer inverses (see torch_convert for the forward mapping):

- WNConv1d ``{v (k,in,out), g (out,), b}`` → torch weight-normed Conv1d
  ``weight_v (out,in,k)``, ``weight_g (out,1,1)``, ``bias``;
- ``wn_dim='in'`` layers standing in for the reference's stride-1
  ConvTranspose1d → ``weight_v (in,out,k)`` with the kernel flip undone,
  ``weight_g (in,1,1)``;
- WNConvTranspose1d (strided) → ConvT weights without the flip;
- GroupNorm scale/bias → weight/bias; flax Dense kernel → Linear weight.T;
- EMA codebook state → the reference's ``emb_init/embeddings/emb_sum/
  emb_elem`` buffers (layers_vq.py:170-172).

Exported (g, v) land at the same parameterization point torch's
``weight_norm`` uses, so fine-tuning the exported checkpoint in the
reference reproduces its native weight-norm gradient geometry.
Round-trip parity (ours → torch → reference forward == our forward) is
asserted against the actual reference implementation in
tests/test_torch_export.py.
"""

from __future__ import annotations

import numpy as np


def _np(x):
    return np.asarray(x)


def _conv_sd(p, prefix, sd):
    """Our WNConv1d (wn_dim='out') → torch Conv1d entries."""
    v = np.transpose(_np(p["v"]), (2, 1, 0)).copy()      # (out, in, k)
    if "g" in p:
        sd[f"{prefix}.weight_v"] = v.astype(np.float32)
        sd[f"{prefix}.weight_g"] = _np(p["g"]).reshape(-1, 1, 1).astype(
            np.float32)
    else:
        sd[f"{prefix}.weight"] = v.astype(np.float32)
    sd[f"{prefix}.bias"] = _np(p["b"]).astype(np.float32)


def _deconv1_sd(p, prefix, sd):
    """Our flipped forward conv (wn_dim='in') → stride-1 ConvTranspose1d."""
    v = _np(p["v"])[::-1]                                 # undo kernel flip
    wv = np.transpose(v, (1, 2, 0)).copy()                # (in, out, k)
    if "g" in p:
        sd[f"{prefix}.weight_v"] = wv.astype(np.float32)
        sd[f"{prefix}.weight_g"] = _np(p["g"]).reshape(-1, 1, 1).astype(
            np.float32)
    else:
        sd[f"{prefix}.weight"] = wv.astype(np.float32)
    sd[f"{prefix}.bias"] = _np(p["b"]).astype(np.float32)


def _deconvs_sd(p, prefix, sd):
    """Our WNConvTranspose1d (strided; no flip in the param layout)."""
    wv = np.transpose(_np(p["v"]), (1, 2, 0)).copy()      # (in, out, k)
    if "g" in p:
        sd[f"{prefix}.weight_v"] = wv.astype(np.float32)
        sd[f"{prefix}.weight_g"] = _np(p["g"]).reshape(-1, 1, 1).astype(
            np.float32)
    else:
        sd[f"{prefix}.weight"] = wv.astype(np.float32)
    sd[f"{prefix}.bias"] = _np(p["b"]).astype(np.float32)


def _norm_sd(p, prefix, sd):
    sd[f"{prefix}.weight"] = _np(p["scale"]).astype(np.float32)
    sd[f"{prefix}.bias"] = _np(p["bias"]).astype(np.float32)


def _dense_sd(p, prefix, sd):
    sd[f"{prefix}.weight"] = _np(p["kernel"]).T.copy().astype(np.float32)
    sd[f"{prefix}.bias"] = _np(p["bias"]).astype(np.float32)


def _encoder_sd(tree, prefix, enc_arch, sd, z_proj_name=None):
    """Inverse of torch_convert._encoder_tree (Sequential index layout)."""
    stacks = enc_arch.get("stacks", [3])
    stack_layers = enc_arch.get("stack_layers", 2)
    seq = 0
    for i, n_stack in enumerate(stacks):
        _conv_sd(tree[f"conv_{i}"], f"{prefix}.encode.{seq}", sd)
        seq += 1
        for j in range(n_stack):
            blk = tree[f"stack_{i}_{j}"]
            base = f"{prefix}.encode.{seq}"
            for l in range(stack_layers):
                _conv_sd(blk[f"conv_{l}"], f"{base}.stack.{3*l+1}", sd)
                _norm_sd(blk[f"norm_{l}"], f"{base}.stack.{3*l+2}", sd)
            _conv_sd(blk["skip"], f"{base}.skip_layer", sd)
            seq += 1
        seq += 1  # LeakyReLU
    if z_proj_name:
        _conv_sd(tree["proj"], f"{prefix}.{z_proj_name}", sd)
    else:
        _conv_sd(tree["proj"], f"{prefix}.encode.{seq}", sd)


def _decoder_sd(tree, prefix, dec_arch, sd):
    """Inverse of torch_convert._decoder_tree (ModuleList layout)."""
    d_stacks = dec_arch.get("stacks", [3])
    upsample = dec_arch.get("upsample_scales", [1] * len(d_stacks))
    li = 0
    for i, (n_stack, us) in enumerate(zip(d_stacks, upsample)):
        base = f"{prefix}.layers.{li}"
        (_deconv1_sd if us == 1 else _deconvs_sd)(tree[f"up_{i}"], base, sd)
        li += 1
        for j in range(n_stack):
            blk = tree[f"stack_{i}_{j}"]
            base = f"{prefix}.layers.{li}"
            _deconv1_sd(blk["conv_in"], f"{base}.conv_in", sd)
            _norm_sd(blk["norm"], f"{base}.norm_layer", sd)
            _conv_sd(blk["res_skip"], f"{base}.res_skip_layers", sd)
            if "conv_cond" in blk:
                _conv_sd(blk["conv_cond"], f"{base}.conv_cond", sd)
            li += 1
    _conv_sd(tree["final_0"], f"{prefix}.final_layer.1", sd)
    _conv_sd(tree["final_1"], f"{prefix}.final_layer.3", sd)


def _ema_sd(state, prefix, sd):
    """EmaVqState (or its state-dict) → reference EMA quantizer buffers."""
    get = (state.get if isinstance(state, dict)
           else lambda k: getattr(state, k))
    sd[f"{prefix}.emb_init"] = np.asarray(get("initted"), bool).reshape(())
    sd[f"{prefix}.embeddings"] = _np(get("emb")).astype(np.float32)
    sd[f"{prefix}.emb_sum"] = _np(get("emb_sum")).astype(np.float32)
    sd[f"{prefix}.emb_elem"] = _np(get("emb_elem")).astype(np.float32)


def _gst_sd(tree, prefix, sd):
    sd[f"{prefix}.gst_embs"] = _np(tree["gst_embs"]).astype(np.float32)
    for n in ("linear_q", "linear_k", "linear_v", "linear_out"):
        _dense_sd(tree["mha"][n], f"{prefix}.mha.{n}", sd)


def export_flat_vqvae(params, ema, config):
    """Our flat-VQVAE (params, ema-collection) → reference state_dict."""
    sd = {}
    _encoder_sd(params["encoder"], "encoder", config.get("encoder", {}), sd)
    _decoder_sd(params["decoder"], "decoder", config.get("decoder", {}), sd)
    sd["embeds._embedding.weight"] = _np(
        params["embeds"]["embedding"]).astype(np.float32)
    if config.get("use_ema", False):
        _ema_sd(ema["quantizer"], "quantizer", sd)
    else:
        sd["quantizer.embeddings"] = _np(
            params["quantizer_embedding"]).astype(np.float32)
    return sd


def export_vqvae2_family(params, ema, config):
    """Our vqvae2 / vqvae2a / vqvae2b trees → reference state_dict."""
    model_type = config.get("model_type", "vae_npvc.model.vqvae2")
    short = model_type.split(":")[0].rsplit(".", 1)[-1]
    levels = config.get("levels", 3)
    use_gst = config.get("use_gst", True) if (levels > 1 or short == "vqvae2") \
        else False
    use_ema = config.get("use_ema", True)
    use_quantizers = config.get("use_quantizers", True) \
        if short == "vqvae2a" else True
    use_embeds = config.get("use_embeds", True) if short == "vqvae2a" else True

    sd = {}
    for i in range(levels):
        _encoder_sd(params[f"encoder_{i}"], f"encoders.{i}",
                    config[f"encoder.{i}"], sd, z_proj_name="z_proj")
        _decoder_sd(params[f"decoder_{i}"], f"decoders.{i}",
                    config[f"decoder.{i}"], sd)
    if short == "vqvae2b":
        _decoder_sd(params["final_decoder"], "final_decoder",
                    config["final_decoder"], sd)

    if short == "vqvae2":
        sd["embeds._embedding.weight"] = _np(
            params["embeds"]["embedding"]).astype(np.float32)
    elif short == "vqvae2b" or (short == "vqvae2a" and use_embeds):
        for i in range(levels):
            sd[f"embeds.{i}._embedding.weight"] = _np(
                params[f"embeds_{i}"]["embedding"]).astype(np.float32)
    else:
        sd["embed._embedding.weight"] = _np(
            params["embed"]["embedding"]).astype(np.float32)

    if not use_quantizers:  # shared quantizer (vqvae2a)
        if use_ema:
            _ema_sd(ema["quantizer"], "quantizer", sd)
        else:
            sd["quantizer.embeddings"] = _np(
                params["quantizer_embedding"]).astype(np.float32)
    else:
        for i in range(levels):
            if use_gst and i == levels - 1:
                _gst_sd(params["gst"], f"quantizers.{i}", sd)
            elif use_ema:
                _ema_sd(ema[f"quantizer_{i}"], f"quantizers.{i}", sd)
            else:
                sd[f"quantizers.{i}.embeddings"] = _np(
                    params[f"quantizer_embedding_{i}"]).astype(np.float32)
    return sd


def export_checkpoint_file(our_ckpt_path, config, out_path):
    """Full pipeline: our msgpack checkpoint → reference torch .pt file.

    Old (pre-wn-axis-format-2) checkpoints are migrated in memory first
    (utils/migrate.py) so the exported (g, v) always use the torch axis
    convention.
    """
    import torch
    from flax import serialization

    with open(our_ckpt_path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    from .migrate import maybe_migrate_model
    model_tree, _ = maybe_migrate_model(payload, payload["model"])
    ema_tree = payload.get("ema", {}).get("ema", payload.get("ema", {}))

    short = config.get("model_type", "vae_npvc.model.vqvae").split(":")[0] \
        .rsplit(".", 1)[-1]
    if short in ("vqvae2", "vqvae2a", "vqvae2b"):
        sd = export_vqvae2_family(model_tree, ema_tree, config)
    else:
        sd = export_flat_vqvae(model_tree, ema_tree, config)
    state = {k: torch.from_numpy(np.ascontiguousarray(v)) if v.ndim else
             torch.tensor(v.item()) for k, v in sd.items()}
    if "quantizer.emb_init" in state:
        state["quantizer.emb_init"] = state["quantizer.emb_init"].bool()
    for k in list(state):
        if k.endswith(".emb_init"):
            state[k] = state[k].bool()
    torch.save({"model": state, "iteration": int(payload.get("iteration", 0))},
               out_path)
    return int(payload.get("iteration", 0))
