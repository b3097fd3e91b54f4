"""Lockstep training-dynamics parity: the torch reference vs this rebuild.

Round-2 verdict item 1: golden tests prove converted checkpoints match on the
*forward* pass; this harness proves the rebuild reproduces the reference's
*training trajectory* — optimizer semantics (Adam(0.5, 0.999) + global-norm
clip + StepLR, reference: vae_npvc/trainer/basic.py:32-48,55-79), weight-norm
gradient geometry, plain-VQ in-forward codebook renormalization
(layers_vq.py:96-97), the EMA codebook drift (layers_vq.py:203-233), and the
`legacy_no_ste` frame_mean behavior (layers_vq.py:310-315).

Protocol, per family:
  1. seed torch, build the ACTUAL reference Trainer (model.cuda() patched to a
     no-op — torch is CPU-only here);
  2. for the EMA family, trigger the reference's data-dependent codebook init
     on batch 0 with updates disabled (init is RNG-dependent and cannot be
     replayed cross-framework, so it is *shared* via checkpoint conversion);
  3. snapshot the torch state_dict -> convert with utils/torch_convert ->
     load into our Trainer (fresh optimizer state on both sides);
  4. feed both trainers the IDENTICAL numpy batch stream, fp32, and record
     per-step Total / X like / VQ loss / grad-norm from each side;
  5. report per-step relative deltas and the end-of-run parameter agreement
     (torch params re-converted and compared leaf-by-leaf against ours).

Families:
  vq      flat model, plain VectorQuantizer (normalize=True)  — deterministic
  ema     flat model, EMAVectorQuantizer, legacy_no_ste=True (the reference's
          shipped frame_mean behavior: decoder sees the detached code)
  ema_restart  like `ema` but engineered so dead codes trigger the random
          restart path — expected/documented divergence (restart vectors are
          drawn from different RNGs)
  vqvae2  hierarchical: 2 plain-VQ levels (normalize=True) + GST top

Usage:
  python tools/lockstep_parity.py --family vq --steps 200 --out /tmp/vq.json
  python tools/lockstep_parity.py --all --steps 200 --out PARITY_lockstep.json
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

REF = "/root/reference"

# --------------------------------------------------------------------------
# configs (reference-style keys; tiny shapes so CPU fp32 lockstep is fast)
# --------------------------------------------------------------------------

def _enc(in_ch, ds=1, z=12):
    return {"in_channels": [in_ch], "out_channels": [16], "kernel_size": 3,
            "downsample_scales": [ds], "z_channels": z, "dilation": True,
            "stack_kernel_size": 3, "stack_layers": 2, "stacks": [2],
            "use_weight_norm": True}


def _dec(in_ch, cond, final):
    return {"in_channels": [in_ch], "out_channels": [16],
            "cond_channels": cond, "skip_channels": final,
            "final_channels": final, "kernel_size": 3,
            "upsample_scales": [1], "dilation": True,
            "stack_kernel_size": 3, "stacks": [2], "use_weight_norm": True}


D_IN = 10

BASE = {
    "model_type": "vae_npvc.model.vqvae",
    "y_dim": 12, "y_num": 5, "z_dim": 12, "z_num": 16,
    "beta": 0.01, "mu": 0.9, "jitter_p": 0.0,
    "encoder": _enc(D_IN),
    "decoder": _dec(12, 12, D_IN),
    # trainer keys (reference basic.py defaults)
    "optim_type": "Adam", "learning_rate": 1e-3, "max_grad_norm": 5,
    "lr_scheduler": None,
}


def family_config(family):
    cfg = {k: (dict(v) if isinstance(v, dict) else v) for k, v in BASE.items()}
    if family == "vq":
        cfg.update(use_ema=False, embed_norm=True)
    elif family == "ema":
        cfg.update(use_ema=True, legacy_no_ste=True)
    elif family == "ema_restart":
        # large codebook vs few assignments => dead codes => restarts
        cfg.update(use_ema=True, legacy_no_ste=True, z_num=64)
    elif family == "vqvae2":
        cfg = {
            "model_type": "vae_npvc.model.vqvae2",
            "levels": 3, "y_dim": 8, "y_num": 5, "beta": 0.01,
            "use_gst": True, "use_ema": False, "jitter_p": 0.0,
            "encoder.0": _enc(D_IN, 1, 8), "encoder.1": _enc(16, 2, 8),
            "encoder.2": _enc(16, 2, 8),
            "decoder.0": _dec(24, 8, D_IN), "decoder.1": _dec(8, 16, 8),
            "decoder.2": _dec(8, 8, 8),
            "quantizer.0": {"z_dim": 8, "z_num": 24, "normalize": True},
            "quantizer.1": {"z_dim": 8, "z_num": 24, "normalize": True},
            "quantizer.2": {"ref_embed_dim": 8, "gst_tokens": 4,
                            "gst_token_dim": 8, "gst_heads": 2},
            "optim_type": "Adam", "learning_rate": 1e-3, "max_grad_norm": 5,
            "lr_scheduler": None,
        }
    else:
        raise ValueError(family)
    return cfg


# --------------------------------------------------------------------------
# torch side
# --------------------------------------------------------------------------

def build_torch_trainer(cfg, seed):
    import torch
    # the reference trainer hard-pins CUDA (basic.py:28,59); run it on CPU
    torch.nn.Module.cuda = lambda self, *a, **k: self
    torch.Tensor.cuda = lambda self, *a, **k: self
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from vae_npvc.trainer import basic as ref_basic  # reference, read-only

    torch.manual_seed(seed)
    return ref_basic.Trainer(cfg)


def torch_step(trainer, feats_btd, spks):
    """One reference train step (basic.py:55-79), returning detail + grad norm."""
    import torch
    x = torch.from_numpy(np.ascontiguousarray(
        np.transpose(feats_btd, (0, 2, 1))))          # (B, D, T)
    y = torch.from_numpy(spks.astype(np.int64)).view(-1, 1)
    model, opt = trainer.model, trainer.optimizer
    assert model.training
    model.zero_grad()
    _, loss, detail = model((x, y))
    loss.backward()
    gn = torch.nn.utils.clip_grad_norm_(model.parameters(),
                                        trainer.max_grad_norm)
    opt.step()
    if trainer.scheduler is not None:
        trainer.scheduler.step()
    detail = {k: float(v) for k, v in detail.items()}
    detail["grad_norm"] = float(gn)
    return detail


def snapshot_to_ours(ref_model, cfg, path):
    import torch

    from vae_npvc_tpu.utils.torch_convert import convert_checkpoint_file
    ckpt = str(path) + ".pt"
    torch.save({"model": ref_model.state_dict(), "iteration": 0}, ckpt)
    convert_checkpoint_file(ckpt, cfg, path)


# --------------------------------------------------------------------------
# run
# --------------------------------------------------------------------------

def run_family(family, steps, seed=0, batch=8, frames=64):
    import os
    os.environ.setdefault("VAE_NPVC_JAX_PLATFORM", "cpu")
    cfg = family_config(family)
    t_trainer = build_torch_trainer(cfg, seed)

    rng = np.random.default_rng(seed + 1)
    def make_batch():
        # smooth-ish trajectories: random walks along time, like mel contours
        steps_ = rng.normal(size=(batch, frames, D_IN)).astype(np.float32)
        feats = np.cumsum(steps_ * 0.3, axis=1)
        spks = rng.integers(0, cfg["y_num"], size=(batch,))
        return feats.astype(np.float32), spks

    batches = [make_batch() for _ in range(steps)]

    if cfg.get("use_ema"):
        # trigger the reference's data-dependent init on batch 0 (no update,
        # no optimizer step), so both sides start from the SAME codebook
        import torch
        q = t_trainer.model.quantizer
        q.update = False
        with torch.no_grad():
            x = torch.from_numpy(np.ascontiguousarray(
                np.transpose(batches[0][0], (0, 2, 1))))
            y = torch.from_numpy(batches[0][1].astype(np.int64)).view(-1, 1)
            t_trainer.model((x, y))
        q.update = True
        assert bool(q.emb_init)

    import tempfile
    snap = tempfile.mktemp(suffix=".msgpack")
    snapshot_to_ours(t_trainer.model, cfg, snap)

    from vae_npvc_tpu.train.trainer import Trainer
    j_trainer = Trainer(cfg, seed=seed)
    example = (batches[0][0], batches[0][1].astype(np.int32))
    j_trainer.init_state(example)
    j_trainer.load_checkpoint(snap, example_batch=example)

    keys = ["Total", "X like", "VQ loss", "grad_norm"]
    rows = []
    for t, (feats, spks) in enumerate(batches):
        td = torch_step(t_trainer, feats, spks)
        jd = j_trainer.train_step((feats, spks.astype(np.int32)))
        jd = {k: float(v) for k, v in jd.items()}
        row = {"step": t}
        for k in keys:
            a, b = td.get(k), jd.get(k)
            if a is None or b is None:
                continue
            row[k] = {"torch": a, "ours": b,
                      "rel": abs(a - b) / max(abs(a), 1e-12)}
        if "usage" in td:
            row["usage_torch"] = td["usage"]
            row["usage_ours"] = jd.get("usage")
        rows.append(row)

    # end-of-run parameter agreement: re-convert torch params, diff vs ours
    import jax
    from flax import serialization
    snap2 = tempfile.mktemp(suffix=".msgpack")
    snapshot_to_ours(t_trainer.model, cfg, snap2)
    with open(snap2, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    ours = jax.device_get(j_trainer.state.params)
    theirs = serialization.from_state_dict(ours, payload["model"])
    flat_o = jax.tree_util.tree_leaves_with_path(ours)
    flat_t = jax.tree_util.tree_leaves(theirs)
    param_rel = {}
    for (path, o), th in zip(flat_o, flat_t):
        name = jax.tree_util.keystr(path)
        denom = max(float(np.max(np.abs(th))), 1e-12)
        param_rel[name] = float(np.max(np.abs(np.asarray(o) - np.asarray(th)))
                                / denom)
    # EMA collections too
    ema_rel = {}
    if payload.get("ema"):
        ours_e = jax.device_get(j_trainer.state.ema)
        theirs_e = serialization.from_state_dict(ours_e, payload["ema"])
        for (path, o), th in zip(jax.tree_util.tree_leaves_with_path(ours_e),
                                 jax.tree_util.tree_leaves(theirs_e)):
            o, th = np.asarray(o), np.asarray(th)
            if o.dtype == np.bool_:  # the EMA `initted` flag
                ema_rel[jax.tree_util.keystr(path)] = float(
                    np.any(o != th))
                continue
            denom = max(float(np.max(np.abs(th))), 1e-12)
            ema_rel[jax.tree_util.keystr(path)] = float(
                np.max(np.abs(o - th.astype(o.dtype))) / denom)

    summary = {
        "family": family, "steps": steps,
        "max_rel": {k: max(r[k]["rel"] for r in rows if k in r)
                    for k in keys},
        "final_rel": {k: rows[-1][k]["rel"] for k in keys if k in rows[-1]},
        "param_max_rel": max(param_rel.values()),
        "param_worst": max(param_rel, key=param_rel.get),
        "ema_max_rel": max(ema_rel.values()) if ema_rel else None,
    }
    return summary, rows


def run_chaos(family, steps, seed=0, batch=8, frames=64, eps=1e-7):
    """Control experiment: torch reference vs ITSELF with params perturbed by
    multiplicative ``eps`` noise, same batch stream. Quantifies the inherent
    chaotic divergence of VQ training (discrete nearest-code assignments
    amplify rounding-level differences), giving the scale against which the
    cross-framework deltas of run_family should be judged."""
    import torch
    cfg = family_config(family)
    ta = build_torch_trainer(cfg, seed)
    tb = build_torch_trainer(cfg, seed)
    # bypass the models' load_state_dict overrides (vqvae2's references a
    # nonexistent self.use_ema — reference vqvae2.py:160, another of its
    # known load-path bugs)
    torch.nn.Module.load_state_dict(
        tb.model, {k: v.clone() for k, v in ta.model.state_dict().items()})

    rng = np.random.default_rng(seed + 1)
    def make_batch():
        steps_ = rng.normal(size=(batch, frames, D_IN)).astype(np.float32)
        feats = np.cumsum(steps_ * 0.3, axis=1)
        spks = rng.integers(0, cfg["y_num"], size=(batch,))
        return feats.astype(np.float32), spks
    batches = [make_batch() for _ in range(steps)]

    if cfg.get("use_ema"):
        for tr in (ta, tb):
            q = tr.model.quantizer
            q.update = False
            with torch.no_grad():
                x = torch.from_numpy(np.ascontiguousarray(
                    np.transpose(batches[0][0], (0, 2, 1))))
                y = torch.from_numpy(
                    batches[0][1].astype(np.int64)).view(-1, 1)
                tr.model((x, y))
            q.update = True
        # identical codebooks (init RNG differs between the two constructions)
        tb.model.quantizer.load_state_dict(ta.model.quantizer.state_dict())

    gen = torch.Generator().manual_seed(seed + 99)
    with torch.no_grad():
        for p in tb.model.parameters():
            p.mul_(1.0 + eps * torch.randn(p.shape, generator=gen))

    keys = ["Total", "X like", "VQ loss", "grad_norm"]
    rows = []
    for t, (feats, spks) in enumerate(batches):
        da = torch_step(ta, feats, spks)
        db = torch_step(tb, feats, spks)
        row = {"step": t}
        for k in keys:
            if k in da and k in db:
                row[k] = {"torch": da[k], "ours": db[k],
                          "rel": abs(da[k] - db[k]) / max(abs(da[k]), 1e-12)}
        rows.append(row)
    sa = {k: v.detach().numpy() for k, v in ta.model.state_dict().items()}
    sb = {k: v.detach().numpy() for k, v in tb.model.state_dict().items()}
    param_rel = {}
    for k in sa:
        if sa[k].dtype == np.bool_ or sa[k].size == 0:
            continue
        denom = max(float(np.max(np.abs(sa[k]))), 1e-12)
        param_rel[k] = float(np.max(np.abs(sa[k] - sb[k])) / denom)
    summary = {
        "family": f"{family}+chaos(eps={eps})", "steps": steps,
        "max_rel": {k: max(r[k]["rel"] for r in rows if k in r)
                    for k in keys},
        "final_rel": {k: rows[-1][k]["rel"] for k in keys if k in rows[-1]},
        "param_max_rel": max(param_rel.values()),
        "param_worst": max(param_rel, key=param_rel.get),
        "ema_max_rel": None,
    }
    return summary, rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", choices=["vq", "ema", "ema_restart", "vqvae2"])
    ap.add_argument("--all", action="store_true")
    ap.add_argument("--steps", type=int, default=200)
    ap.add_argument("--out", type=str, default=None)
    ap.add_argument("--trace", action="store_true",
                    help="include per-step rows in the JSON output")
    ap.add_argument("--chaos", action="store_true",
                    help="run the torch-vs-perturbed-torch control instead")
    args = ap.parse_args()

    fams = (["vq", "ema", "ema_restart", "vqvae2"] if args.all
            else [args.family or "vq"])
    out = {}
    for fam in fams:
        run = run_chaos if args.chaos else run_family
        summary, rows = run(fam, args.steps)
        out[fam] = dict(summary)
        if args.trace:
            out[fam]["rows"] = rows
        print(json.dumps(summary, indent=2))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
