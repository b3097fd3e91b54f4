"""Itemized decomposition of the flagship flat-step residual (VERDICT r3 #1).

The round-3 profile leaves ~19 ms/step between the 29.9 ms compute roofline
and the measured 49 ms with two unreconciled buckets: the trace attributes
~11 ms to ``convert_reduce_fusion`` ("GroupNorm stats") while the direct GN
ablation prices GN at only ~3.8 ms, and the 13.4 ms
``multiply_reduce_fusion`` bucket fuses the dW contractions with the
global-grad-norm grad² reduce without saying whether the norm reduce
serializes dW. This tool settles both with measurements:

Wall A/Bs (recompile per variant, device→host fenced):
  baseline            the shipped step
  noclip              max_grad_norm: 0 — no global-norm reduce, no scale:
                      the FULL marginal cost of clipping incl. any dW
                      serialization
  gn_affine           GroupNorm → scale·x+bias (stats ablated)
  gn_affine+noclip    additivity check (does removing one expose the other?)
  vq_identity         EMA-VQ → straight-through identity: bounds the VQ
                      distance/EMA-reduce share of the convert_reduce bucket
  loss_sum            fp32 NLL frame-mean → bf16 sum: bounds the loss-
                      reduction share

Trace diffs (--trace): XPlane op tables for baseline / gn_affine / noclip,
aggregated by fusion-name prefix; the per-bucket deltas identify what else
lives inside ``convert_reduce_fusion.*`` beyond GN stats.

Output: one JSON line per row + an itemized table that must either sum to
the measured step within ~2 ms or point at the next lever (the VERDICT's
"done" criterion).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_decompose.py \
      [--steps 20] [--trace] [--out /tmp/onchip/decompose.json]
"""

from __future__ import annotations

import argparse
import collections
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np


def patch_gn_identity():
    import jax.numpy as jnp

    from vae_npvc_tpu.nn import blocks

    orig = blocks.group_norm

    def fake(x, scale, bias, num_groups, eps=1e-5, mask=None, seq_axis=None,
             glu=False):
        out = (x.astype(jnp.float32) * scale + bias).astype(x.dtype)
        if glu:
            import jax
            H = out.shape[-1] // 2
            out = jnp.tanh(out[..., :H]) * jax.nn.sigmoid(out[..., H:])
        return out

    blocks.group_norm = fake
    return lambda: setattr(blocks, "group_norm", orig)


def patch_vq_identity():
    """EMA-VQ → straight-through identity (zero losses, static detail).

    Removes the codebook distance matmul, the argmin, the one-hot EMA
    statistics reduces and the codebook gather — everything the VQ layer
    contributes to the step — while keeping tensor shapes identical."""
    import jax.numpy as jnp

    from vae_npvc_tpu.models import vqvae

    orig = vqvae.Model._quantize_train

    def fake(self, z, train):
        z = z.astype(jnp.float32)
        zero = jnp.zeros((), jnp.float32)
        detail = {"entropy": zero, "usage": zero, "used_curr": zero}
        return z, zero, zero, detail

    vqvae.Model._quantize_train = fake
    return lambda: setattr(vqvae.Model, "_quantize_train", orig)


def patch_loss_sum():
    """fp32 Gaussian-NLL frame-mean → plain bf16 mean of squares: bounds
    the fp32 loss-reduction (convert+reduce over (B,T,80)) share."""
    from vae_npvc_tpu.ops import losses

    orig = losses.log_loss

    def fake(xhat, x, reduction="frame_mean"):
        import jax.numpy as jnp
        d = xhat - x.astype(xhat.dtype)
        return jnp.mean(jnp.square(d)).astype(jnp.float32)

    losses.log_loss = fake
    # models import the symbol at module load (from ..ops.losses import
    # log_loss) — patch those bindings too
    from vae_npvc_tpu.models import vqvae
    had = getattr(vqvae, "log_loss", None)
    if had is not None:
        vqvae.log_loss = fake

    def undo():
        losses.log_loss = orig
        if had is not None:
            vqvae.log_loss = had
    return undo


TINY = False      # --tiny: CPU smoke of the patch machinery, not a perf run


def build(config_patch=None, patch_fn=None):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _flagship_config
    from vae_npvc_tpu.train.trainer import Trainer

    config = _flagship_config(tiny=TINY)
    config["compute_dtype"] = "bfloat16"
    if config_patch:
        config.update(config_patch)
    undo = patch_fn() if patch_fn else (lambda: None)
    trainer = Trainer(config)
    rng = np.random.default_rng(0)
    B, T, D = (8, 64, 80) if TINY else (128, 256, 80)
    batch = (rng.normal(size=(B, T, D)).astype(np.float32),
             rng.integers(0, 117, size=(B,)).astype(np.int32))
    trainer.init_state(batch)
    feats = jax.device_put(jnp.asarray(batch[0]), trainer.batch_sharding)
    spks = jax.device_put(jnp.asarray(batch[1]), trainer.batch_sharding)
    return trainer, (feats, spks), undo


VARIANTS = {
    "baseline": (None, None),
    "noclip": ({"max_grad_norm": 0}, None),
    "gn_affine": (None, patch_gn_identity),
    "gn_affine_noclip": ({"max_grad_norm": 0}, patch_gn_identity),
    "vq_identity": (None, patch_vq_identity),
    "loss_sum": (None, patch_loss_sum),
    # fwd+bwd only (grads computed and materialized, no optimizer/guard/
    # clip): baseline − this = the whole post-gradient tail
    "grads_only": (None, None),
}


def measure(name, steps):
    from tools._measure import time_steps

    cfg_patch, patch_fn = VARIANTS[name]
    trainer, dev_batch, undo = build(cfg_patch, patch_fn)
    try:
        if name == "grads_only":
            import jax
            import jax.numpy as jnp

            feats, spks = dev_batch
            state = trainer.state

            def gonly(params, ema, f, s, rng):
                def loss_fn(p):
                    variables = {"params": p, **ema}
                    (x, loss, detail), mut = trainer.model.apply(
                        variables, f, s, train=True,
                        mutable=list(ema.keys()), rngs={"vq": rng})
                    return loss, detail
                grads, detail = jax.grad(loss_fn, has_aux=True)(params)
                # reduce grads to one scalar so the fence forces every
                # gradient without a host transfer of the full tree
                gsum = sum(jnp.sum(jnp.square(g)) for g in
                           jax.tree_util.tree_leaves(grads))
                return gsum, detail["Total"]

            fn = jax.jit(gonly)
            rng = trainer.base_rng
            sec, _ = time_steps(
                lambda: fn(state.params, state.ema, feats, spks, rng),
                lambda o: float(o[0]), steps)
        else:
            sec, _ = time_steps(lambda: trainer.train_step(dev_batch),
                                lambda d: float(d["Total"]), steps)
    finally:
        undo()
    return sec * 1e3


def trace_variant(name, steps, trace_dir):
    import jax

    from tools._measure import time_steps
    from tools.profile_step import parse_trace

    cfg_patch, patch_fn = VARIANTS[name]
    trainer, dev_batch, undo = build(cfg_patch, patch_fn)
    try:
        step = lambda: trainer.train_step(dev_batch)  # noqa: E731
        fence = lambda d: float(d["Total"])  # noqa: E731
        time_steps(step, fence, steps=1, warmup=3)
        with jax.profiler.trace(trace_dir):
            time_steps(step, fence, steps, warmup=0)
    finally:
        undo()
    table = parse_trace(trace_dir, steps)
    # aggregate by fusion-name prefix (convert_reduce_fusion.123 →
    # convert_reduce_fusion) — the bucket granularity the verdict argues in
    pref = collections.Counter()
    for op, us in table["by_op"].items():
        pref[op.split(".")[0]] += us
    return pref


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--variants", default=",".join(VARIANTS))
    ap.add_argument("--trace", action="store_true",
                    help="also trace baseline/gn_affine/noclip and print "
                         "per-fusion-prefix deltas")
    ap.add_argument("--tiny", action="store_true",
                    help="toy arch on CPU — validates the patch machinery, "
                         "not a perf run")
    ap.add_argument("--out", default=None)
    args = ap.parse_args(argv)
    if args.tiny:
        global TINY
        TINY = True

    rows = {}
    for name in args.variants.split(","):
        ms = measure(name, args.steps)
        rows[name] = round(ms, 2)
        print(json.dumps({"variant": name, "ms_per_step": rows[name]}),
              flush=True)

    result = {"wall_ms": rows}
    if all(k in rows for k in
           ("baseline", "noclip", "gn_affine", "gn_affine_noclip")):
        b = rows["baseline"]
        itemized = {
            "clip_marginal_ms": round(b - rows["noclip"], 2),
            "gn_stats_marginal_ms": round(b - rows["gn_affine"], 2),
            "gn_plus_clip_joint_ms": round(b - rows["gn_affine_noclip"], 2),
        }
        if "vq_identity" in rows:
            itemized["vq_marginal_ms"] = round(b - rows["vq_identity"], 2)
        if "loss_sum" in rows:
            itemized["loss_fp32_marginal_ms"] = round(b - rows["loss_sum"],
                                                      2)
        if "grads_only" in rows:
            itemized["post_grad_tail_ms"] = round(b - rows["grads_only"],
                                                  2)
        result["itemized"] = itemized
        print(json.dumps(itemized), flush=True)

    if args.trace:
        traces = {}
        for name in ("baseline", "gn_affine", "noclip"):
            pref = trace_variant(name, args.steps,
                                 f"/tmp/vae_npvc_decomp_{name}")
            traces[name] = {k: round(v, 1) for k, v in
                            pref.most_common(15)}
        result["trace_prefix_us"] = traces
        base = collections.Counter(traces["baseline"])
        for name in ("gn_affine", "noclip"):
            delta = {k: round(base.get(k, 0) - traces[name].get(k, 0), 1)
                     for k in set(base) | set(traces[name])}
            delta = dict(sorted(delta.items(), key=lambda kv: -abs(kv[1]))
                         [:10])
            print(json.dumps({f"delta_baseline_minus_{name}_us": delta}),
                  flush=True)
            result[f"delta_{name}_us"] = delta

    if args.out:
        Path(args.out).write_text(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
