"""Per-family train-step benchmark on the real TPU chip (VERDICT r2 item 2).

Measures every trainable model family at its flagship shape: ms/step,
mel-frames/s, and MFU from the XLA-compiled step's own FLOP count
(``compiled.cost_analysis()['flops']``) against the v5e bf16 peak
(197 TFLOP/s). The flat family's shape is the reference's
train_pytorch_vqvae.yaml (batch 128 x 256 x 80); vqvae2 is our shipped
egs/vcc20/vae2/conf/train_vqvae2.yaml (batch 96 x 256 x 80, 3 levels + GST,
mirroring the reference's train_pytorch_vqvae2.yaml); vqvae2a/2b have no
reference-shipped config, so they run width-512/z-128 3-level analogs of the
vqvae2 shape (documented as such); token_tts runs the aishell3 conv and
transformer YAML configs (batch 32, 160 mels).

Usage (TPU):
  PYTHONPATH=/root/repo:/root/.axon_site python tools/perf_families.py \
      [--families flat,vqvae2,...] [--out PROFILE_families.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

PEAK_BF16 = 197e12  # v5e bf16 peak (PROFILE.md)


def _enc(in_ch, ds, stacks, width=512, z=128):
    return {"in_channels": [in_ch] * len(ds) if isinstance(ds, list)
            else [in_ch],
            "out_channels": [width] * (len(ds) if isinstance(ds, list)
                                       else 1),
            "kernel_size": 3,
            "downsample_scales": ds if isinstance(ds, list) else [ds],
            "z_channels": z, "dilation": False, "stack_kernel_size": 3,
            "stack_layers": 1,
            "stacks": stacks if isinstance(stacks, list) else [stacks],
            "use_weight_norm": True}


def _dec(in_ch, cond, final, stacks=3, width=512, us=None):
    n = len(stacks) if isinstance(stacks, list) else 1
    return {"in_channels": [in_ch] * n, "out_channels": [width] * n,
            "cond_channels": cond, "skip_channels": 128,
            "final_channels": final, "kernel_size": 3,
            "upsample_scales": us or [1] * n, "dilation": False,
            "stack_kernel_size": 3,
            "stacks": stacks if isinstance(stacks, list) else [stacks],
            "use_weight_norm": True}


def _yaml(path):
    import yaml
    return yaml.safe_load(open(path))


ROOT = Path(__file__).resolve().parents[1]


def mel_batch(B, T, D, y_num, seed=0):
    rng = np.random.default_rng(seed)
    return (rng.normal(size=(B, T, D)).astype(np.float32),
            rng.integers(0, y_num, size=(B,)).astype(np.int32))


def tts_batch(B, Ttok, Tmel, D, y_num, token_num, seed=0):
    rng = np.random.default_rng(seed)
    dur = np.full((B, Ttok), Tmel // Ttok, np.int32)
    dur[:, -1] += Tmel - dur.sum(axis=1)
    return (rng.integers(0, token_num, size=(B, Ttok)).astype(np.int32),
            dur,
            rng.normal(size=(B, Tmel, D)).astype(np.float32),
            rng.integers(0, y_num, size=(B,)).astype(np.int32),
            np.full((B,), Ttok, np.int32),
            np.full((B,), Tmel, np.int32))


def families():
    from __graft_entry__ import _flagship_config

    flat = _flagship_config()
    vq2 = _yaml(ROOT / "egs/vcc20/vae2/conf/train_vqvae2.yaml")
    vq2["compute_dtype"] = "bfloat16"

    # vqvae2a cascade at the vqvae2 shape (no reference-shipped config)
    vq2a = {
        "model_type": "vae_npvc.model.vqvae2a", "compute_dtype": "bfloat16",
        "levels": 3, "y_dim": 128, "y_num": 117, "beta": 0.01,
        "use_gst": True, "use_ema": False, "jitter_p": 0.0,
        "use_quantizers": True, "use_embeds": True,
        "encoder.0": _enc(80, 1, 6),
        "encoder.1": _enc(512, [2, 2], [3, 3]),
        "encoder.2": _enc(512, [2, 2], [3, 3]),
        # cascade upsampling between levels is internal (nearest_upsample in
        # _decode_cascade); decoders keep us=[1] like the test/toy configs
        "decoder.2": _dec(256, 128, 128, 3),
        "decoder.1": _dec(256, 128, 128, 3),
        "decoder.0": _dec(256, 128, 80, 6),
        "quantizer.0": {"z_dim": 128, "z_num": 512, "normalize": True},
        "quantizer.1": {"z_dim": 128, "z_num": 512, "normalize": True},
        "quantizer.2": {"ref_embed_dim": 128, "gst_tokens": 10,
                        "gst_token_dim": 256, "gst_heads": 4},
        "optim_type": "Adam", "learning_rate": 1e-3, "max_grad_norm": 10,
    }
    # vqvae2b independent decoders + fusion at the same shape
    vq2b = {
        "model_type": "vae_npvc.model.vqvae2b", "compute_dtype": "bfloat16",
        "levels": 3, "y_dim": 128, "y_num": 117, "beta": 0.01,
        "use_gst": False, "use_ema": False, "jitter_p": 0.0,
        "pooling_last": False,
        "encoder.0": _enc(80, 1, 6),
        "encoder.1": _enc(512, [2, 2], [3, 3]),
        "encoder.2": _enc(512, [2, 2], [3, 3]),
        "decoder.0": _dec(128, 128, 128, 3),
        "decoder.1": _dec(128, 128, 128, 3),
        "decoder.2": _dec(128, 128, 128, 3),
        "final_decoder": _dec(384, 0, 80, 3),
        "quantizer.0": {"z_dim": 128, "z_num": 512, "normalize": True},
        "quantizer.1": {"z_dim": 128, "z_num": 512, "normalize": True},
        "quantizer.2": {"z_dim": 128, "z_num": 512, "normalize": True},
        "optim_type": "Adam", "learning_rate": 1e-3, "max_grad_norm": 10,
    }
    tts_c = _yaml(ROOT / "egs/aishell3/vc2/conf/train_token_tts.yaml")
    tts_t = _yaml(ROOT / "egs/aishell3/vc2/conf/train_token_tts_transformer.yaml")
    tts_a = _yaml(ROOT / "egs/aishell3/vc2/conf/train_token_tts_tacotron2.yaml")
    for c in (tts_c, tts_t, tts_a):
        c["compute_dtype"] = "bfloat16"

    return {
        "flat": (flat, lambda: mel_batch(128, 256, 80, 117)),
        "vqvae2": (vq2, lambda: mel_batch(96, 256, 80, vq2.get("y_num", 117))),
        "vqvae2a": (vq2a, lambda: mel_batch(96, 256, 80, 117)),
        "vqvae2b": (vq2b, lambda: mel_batch(96, 256, 80, 117)),
        "token_tts_conv": (tts_c, lambda: tts_batch(
            32, 128, 512, tts_c.get("mel_dim", 160), tts_c.get("y_num"),
            tts_c.get("token_num", 128))),
        "token_tts_transformer": (tts_t, lambda: tts_batch(
            32, 128, 512, tts_t.get("mel_dim", 160), tts_t.get("y_num"),
            tts_t.get("token_num", 128))),
        # same config with the fused Pallas attention core disabled — the
        # A/B row for ops/attention_pallas.py
        "token_tts_transformer_stock": (
            dict(tts_t, fused_attention="never"), lambda: tts_batch(
                32, 128, 512, tts_t.get("mel_dim", 160), tts_t.get("y_num"),
                tts_t.get("token_num", 128))),
        # AR attention family: same batch shape; durations in the batch are
        # ignored by the tacotron2 loss path (alignment is learned)
        "token_tts_tacotron2": (tts_a, lambda: tts_batch(
            32, 128, 512, tts_a.get("mel_dim", 160), tts_a.get("y_num"),
            tts_a.get("token_num", 128))),
        # same configs with the (default-off) fused Pallas GroupNorm(+GLU)
        # kernel forced ON (ops/groupnorm_pallas.set_enabled) — the A/B rows
        # that measured it as a regression and set the default
        "flat_gn_fused": (flat, lambda: mel_batch(128, 256, 80, 117)),
        "vqvae2_gn_fused": (vq2, lambda: mel_batch(
            96, 256, 80, vq2.get("y_num", 117))),
    }


def bench(name, config, make_batch, steps=20, scan_k=0, dev_res_k=0,
          accum_k=0):
    import jax

    from vae_npvc_tpu.train.trainer import Trainer

    if accum_k:
        config = dict(config, grad_accum=accum_k)
    trainer = Trainer(config)
    batch = make_batch()
    trainer.init_state(batch)
    dev_batch = trainer.shard_batch(batch)

    # mel-frame count for throughput: token-TTS batches carry the mel matrix
    # at index 2 — the SAME derivation as the base rows, so A/B rows are
    # directly comparable
    B = np.asarray(batch[0]).shape[0]
    T = (np.asarray(batch[2]).shape[1] if len(batch) > 2
         and np.asarray(batch[2]).ndim == 3 else np.asarray(batch[0]).shape[1])

    if accum_k:
        # gradient-accumulation A/B: ms/step + peak HBM vs the plain step —
        # the memory claim (peak activations ~1/k) made measurable. The
        # trainer dispatches through _step = _train_step_accum here.
        from tools._measure import time_steps
        sec, _ = time_steps(
            lambda: trainer.train_step(dev_batch),
            lambda d: float(d["Total"]), steps)
        peak = None
        try:
            stats = jax.devices()[0].memory_stats()
            peak = int(stats.get("peak_bytes_in_use", 0))
        except Exception:
            pass
        row = {"family": f"{name}_accum{accum_k}",
               "ms_per_step": round(sec * 1e3, 2),
               "frames_per_s": round(B * T / sec),
               "grad_accum": accum_k,
               "peak_hbm_mb": round(peak / 1e6) if peak else None}
        print(json.dumps(row), flush=True)
        return row

    if scan_k:
        # K-steps-per-dispatch A/B (Trainer.train_steps lax.scan): quantifies
        # the per-call dispatch overhead the scan amortizes on the tunneled
        # backend. Batches staged once; ms/step = per-call wall / K.
        from tools._measure import time_steps
        stacked = trainer.shard_batches([batch] * scan_k)
        sec_call, _ = time_steps(
            lambda: trainer.train_steps(stacked),
            lambda d: float(np.asarray(d["Total"])[-1]), steps)
        ms = sec_call / scan_k * 1e3
        row = {"family": f"{name}_scan{scan_k}", "ms_per_step": round(ms, 2),
               "frames_per_s": round(B * T / ms * 1e3),
               "steps_per_call": scan_k}
        print(json.dumps(row), flush=True)
        return row

    if dev_res_k:
        # device-resident A/B: synthetic corpus staged to HBM, crops sampled
        # inside the K-step scan (Trainer.train_steps_device) — the
        # production path for `device_resident: true` + `steps_per_call: K`.
        # Only the (feats, spks) mel families have a device-resident path.
        if len(batch) != 2:
            row = {"family": f"{name}_devres{dev_res_k}",
                   "skipped": "device_resident is mel-corpus only"}
            print(json.dumps(row), flush=True)
            return row
        from tools._measure import time_steps
        D = np.asarray(batch[0]).shape[2]
        rng = np.random.default_rng(0)
        N, M = 512, max(400, T)

        class _SynthCorpus:
            crop_length = T

            def padded_arrays(self, num_workers=0):
                return (rng.normal(size=(N, M, D)).astype(np.float32),
                        rng.integers(T, M + 1, size=(N,)).astype(np.int32),
                        rng.integers(0, config.get("y_num", 117),
                                     size=(N,)).astype(np.int32))

        nbytes = trainer.stage_dataset(_SynthCorpus(), batch_size=B)
        sec_call, _ = time_steps(
            lambda: trainer.train_steps_device(dev_res_k),
            lambda d: float(np.asarray(d["Total"])[-1]), steps)
        ms = sec_call / dev_res_k * 1e3
        row = {"family": f"{name}_devres{dev_res_k}",
               "ms_per_step": round(ms, 2),
               "frames_per_s": round(B * T / ms * 1e3),
               "steps_per_call": dev_res_k,
               "staged_mb": round(nbytes / 1e6)}
        print(json.dumps(row), flush=True)
        return row

    # AOT-compile the exact step ONCE and reuse the executable for both
    # cost_analysis and the timed run — jit dispatch does not share the AOT
    # compile cache, so executing via trainer.train_step would compile every
    # family a second time (minutes each at flagship shapes, and double the
    # exposure to the mid-compile tunnel-wedge hazard, CLAUDE.md)
    step = trainer._get_compiled("train", trainer._train_step, donate=(0,))
    flops, compiled = 0.0, None
    try:
        compiled = step.lower(trainer.state, tuple(dev_batch),
                              trainer.base_rng).compile()
        cost = compiled.cost_analysis()
        if isinstance(cost, list):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
    except Exception as e:  # AOT path is best-effort per backend
        print(f"  AOT compile/cost_analysis failed: {e}")

    from tools._measure import time_steps
    if compiled is not None:
        box = {"state": trainer.state}  # chained through donated calls

        def step_fn():
            box["state"], detail = compiled(box["state"], tuple(dev_batch),
                                            trainer.base_rng)
            return detail
    else:  # fallback: jit dispatch path
        def step_fn():
            return trainer.train_step(dev_batch)
    sec, _ = time_steps(step_fn, lambda d: float(d["Total"]), steps)
    ms = sec * 1e3

    frames = B * T
    tflops = flops / (ms * 1e-3) / 1e12 if flops else 0.0
    row = {"family": name, "ms_per_step": round(ms, 2),
           "frames_per_s": round(frames / ms * 1e3),
           "step_gflop": round(flops / 1e9, 1) if flops else None,
           "tflops": round(tflops, 1) if flops else None,
           "mfu_pct": round(100 * tflops * 1e12 / PEAK_BF16, 1)
           if flops else None}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--families", type=str, default=None)
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--scan_k", type=int, default=0,
                    help="time Trainer.train_steps with K steps per dispatch "
                         "instead of per-step dispatch (A/B row)")
    ap.add_argument("--accum_k", type=int, default=0,
                    help="grad_accum A/B: k microbatches per step, "
                         "reports ms/step + peak HBM")
    ap.add_argument("--dev_res_k", type=int, default=0,
                    help="time the device-resident path "
                         "(train_steps_device, K steps/dispatch, synthetic "
                         "HBM-staged corpus)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    fams = families()
    names = args.families.split(",") if args.families else list(fams)
    rows = []
    from vae_npvc_tpu.ops import groupnorm_pallas as gnp
    unknown = [n for n in names if n not in fams]
    if unknown:
        ap.error(f"unknown families {unknown}; available: {list(fams)}")
    for n in names:
        config, make_batch = fams[n]
        print(f"== {n}", flush=True)
        # _gn_fused rows trace with the (default-off) fused GroupNorm kernel
        # forced on; the toggle must wrap bench() because tracing happens
        # inside it
        gnp.set_enabled(True if n.endswith("_gn_fused") else None)
        try:
            rows.append(bench(n, config, make_batch, steps=args.steps,
                              scan_k=args.scan_k, dev_res_k=args.dev_res_k,
                              accum_k=args.accum_k))
        except Exception as e:  # noqa: BLE001 — one family must not kill
            import traceback     # the whole sweep (measurement tool, and
            traceback.print_exc()  # chip time is scarce behind the tunnel)
            rows.append({"family": n,
                         "error": f"{type(e).__name__}: {e}"[:500]})
        finally:
            gnp.set_enabled(None)     # restore the (stock) default
    if args.out:
        json.dump(rows, open(args.out, "w"), indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
