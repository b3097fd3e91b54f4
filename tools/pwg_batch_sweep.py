"""JPWG vocoder train-step throughput sweep (VERDICT r2 item 10).

PROFILE.md's dispatch study bounded the bf16 step at ~104 ms for
batch 16 x 48 mel frames and attributed it to the sequential 30-layer
64-channel stack — but never measured the two candidate levers:

- batch scaling (32/64): amortizes the per-layer dispatch/latency floor
  over more samples;
- channel padding 64->128 residual channels: fills the 128-lane MXU tile
  (at 4x the FLOPs — only a win if the step is latency- not compute-bound).

This sweep measures wall ms/step (device->host fenced; the tunneled
backend's block_until_ready does not fence) and audio samples/s for each
variant with the shipped steps_per_call=8 scan dispatch, full GAN step
(adversary active). The decision lands in conf/train_jpwg.yaml.

Usage (TPU): PYTHONPATH=/root/repo:/root/.axon_site \
    python tools/pwg_batch_sweep.py [--out /tmp/pwg_sweep.json]
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np

FRAMES = 48          # mel frames per item (PROFILE.md study shape)
HOP = 256
K = 8                # optimizer steps per dispatch (shipped steps_per_call)


def base_config(rc=64):
    return {
        "fs": 24000, "n_fft": 1024, "n_shift": HOP, "n_mels": 80,
        "layers": 30, "stacks": 3,
        "residual_channels": rc, "gate_channels": 2 * rc,
        "skip_channels": rc, "kernel_size": 3,
        "upsample_scales": [4, 4, 4, 4],
        "disc_layers": 10, "disc_channels": 64,
        "seed": 0, "lambda_adv": 4.0,
        "discriminator_train_start_steps": 0,   # steady state: D active
        "compute_dtype": "bfloat16",
        "generator_param": {"optim_type": "RAdam", "learning_rate": 1e-4},
        "discriminator_param": {"optim_type": "RAdam",
                                "learning_rate": 5e-5},
    }


def run(name, B, rc, reps=4):
    from vae_npvc_tpu.train.pwg import PwgTrainer

    trainer = PwgTrainer(base_config(rc))
    rng = np.random.default_rng(0)
    S = FRAMES * HOP
    batches = [(rng.normal(size=(B, S)).astype(np.float32) * 0.1,
                rng.normal(size=(B, FRAMES, 80)).astype(np.float32))
               for _ in range(K)]
    trainer.init_state(batches[0])
    # stage once: timed calls must not pay the per-call host->device upload
    # (~25 MB/call at B64 over the tunneled backend), which would bias the
    # batch-scaling comparison this sweep exists to make
    staged = trainer.stage_batches(batches)
    from tools._measure import time_steps
    sec_per_call, _ = time_steps(
        lambda: trainer.train_steps(staged),
        lambda d: float(np.asarray(d["Total"]).mean()), reps, warmup=1)
    ms = sec_per_call / K * 1e3
    row = {"variant": name, "batch": B, "residual_channels": rc,
           "ms_per_step": round(ms, 1),
           "samples_per_s": round(B * S / ms * 1e3),
           "ms_per_item": round(ms / B, 2)}
    print(json.dumps(row), flush=True)
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    rows = []
    for name, B, rc in [("B16_rc64 (baseline)", 16, 64),
                        ("B32_rc64", 32, 64),
                        ("B64_rc64", 64, 64),
                        ("B16_rc128", 16, 128),
                        ("B32_rc128", 32, 128)]:
        print(f"== {name}", flush=True)
        try:
            rows.append(run(name, B, rc))
        except Exception as e:  # OOM at large B is itself a result
            msg = str(e).splitlines()[0][:120]
            rows.append({"variant": name, "batch": B,
                         "residual_channels": rc, "error": msg})
            print(json.dumps(rows[-1]), flush=True)
    if args.out:
        json.dump(rows, open(args.out, "w"), indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
