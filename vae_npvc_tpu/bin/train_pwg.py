"""Neural-vocoder (Parallel WaveGAN) training CLI.

Trains the in-framework PWG-style vocoder (models/pwg.py, train/pwg.py) on a
Kaldi data dir's ``wav.scp`` — the native replacement for the external
``parallel_wavegan`` package the reference's ``voc=PWG`` path presumes
(reference: egs/vcc20/vae1/run.sh:192-239). Mel features are extracted on
the fly with the experiment's fbank parameters so training and the VC
pipeline's denormalized decode mels share one definition.

Usage:
    python -m vae_npvc_tpu.bin.train_pwg -c conf/train_pwg.yaml \
        --train_dir data/train --output_dir exp/pwg
"""

from __future__ import annotations

import argparse
import time
from pathlib import Path

import numpy as np
import yaml

from .train import get_logger


def train(args):
    import jax

    from ..data.wav_mel import WavMelDataset
    from ..train.pwg import PwgTrainer

    config = yaml.safe_load(open(args.config))
    max_iter = config.get("max_iter", 100000)
    iters_per_checkpoint = config.get("iters_per_checkpoint", 10000)
    iters_per_log = config.get("iters_per_log", 500)
    batch_size = config.get("batch_size", 8)

    output_dir = Path(args.output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    logger = get_logger(output_dir)

    dataset = WavMelDataset(args.train_dir, config)
    logger.info(f"PWG vocoder training: {len(dataset)} utterances, "
                f"segment {dataset.max_frames} frames x hop {dataset.hop}")

    trainer = PwgTrainer(config)
    batches = dataset.batches(batch_size, seed=config.get("seed", 777))
    first = next(batches)
    trainer.init_state(first)

    # auto-resume: with no explicit --checkpoint, pick up the newest iter.N
    # in the output dir (preemption recovery, like the main trainer's
    # --checkpoint auto) so an interrupted 400k-step run never restarts
    # from scratch
    ckpt = args.checkpoint
    if not ckpt:
        iters = sorted(output_dir.glob("iter.*"),
                       key=lambda p: int(p.name.split(".")[1]))
        if iters:
            ckpt = str(iters[-1])
    iteration = 0
    if ckpt:
        iteration = trainer.load_checkpoint(ckpt)
        logger.info(f"Resumed from {ckpt} (iteration {iteration})")

    # K optimizer steps per device dispatch (lax.scan inside one jit call);
    # on a remote/tunneled backend the per-call round-trip dominates this
    # small step's compute, so K>1 is the throughput lever
    steps_per_call = max(1, config.get("steps_per_call", 1))

    # device-resident corpus: stage all (wav, mel) arrays into HBM once and
    # sample crops inside the jitted scan — zero per-step host->device
    # traffic. auto = on when the corpus is preloaded and fits comfortably.
    dev_res = config.get("device_resident", "auto")
    want_dev = dev_res in ("auto", True, "true")
    use_dev = dataset.preload and want_dev
    if want_dev and not dataset.preload:
        logger.warning("device_resident requested but the corpus exceeds "
                       "preload_limit (lazy mode) — falling back to the "
                       "host-dispatch path")
    if use_dev and dev_res == "auto":
        use_dev = (dataset.padded_nbytes()
                   < config.get("device_resident_limit_bytes", 4 << 30))
    if use_dev:
        nbytes = trainer.stage_dataset(dataset, batch_size)
        logger.info(f"Device-resident corpus: {nbytes / 1e6:.0f} MB staged "
                    f"to HBM; in-scan crop sampling")

    if iteration >= max_iter:
        # finished run re-invoked (e.g. a recipe stage rerun): nothing to
        # train, and model.final must stay byte-identical
        logger.info(f"Already at iteration {iteration} >= max_iter "
                    f"{max_iter}; nothing to do")
        if not (output_dir / "model.final").exists():
            trainer.save_checkpoint(output_dir / "model.final")
        return

    running: dict = {}
    t0 = time.time()
    while iteration < max_iter:
        # full-K chunks compile ONE executable; only a trailing remainder
        # (max_iter % K != 0) costs a second compile at the very end
        K = min(steps_per_call, max_iter - iteration)
        if use_dev:
            detail = trainer.train_steps_device(K)
        else:
            detail = trainer.train_steps([next(batches) for _ in range(K)])
        for k, v in detail.items():
            # keep K with each call's mean: the trailing remainder call is a
            # smaller K, so the window mean must be K-weighted to be exact
            running.setdefault(k, []).append((v, K))
        logged = iteration // iters_per_log
        saved = iteration // iters_per_checkpoint
        iteration += K
        if iteration // iters_per_log > logged:
            host = {k: float(sum(np.mean(jax.device_get(x)) * kk
                                 for x, kk in vs)
                             / sum(kk for _, kk in vs))
                    for k, vs in running.items()}
            running.clear()
            msg = "  ".join(f"{k}: {v:.6f}" for k, v in sorted(host.items()))
            logger.info(f"Iter {iteration}:  {msg}  |  "
                        f"{time.time() - t0:.1f}s")
            t0 = time.time()
        if iteration // iters_per_checkpoint > saved:
            path = output_dir / f"iter.{iteration}"
            trainer.save_checkpoint(path)
            logger.info(f"Saved checkpoint to {path}")
    trainer.save_checkpoint(output_dir / "model.final")
    logger.info("Finished")


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("-c", "--config", type=str, required=True)
    parser.add_argument("--train_dir", type=str, required=True,
                        help="Kaldi data dir (or wav.scp) with the training "
                             "waveforms")
    parser.add_argument("--output_dir", type=str, required=True)
    parser.add_argument("--checkpoint", type=str, default=None)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    train(args)


if __name__ == "__main__":
    main()
