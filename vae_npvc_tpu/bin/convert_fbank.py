"""Griffin-Lim synthesis CLI: log-mel feature arks → wav files.

Replaces the reference's external ESPnet ``convert_fbank.sh`` Griffin-Lim
stage (reference: egs/vcc20/vae1/run.sh:177-190; SURVEY.md §2.3) with the
in-framework JAX Griffin-Lim (data/features.py): utterances are length-
bucketed and phase-recovered in batches on the accelerator.

Usage:
    python -m vae_npvc_tpu.bin.convert_fbank --fs 24000 --n_fft 1024 \
        --n_shift 256 --n_mels 80 --fmin 80 --fmax 7600 --iters 64 \
        decode_denorm/feats.scp decode_denorm/wav
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def convert_fbank(feats_scp, out_dir, *, fs, n_fft, n_shift, n_mels=80,
                  fmin=None, fmax=None, win_length=None, n_iter=64,
                  batch_size=4):
    import jax.numpy as jnp
    from scipy.io import wavfile

    from ..data import kaldi_io
    from ..data.features import griffin_lim

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    items = [(u, kaldi_io.load_mat(rx))
             for u, rx in kaldi_io.read_scp(feats_scp).items()]
    if items and items[0][1].shape[1] != n_mels:
        raise ValueError(
            f"--n_mels {n_mels} does not match the features' mel dim "
            f"{items[0][1].shape[1]} ({feats_scp}) — pass the SAME feature "
            "flags (fs/n_fft/n_shift/n_mels) the extraction stage used")

    # bucket by padded frame count
    buckets: dict[int, list] = {}
    for utt, mel in items:
        T_pad = -(-mel.shape[0] // 128) * 128
        buckets.setdefault(T_pad, []).append((utt, mel))

    def _gl(batch):
        return np.asarray(griffin_lim(
            jnp.asarray(batch), fs=fs, n_fft=n_fft, n_shift=n_shift,
            n_mels=n_mels, fmin=fmin, fmax=fmax, win_length=win_length,
            n_iter=n_iter))

    cpu_retry = False
    n = 0
    for T_pad in sorted(buckets):
        group = buckets[T_pad]
        for lo in range(0, len(group), batch_size):
            chunk = group[lo:lo + batch_size]
            batch = np.full((len(chunk), T_pad, n_mels),
                            np.log10(1e-10), np.float32)
            for b, (utt, mel) in enumerate(chunk):
                batch[b, :mel.shape[0]] = mel
            try:
                if cpu_retry:
                    raise RuntimeError("device previously failed")
                wav = _gl(batch)
            except Exception as e:  # noqa: BLE001 — any device failure:
                # retry on the host CPU, same pattern as the conversion
                # CLI's fallback (infer/convert.py _infer_with_fallback).
                # Observed need: the tunneled TPU backend raised
                # UNIMPLEMENTED on the Griffin-Lim irfft D2H (round 3).
                import jax
                if not cpu_retry:
                    print(f"device Griffin-Lim failed "
                          f"({type(e).__name__}: {e}); retrying on CPU")
                cpu_retry = True
                with jax.default_device(jax.devices("cpu")[0]):
                    wav = _gl(batch)
            for b, (utt, mel) in enumerate(chunk):
                n_samp = mel.shape[0] * n_shift
                x = wav[b, :n_samp]
                peak = np.abs(x).max()
                if peak > 1e-8:
                    x = x / peak * 0.95
                wavfile.write(out_dir / f"{utt}.wav", fs,
                              (x * 32767.0).astype(np.int16))
                n += 1
    return n


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("feats_scp", type=str)
    parser.add_argument("out_dir", type=str)
    parser.add_argument("--fs", type=int, required=True)
    parser.add_argument("--n_fft", type=int, default=1024)
    parser.add_argument("--n_shift", type=int, default=256)
    parser.add_argument("--n_mels", type=int, default=80)
    parser.add_argument("--fmin", type=float, default=None)
    parser.add_argument("--fmax", type=float, default=None)
    parser.add_argument("--win_length", type=int, default=None)
    parser.add_argument("--iters", type=int, default=64)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    n = convert_fbank(args.feats_scp, args.out_dir, fs=args.fs,
                      n_fft=args.n_fft, n_shift=args.n_shift,
                      n_mels=args.n_mels, fmin=args.fmin, fmax=args.fmax,
                      win_length=args.win_length, n_iter=args.iters)
    print(f"Synthesized {n} wavs to {args.out_dir}")


if __name__ == "__main__":
    main()
