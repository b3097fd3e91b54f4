"""Fbank extraction CLI: wav.scp → log-mel feature arks + utt2num_frames.

Replaces the reference's external ESPnet ``make_fbank.sh`` Kaldi job array
(reference: egs/vcc20/vae1/run.sh:92-103; SURVEY.md §2.3) with in-framework,
device-batched extraction: waveforms are decoded on the host, length-bucketed,
and the STFT→mel→log chain runs as one jitted XLA computation per bucket.

Usage:
    python -m vae_npvc_tpu.bin.make_fbank --fs 24000 --n_fft 1024 \
        --n_shift 256 --n_mels 80 --fmin 80 --fmax 7600 data/train fbank/train
"""

from __future__ import annotations

import argparse
from pathlib import Path

import numpy as np


def make_fbank(data_dir, out_dir, *, fs, n_fft, n_shift, n_mels=80,
               fmin=None, fmax=None, win_length=None, batch_frames=200000,
               compress=False, pitch=False, group_utts=512):
    """``pitch=True`` appends the 3-dim Kaldi-style pitch features
    [pov, normalized-log-pitch, delta-pitch] per frame — the in-framework
    ``make_fbank_pitch.sh`` (reference eval-ASR feature chain,
    evaluate.sh:110-115 + conf/pitch.conf; extractor in data/pitch.py)."""
    import jax
    import jax.numpy as jnp

    from ..data import kaldi_io
    from ..data.features import logmelspectrogram, num_frames

    data_dir, out_dir = Path(data_dir), Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    wav_scp = kaldi_io.load_dict_data(data_dir / "wav.scp")

    extract = jax.jit(lambda x: logmelspectrogram(
        x, fs=fs, n_fft=n_fft, n_shift=n_shift, n_mels=n_mels,
        fmin=fmin, fmax=fmax, win_length=win_length))

    # bucket utterances by padded sample count to bound compiled shapes
    def bucket_samples(n):
        b = 1 << 14
        while b < n:
            b <<= 1
        return b

    def load(utt_entry):
        utt, entry = utt_entry
        sr, x = kaldi_io.read_wav_scp_entry(entry)
        if x.ndim > 1:
            x = x.mean(axis=1)
        if sr != fs:
            # in-framework polyphase resample (the reference shells out to
            # sox pipes in wav.scp, generate_vctk_list.py:54; no sox needed)
            from ..data.features import resample
            x = resample(x, sr, fs)
        return utt, x

    # stream in bounded groups: decoding the whole corpus up front would
    # need tens of GB of host RAM at real-corpus scale (the Kaldi job array
    # this replaces streams). Bucket shapes are powers of two, so the jit
    # cache is shared across groups.
    entries = list(wav_scp.items())
    n_written = 0
    with kaldi_io.ArkWriter(out_dir / "feats_raw.ark", out_dir / "feats.scp",
                            compression_method=1 if compress else None) as w, \
            open(out_dir / "utt2num_frames", "w") as unf:
      for glo in range(0, len(entries), group_utts):
        items = [load(e) for e in entries[glo:glo + group_utts]]
        buckets: dict[int, list] = {}
        for utt, x in items:
            buckets.setdefault(bucket_samples(len(x)), []).append((utt, x))
        for pad_n in sorted(buckets):
            group = buckets[pad_n]
            bsz = max(1, batch_frames // num_frames(pad_n, n_shift))
            for lo in range(0, len(group), bsz):
                chunk = group[lo:lo + bsz]
                batch = np.zeros((len(chunk), pad_n), np.float32)
                for i, (utt, x) in enumerate(chunk):
                    batch[i, :len(x)] = x
                feats = np.asarray(extract(jnp.asarray(batch)))
                for i, (utt, x) in enumerate(chunk):
                    T = num_frames(len(x), n_shift)
                    out = feats[i, :T].astype(np.float32)
                    if pitch:
                        from ..data.pitch import pitch_feats

                        pf = pitch_feats(
                            x, fs, n_frames=T,
                            frame_shift_ms=1000.0 * n_shift / fs)
                        out = np.concatenate([out, pf], axis=1)
                    w.write(utt, out)
                    unf.write(f"{utt} {T}\n")
                    n_written += 1
    # propagate speaker files for downstream tools
    for f in ("utt2spk", "spk2utt"):
        if (data_dir / f).exists():
            (out_dir / f).write_text((data_dir / f).read_text())
    return n_written


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("data_dir", help="Kaldi data dir with wav.scp")
    parser.add_argument("out_dir", help="output dir for feats.scp/ark")
    parser.add_argument("--fs", type=int, required=True)
    parser.add_argument("--n_fft", type=int, default=1024)
    parser.add_argument("--n_shift", type=int, default=256)
    parser.add_argument("--n_mels", type=int, default=80)
    parser.add_argument("--fmin", type=float, default=None)
    parser.add_argument("--fmax", type=float, default=None)
    parser.add_argument("--win_length", type=int, default=None)
    parser.add_argument("--compress", action="store_true")
    parser.add_argument("--pitch", action="store_true",
                        help="append 3-dim Kaldi-style pitch features "
                             "(make_fbank_pitch.sh analog)")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu) for extraction")
    args = parser.parse_args()
    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)
    n = make_fbank(args.data_dir, args.out_dir, fs=args.fs, n_fft=args.n_fft,
                   n_shift=args.n_shift, n_mels=args.n_mels, fmin=args.fmin,
                   fmax=args.fmax, win_length=args.win_length,
                   compress=args.compress, pitch=args.pitch)
    print(f"Wrote {n} utterances to {args.out_dir}")


if __name__ == "__main__":
    main()
