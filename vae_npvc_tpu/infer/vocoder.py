"""Vocoder backends: Griffin-Lim (in-framework) + optional Parallel WaveGAN.

The reference recipe's ``voc=PWG``/``voc=MG`` path shells out to the
``parallel-wavegan-normalize``/``parallel-wavegan-decode`` CLIs of the
``parallel_wavegan`` package with a downloaded pretrained model (reference:
egs/vcc20/vae1/run.sh:192-239). That package and its checkpoints are not in
this environment (and can't be downloaded), so this module provides:

- ``griffin_lim_scp``: the always-available backend (wraps
  data/features.griffin_lim over a denormalized feats.scp);
- ``pwg_decode_scp``: an optional-import shim — if ``parallel_wavegan`` IS
  installed (a real deployment), it loads the checkpoint and vocodes each
  utterance's mel in-process (the library-API equivalent of the reference's
  two CLI calls, including the per-model mean/scale feature normalization);
  otherwise it raises ImportError with instructions, keeping the ``voc=PWG``
  recipe flag wired rather than silently absent.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


def griffin_lim_scp(feats_scp, out_dir, *, fs, n_fft, n_shift, n_mels,
                    fmin=None, fmax=None, iters=64):
    """Griffin-Lim every utterance of a denormalized log-mel feats.scp."""
    from ..bin.convert_fbank import convert_fbank

    return convert_fbank(feats_scp, out_dir, fs=fs, n_fft=n_fft,
                         n_shift=n_shift, n_mels=n_mels, fmin=fmin,
                         fmax=fmax, n_iter=iters)


def pwg_decode_scp(feats_scp, out_dir, voc_expdir):
    """Parallel WaveGAN decode (optional dependency).

    ``voc_expdir`` follows the reference layout: newest ``*.pkl`` checkpoint,
    ``config.yml``, ``stats.h5`` (run.sh:206-209).
    """
    try:
        import torch
        import yaml
        from parallel_wavegan.utils import load_model, read_hdf5
    except ImportError as e:  # pragma: no cover - optional dependency
        raise ImportError(
            "the voc=PWG path needs the 'parallel_wavegan' package and a "
            "pretrained model directory (reference run.sh:192-239); install "
            "parallel_wavegan and place the model under exp/parallel_wavegan "
            "or use the Griffin-Lim backend (voc=GL)") from e

    from ..data import kaldi_io

    voc_expdir = Path(voc_expdir)
    ckpts = sorted(voc_expdir.glob("**/*.pkl"),
                   key=lambda p: p.stat().st_mtime)
    confs = sorted(voc_expdir.glob("**/config.yml"))
    stats = sorted(voc_expdir.glob("**/stats.h5"))
    if not (ckpts and confs and stats):
        raise FileNotFoundError(
            f"{voc_expdir} must hold *.pkl, config.yml, stats.h5")
    config = yaml.safe_load(open(confs[0]))
    model = load_model(str(ckpts[-1]), config)
    model.remove_weight_norm()
    model.eval()
    mean = read_hdf5(str(stats[0]), "mean")
    scale = read_hdf5(str(stats[0]), "scale")

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    fs = config["sampling_rate"]
    n = 0
    with torch.no_grad():
        for utt, rx in kaldi_io.read_scp(feats_scp).items():
            mel = (kaldi_io.load_mat(rx) - mean) / scale
            wav = model.inference(torch.from_numpy(
                mel.astype(np.float32))).view(-1).cpu().numpy()
            _write_wav(out_dir / f"{utt}.wav", wav, fs)
            n += 1
    return n


def _write_wav(path, x, fs):
    import wave

    pcm = (np.clip(x, -1.0, 1.0) * 32767).astype("<i2")
    with wave.open(str(path), "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(fs)
        w.writeframes(pcm.tobytes())
