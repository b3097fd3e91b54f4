"""Aligned (waveform, log-mel) segment dataset for vocoder training.

The external package the reference's ``voc=PWG`` path depends on trains on
(raw audio, mel) pairs with random aligned windows; this is the in-framework
equivalent over the Kaldi data-dir contract: reads ``wav.scp`` (plain paths
or trailing-pipe commands), resamples in-framework when needed (scipy
polyphase — no sox, the repo-wide convention from bin/make_fbank), extracts
log-mel with the experiment's fbank parameters on the fly (device-batched,
data/features.py), and yields random segments where mel frames
``[m0, m0+M)`` align with waveform samples ``[m0·hop, (m0+M)·hop)``.

Config keys: ``fs``, ``n_fft``, ``n_shift``, ``n_mels``, ``fmin``, ``fmax``
(the fbank set) and ``batch_max_frames`` (mel frames per training segment;
waveform segment = ``batch_max_frames · n_shift`` samples).
"""

from __future__ import annotations

from math import gcd
from pathlib import Path

import numpy as np


class WavMelDataset:
    def __init__(self, data_dir, config):
        from . import kaldi_io
        from .features import logmelspectrogram

        cfg = dict(config)
        self.fs = cfg.get("fs", 24000)
        self.n_fft = cfg.get("n_fft", 1024)
        self.hop = cfg.get("n_shift", 256)
        self.n_mels = cfg.get("n_mels", 80)
        self.fmin = cfg.get("fmin")
        self.fmax = cfg.get("fmax")
        self.max_frames = cfg.get("batch_max_frames", 48)

        data_dir = Path(data_dir)
        scp = data_dir / "wav.scp" if data_dir.is_dir() else data_dir
        self.items = []  # (utt, wav float32 (N,), mel float32 (T, n_mels))
        min_samples = (self.max_frames + 1) * self.hop
        for utt, entry in kaldi_io.read_scp(scp).items():
            sr, x = kaldi_io.read_wav_scp_entry(entry)
            if x.ndim > 1:
                x = x[:, 0]
            if sr != self.fs:
                from scipy.signal import resample_poly
                g = gcd(int(self.fs), int(sr))
                x = resample_poly(x, self.fs // g, sr // g).astype(np.float32)
            if len(x) < min_samples:
                x = np.pad(x, (0, min_samples - len(x)))
            mel = np.asarray(logmelspectrogram(
                x[None].astype(np.float32), fs=self.fs, n_fft=self.n_fft,
                n_shift=self.hop, n_mels=self.n_mels, fmin=self.fmin,
                fmax=self.fmax))[0]
            self.items.append((utt, x.astype(np.float32), mel))
        if not self.items:
            raise ValueError(f"no usable wavs under {scp}")

    def __len__(self):
        return len(self.items)

    def batches(self, batch_size, *, seed=0, epochs=None):
        """Yield (wav (B, M·hop), mel (B, M, n_mels)) random aligned crops."""
        rng = np.random.default_rng(seed)
        M = self.max_frames
        seg = M * self.hop
        epoch = 0
        while epochs is None or epoch < epochs:
            epoch += 1
            order = rng.permutation(len(self.items))
            for lo in range(0, len(order) - batch_size + 1, batch_size):
                wavs = np.zeros((batch_size, seg), np.float32)
                mels = np.zeros((batch_size, M, self.n_mels), np.float32)
                for b, k in enumerate(order[lo:lo + batch_size]):
                    _, x, mel = self.items[k]
                    # mel frame t is centered at sample t·hop; usable frame
                    # range keeps the wav window inside the signal
                    m_hi = min(mel.shape[0], len(x) // self.hop) - M
                    m0 = int(rng.integers(0, max(m_hi, 0) + 1))
                    mels[b] = mel[m0:m0 + M]
                    wavs[b] = x[m0 * self.hop:(m0 + M) * self.hop]
                yield wavs, mels
