"""Aligned (waveform, log-mel) segment dataset for vocoder training.

The external package the reference's ``voc=PWG`` path depends on trains on
(raw audio, mel) pairs with random aligned windows; this is the in-framework
equivalent over the Kaldi data-dir contract: reads ``wav.scp`` (plain paths
or trailing-pipe commands), resamples in-framework when needed
(data/features.resample — no sox, the repo-wide convention), extracts
log-mel with the experiment's fbank parameters (device-batched,
data/features.py), and yields random segments where mel frames
``[m0, m0+M)`` align with waveform samples ``[m0·hop, (m0+M)·hop)``.

Small corpora (≤ ``preload_limit`` utterances, default 4000) are decoded and
mel-extracted once up front; larger ones are loaded lazily per batch so a
full production corpus (e.g. AISHELL-3's 60k+ utterances at 44.1 kHz) never
has to fit in host memory.

Config keys: ``fs``, ``n_fft``, ``n_shift``, ``n_mels``, ``fmin``, ``fmax``
(the fbank set), ``batch_max_frames`` (mel frames per training segment;
waveform segment = ``batch_max_frames · n_shift`` samples), and
``preload_limit``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np


class WavMelDataset:
    def __init__(self, data_dir, config):
        from . import kaldi_io

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
        self.entries = list(kaldi_io.read_scp(scp).items())
        if not self.entries:
            raise ValueError(f"no wav.scp entries under {scp}")
        self.preload = len(self.entries) <= cfg.get("preload_limit", 4000)
        self.items = None  # (utt, wav (N,), mel (T, n_mels)) when preloaded
        if self.preload:
            self.items = [self._load(u, e) for u, e in self.entries]

    def _load(self, utt, entry):
        from . import kaldi_io
        from .features import logmelspectrogram, resample

        sr, x = kaldi_io.read_wav_scp_entry(entry)
        if x.ndim > 1:
            x = x[:, 0]
        x = resample(x, sr, self.fs)
        min_samples = (self.max_frames + 1) * self.hop
        if len(x) < min_samples:
            x = np.pad(x, (0, min_samples - len(x)))
        mel = np.asarray(logmelspectrogram(
            x[None].astype(np.float32), fs=self.fs, n_fft=self.n_fft,
            n_shift=self.hop, n_mels=self.n_mels, fmin=self.fmin,
            fmax=self.fmax))[0]
        return utt, x.astype(np.float32), mel

    def _get(self, k):
        if self.items is not None:
            return self.items[k]
        return self._load(*self.entries[k])

    def __len__(self):
        return len(self.entries)

    def padded_nbytes(self):
        """Bytes padded_arrays() will stage (the device-resident 'auto'
        size check uses this so the estimate can't drift from the layout)."""
        if not self.preload:
            raise ValueError("padded_nbytes() needs the preloaded mode")
        T_max = max(mel.shape[0] for _, _, mel in self.items)
        return len(self.items) * T_max * (self.hop + self.n_mels) * 4

    def padded_arrays(self):
        """Whole-corpus padded arrays for DEVICE-RESIDENT sampling.

        Returns (wavs (N, S), mels (N, T, D), m_hi (N,)) where ``m_hi[i]`` is
        the largest valid segment start (in mel frames) for utterance i.
        Staged into HBM once by the vocoder trainer, random crops are then
        gathered inside the jitted step — zero per-step host→device traffic
        (the dominant cost of small-step training on a remote backend).
        Requires the preloaded mode.
        """
        if not self.preload:
            raise ValueError("padded_arrays() needs the preloaded mode "
                             "(corpus <= preload_limit)")
        M = self.max_frames
        T_max = max(mel.shape[0] for _, _, mel in self.items)
        S_max = T_max * self.hop
        N = len(self.items)
        wavs = np.zeros((N, S_max), np.float32)
        mels = np.zeros((N, T_max, self.n_mels), np.float32)
        m_hi = np.zeros((N,), np.int32)
        for i, (_, x, mel) in enumerate(self.items):
            s = min(len(x), S_max)
            wavs[i, :s] = x[:s]
            mels[i, :mel.shape[0]] = mel
            m_hi[i] = max(min(mel.shape[0], len(x) // self.hop) - M, 0)
        return wavs, mels, m_hi

    def batches(self, batch_size, *, seed=0, epochs=None):
        """Yield (wav (B, M·hop), mel (B, M, n_mels)) random aligned crops.

        ``batch_size`` is clamped to the corpus size so a small corpus still
        yields batches every epoch (instead of an empty inner loop spinning
        forever)."""
        rng = np.random.default_rng(seed)
        batch_size = min(batch_size, len(self.entries))
        M = self.max_frames
        seg = M * self.hop
        epoch = 0
        while epochs is None or epoch < epochs:
            epoch += 1
            order = rng.permutation(len(self.entries))
            for lo in range(0, len(order) - batch_size + 1, batch_size):
                wavs = np.zeros((batch_size, seg), np.float32)
                mels = np.zeros((batch_size, M, self.n_mels), np.float32)
                for b, k in enumerate(order[lo:lo + batch_size]):
                    _, x, mel = self._get(k)
                    # mel frame t is centered at sample t·hop; usable frame
                    # range keeps the wav window inside the signal
                    m_hi = min(mel.shape[0], len(x) // self.hop) - M
                    m0 = int(rng.integers(0, max(m_hi, 0) + 1))
                    mels[b] = mel[m0:m0 + M]
                    wavs[b] = x[m0 * self.hop:(m0 + M) * self.hop]
                yield wavs, mels
