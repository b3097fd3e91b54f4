"""Device-side feature extraction: STFT → log10-mel fbank, and the inverse.

Replaces the external ESPnet/Kaldi feature binaries the reference recipes
depend on (reference: egs/vcc20/vae1/run.sh:92-103 invokes ESPnet
``make_fbank.sh``; SURVEY.md §2.3). Spec matches ESPnet's
``logmelspectrogram`` transform (hann window, centered frames with reflect
padding, |STFT|, slaney-normalized mel filterbank over [fmin, fmax],
``log10(max(eps, mel))``), so features are interchangeable with the
reference pipeline's.

TPU-first design: batched utterances are framed with a strided gather and the
whole chain (frame → window → rfft → mel matmul → log) is one jittable function
— the mel projection is an (F, M) matmul that rides the MXU; extraction can run
on-device as part of the input pipeline instead of a 64-job Kaldi array.
"""

from __future__ import annotations

import functools
import math

import numpy as np

EPS = 1e-10


# ---------------------------------------------------------------------------
# mel filterbank (host-side numpy, computed once)
# ---------------------------------------------------------------------------

def hz_to_mel(f):
    """Slaney mel scale (librosa default, htk=False)."""
    f = np.asarray(f, dtype=np.float64)
    f_sp = 200.0 / 3
    mel = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep, mel)


def mel_to_hz(m):
    m = np.asarray(m, dtype=np.float64)
    f_sp = 200.0 / 3
    freq = m * f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = math.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)), freq)


@functools.lru_cache(maxsize=16)
def mel_filterbank(sr, n_fft, n_mels, fmin=0.0, fmax=None):
    """(n_mels, n_fft//2+1) slaney-normalized triangular filterbank.

    Cached per parameter set: the lazy per-utterance wav-mel path calls
    this once per load, and rebuilding the (n_mels, F) matrix 60k times per
    epoch is pure waste."""
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sr / 2.0, n_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin), hz_to_mel(fmax), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])  # slaney norm
    return (weights * enorm[:, None]).astype(np.float32)


# ---------------------------------------------------------------------------
# device-side STFT / fbank
# ---------------------------------------------------------------------------

def resample(x, sr, fs):
    """Polyphase-resample ``x`` from rate ``sr`` to ``fs`` (no-op if equal).

    The in-framework replacement for the reference's sox resample pipes
    (reference: egs/vcc20/vae1/local/generate_vctk_list.py:54); shared by
    every wav-reading front-end.
    """
    sr, fs = int(sr), int(fs)
    if sr == fs:
        return np.asarray(x, np.float32)
    from scipy.signal import resample_poly

    g = math.gcd(fs, sr)
    return resample_poly(x, fs // g, sr // g).astype(np.float32)


def num_frames(n_samples, n_shift):
    """Frame count for centered STFT (matches librosa: 1 + n//hop)."""
    return 1 + n_samples // n_shift


def stft_magnitude(x, n_fft, n_shift, win_length=None, window="hann",
                   center=True):
    """|STFT| of (B, N) → (B, T, n_fft//2+1), centered, reflect-padded.

    ``center=False`` skips the reflect padding and frames the raw signal
    (frame t = x[t·shift : t·shift + n_fft], T = 1 + (N − n_fft)//shift):
    the streaming front-end (serve/streaming.py) manages padding itself so
    interior frames are bit-identical to the offline centered transform.
    """
    import jax.numpy as jnp

    win_length = win_length or n_fft
    B, N = x.shape
    if center:
        pad = n_fft // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
        T = num_frames(N, n_shift)
    else:
        if N < n_fft:
            # T would be ≤ 0 and the transform would silently return an
            # empty spectrogram; streaming callers size their blocks to
            # (F−1)·shift + n_fft, so this is always a caller bug
            raise ValueError(f"center=False needs ≥ n_fft={n_fft} samples, "
                             f"got {N}")
        xp = x
        T = 1 + (N - n_fft) // n_shift
    starts = jnp.arange(T) * n_shift
    idx = starts[:, None] + jnp.arange(n_fft)[None, :]
    frames = xp[:, idx]                       # (B, T, n_fft) gather
    if window == "hann":
        w = jnp.asarray(np.hanning(win_length + 1)[:-1].astype(np.float32))
    elif window is None:
        w = jnp.ones((win_length,), jnp.float32)
    else:
        raise ValueError(f"unknown window {window!r}")
    if win_length < n_fft:  # center the window in the fft frame (librosa)
        lpad = (n_fft - win_length) // 2
        w = jnp.pad(w, (lpad, n_fft - win_length - lpad))
    spec = jnp.fft.rfft(frames * w, n=n_fft, axis=-1)
    return jnp.abs(spec)


def logmelspectrogram(x, *, fs, n_fft, n_shift, n_mels=80, fmin=None,
                      fmax=None, win_length=None, window="hann",
                      center=True):
    """(B, N) waveform → (B, T, n_mels) log10-mel, ESPnet-compatible."""
    import jax.numpy as jnp

    spc = stft_magnitude(x, n_fft, n_shift, win_length, window, center)
    mel = mel_filterbank(fs, n_fft, n_mels, fmin or 0.0, fmax)
    out = jnp.einsum("btf,mf->btm", spc, jnp.asarray(mel))
    return jnp.log10(jnp.maximum(EPS, out))


# ---------------------------------------------------------------------------
# inverse: mel → linear → Griffin-Lim (reference: ESPnet convert_fbank.sh /
# Griffin-Lim synthesis path, egs/vcc20/vae1/run.sh:177-190)
# ---------------------------------------------------------------------------

def istft(spec, n_fft, n_shift, win_length=None, window="hann", length=None):
    """Inverse STFT with hann-squared overlap-add normalization.

    ``spec`` complex (B, T, n_fft//2+1) → (B, N).
    """
    import jax.numpy as jnp

    win_length = win_length or n_fft
    B, T, _ = spec.shape
    w = np.hanning(win_length + 1)[:-1].astype(np.float32)
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = np.pad(w, (lpad, n_fft - win_length - lpad))
    wj = jnp.asarray(w)
    frames = jnp.fft.irfft(spec, n=n_fft, axis=-1) * wj  # (B, T, n_fft)

    N_pad = (T - 1) * n_shift + n_fft
    starts = np.arange(T) * n_shift
    idx = (starts[:, None] + np.arange(n_fft)[None, :]).reshape(-1)
    out = jnp.zeros((B, N_pad), frames.dtype).at[:, idx].add(
        frames.reshape(B, -1))
    norm = jnp.zeros((N_pad,), jnp.float32).at[idx].add(
        jnp.tile(wj * wj, T))
    out = out / jnp.maximum(norm, 1e-10)
    pad = n_fft // 2
    out = out[:, pad:]
    if length is not None:
        out = out[:, :length]
    return out


def griffin_lim(log_mel, *, fs, n_fft, n_shift, n_mels=80, fmin=None,
                fmax=None, win_length=None, n_iter=64, length=None, seed=0):
    """log10-mel (B, T, M) → waveform (B, N) via Griffin-Lim phase recovery."""
    import jax
    import jax.numpy as jnp

    inv = jnp.asarray(np.maximum(
        0.0, np.linalg.pinv(mel_filterbank(fs, n_fft, n_mels,
                                           fmin or 0.0, fmax))))  # (F, M)
    mag = jnp.einsum("btm,fm->btf", jnp.power(10.0, log_mel), inv)
    mag = jnp.maximum(mag, 1e-10)

    key = jax.random.PRNGKey(seed)
    phase = jax.random.uniform(key, mag.shape, minval=-np.pi, maxval=np.pi)
    spec = mag * jnp.exp(1j * phase)

    def body(_, spec):
        x = istft(spec, n_fft, n_shift, win_length)
        rebuilt = _stft_complex(x, n_fft, n_shift, win_length)
        rebuilt = rebuilt[:, :mag.shape[1]]
        angles = rebuilt / jnp.maximum(jnp.abs(rebuilt), 1e-10)
        return mag * angles

    spec = jax.lax.fori_loop(0, n_iter, body, spec)
    return istft(spec, n_fft, n_shift, win_length, length=length)


def _stft_complex(x, n_fft, n_shift, win_length=None):
    import jax.numpy as jnp

    win_length = win_length or n_fft
    B, N = x.shape
    pad = n_fft // 2
    xp = jnp.pad(x, ((0, 0), (pad, pad)), mode="reflect")
    T = num_frames(N, n_shift)
    idx = (jnp.arange(T) * n_shift)[:, None] + jnp.arange(n_fft)[None, :]
    frames = xp[:, idx]
    w = jnp.asarray(np.hanning(win_length + 1)[:-1].astype(np.float32))
    if win_length < n_fft:
        lpad = (n_fft - win_length) // 2
        w = jnp.pad(w, (lpad, n_fft - win_length - lpad))
    return jnp.fft.rfft(frames * w, n=n_fft, axis=-1)
