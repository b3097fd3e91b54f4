"""Mel-cepstral distortion with DTW alignment.

Self-contained analog of the reference's objective evaluation stage
(reference: egs/vcc20/vae1/local/ob_eval/evaluate.sh:57-69 drives an external
``mcd_calculate.py`` over WORLD mceps). This environment has no WORLD/pysptk,
so cepstra are computed as the DCT-II of the log-mel features — the standard
MCD formula 10/ln10 · sqrt(2 · Σ_d (c1_d − c2_d)²) over DTW-aligned frames,
excluding c0 (energy), averaged over the aligned path.
"""

from __future__ import annotations

import math

import numpy as np

MCD_CONST = 10.0 / math.log(10.0) * math.sqrt(2.0)


def mel_to_cepstra(log_mel, n_cep=25):
    """(T, M) log10-mel → (T, n_cep) cepstra via orthonormal DCT-II."""
    T, M = log_mel.shape
    n = np.arange(M)
    k = np.arange(n_cep)
    basis = np.cos(np.pi * (n[None, :] + 0.5) * k[:, None] / M)  # (n_cep, M)
    basis *= np.sqrt(2.0 / M)
    basis[0] /= np.sqrt(2.0)
    # convert log10 to ln for conventional cepstra scaling
    return (log_mel * math.log(10.0)) @ basis.T


def dtw_path(cost):
    """Classic DTW over a (T1, T2) local-cost matrix → list of (i, j)."""
    T1, T2 = cost.shape
    acc = np.full((T1 + 1, T2 + 1), np.inf)
    acc[0, 0] = 0.0
    for i in range(1, T1 + 1):
        c = cost[i - 1]
        for j in range(1, T2 + 1):
            acc[i, j] = c[j - 1] + min(acc[i - 1, j], acc[i, j - 1],
                                       acc[i - 1, j - 1])
    path = []
    i, j = T1, T2
    while i > 0 and j > 0:
        path.append((i - 1, j - 1))
        moves = (acc[i - 1, j - 1], acc[i - 1, j], acc[i, j - 1])
        m = int(np.argmin(moves))
        if m == 0:
            i, j = i - 1, j - 1
        elif m == 1:
            i -= 1
        else:
            j -= 1
    path.reverse()
    return path


def mcd(log_mel_a, log_mel_b, n_cep=25, use_dtw=True):
    """MCD (dB) between two (T, M) log10-mel matrices."""
    ca = mel_to_cepstra(np.asarray(log_mel_a, np.float64), n_cep)[:, 1:]
    cb = mel_to_cepstra(np.asarray(log_mel_b, np.float64), n_cep)[:, 1:]
    if use_dtw and ca.shape[0] != cb.shape[0]:
        diff = ca[:, None, :] - cb[None, :, :]
        cost = np.sqrt(np.sum(diff ** 2, axis=-1))
        path = dtw_path(cost)
        d = np.array([cost[i, j] for i, j in path])
    else:
        T = min(ca.shape[0], cb.shape[0])
        d = np.sqrt(np.sum((ca[:T] - cb[:T]) ** 2, axis=-1))
    return MCD_CONST / math.sqrt(2.0) * float(np.mean(d))


def mcd_from_scp(scp_a, scp_b, n_cep=25):
    """Mean MCD over utterances shared by two feats.scp files."""
    from ..data import kaldi_io

    a = kaldi_io.read_scp(scp_a)
    b = kaldi_io.read_scp(scp_b)
    utts = [u for u in a if u in b]
    if not utts:
        raise ValueError("no shared utterances between the two scps")
    per_utt = {u: mcd(kaldi_io.load_mat(a[u]), kaldi_io.load_mat(b[u]),
                      n_cep) for u in utts}
    return float(np.mean(list(per_utt.values()))), per_utt
