"""Conversion real-time-factor harness.

Measures the any-to-many conversion path (source mel → latent → target-speaker
decode) end to end through the Converter, reporting RTF = processing time /
audio time. The BASELINE.json target is RTF < 0.05 on one v5e chip; the
reference runs utterances serially per-GPU with no reported number
(reference: vae_npvc/decoder/basic.py:58-75).
"""

from __future__ import annotations

import time

import numpy as np


def measure_rtf(converter, feats, lengths, targets, frame_rate_hz,
                warmup=2, repeats=5):
    """RTF of one padded batch through the converter's jitted infer.

    ``feats`` (B, T, D), ``lengths`` (B,), ``targets`` (B,). Returns
    (rtf, frames_per_sec).
    """
    import jax
    import jax.numpy as jnp

    feats = jnp.asarray(feats)
    lengths_j = jnp.asarray(lengths, jnp.int32)
    targets = jnp.asarray(targets, jnp.int32)
    out = None
    for _ in range(warmup):
        out = converter._infer_jit(converter.variables, feats, targets,
                                   lengths_j)
    if out is not None:
        np.asarray(out)  # hard sync

    t0 = time.perf_counter()
    for _ in range(repeats):
        out = converter._infer_jit(converter.variables, feats, targets,
                                   lengths_j)
    np.asarray(out)
    dt = (time.perf_counter() - t0) / repeats

    total_frames = int(np.sum(lengths))
    audio_seconds = total_frames / frame_rate_hz
    return dt / audio_seconds, total_frames / dt
