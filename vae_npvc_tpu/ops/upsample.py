"""Nearest-neighbor temporal upsample (reference: vae_npvc/model/vqvae2.py
:130-143 ``Model.upsample``): repeat each frame ``target_len // T`` times,
crop to ``target_len`` or edge-pad if short. Channels-last (B, T, C)."""

from __future__ import annotations

import jax.numpy as jnp


def nearest_upsample(z, target_len):
    """(B, T, C) -> (B, target_len, C) by frame repetition + crop/edge-pad."""
    T = z.shape[1]
    factor = max(target_len // T, 1)
    z = jnp.repeat(z, factor, axis=1)
    if z.shape[1] >= target_len:
        return z[:, :target_len]
    return jnp.pad(z, ((0, 0), (0, target_len - z.shape[1]), (0, 0)),
                   mode="edge")


def nearest_upsample_masked(z, target_len, in_len, out_len):
    """Length-aware variant for padded batches: reproduces the reference's
    repeat-by-``out_len // in_len``-then-crop/edge-pad semantics on the REAL
    (unpadded) lengths of each batch row, so a padded run matches the
    unpadded per-utterance run exactly. Positions >= out_len replicate the
    last real frame (they are masked downstream anyway).

    z: (B, T_pad_in, C); in_len/out_len: (B,) real frame counts.
    """
    in_len = jnp.asarray(in_len, jnp.int32)
    out_len = jnp.asarray(out_len, jnp.int32)
    factor = jnp.maximum(out_len // jnp.maximum(in_len, 1), 1)
    j = jnp.arange(target_len, dtype=jnp.int32)[None, :]
    idx = jnp.minimum(j // factor[:, None], in_len[:, None] - 1)
    return jnp.take_along_axis(z, idx[..., None], axis=1)
