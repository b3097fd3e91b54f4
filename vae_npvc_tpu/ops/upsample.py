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
