"""Conv discriminator for the WGAN-GP trainer.

The reference's adversarial trainer imports a ``Discriminator`` from a module
path that does not exist (reference: vae_npvc/trainer/wgan_gp.py:44-48 —
legacy capability spec, SURVEY.md §2.1). This is the working TPU-native
realization: a strided LeakyReLU conv stack over (B, T, D) mels ending in a
per-sample scalar critic score. No normalization layers (WGAN-GP penalizes the
critic's gradient directly, which norm layers would distort).
"""

from __future__ import annotations

from typing import Any, Mapping

import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import WNConv1d


class Discriminator(nn.Module):
    """(B, T, D) → (B,) critic scores."""
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = dict(self.arch)
        channels = a.get("channels", [128, 256, 512])
        kernel_size = a.get("kernel_size", 5)
        strides = a.get("strides", [2] * len(channels))
        use_wn = a.get("use_weight_norm", False)

        h = x.astype(self.dtype)
        for i, (ch, st) in enumerate(zip(channels, strides)):
            h = WNConv1d(ch, kernel_size, stride=st,
                         padding=((kernel_size - 1) // 2,
                                  (kernel_size - 1) // 2),
                         use_weight_norm=use_wn, dtype=self.dtype,
                         name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        h = WNConv1d(1, 1, use_weight_norm=use_wn, dtype=self.dtype,
                     name="head")(h)
        return jnp.mean(h.astype(jnp.float32), axis=(1, 2))
