"""In-framework Parallel-WaveGAN-style neural vocoder.

The reference's ``voc=PWG`` recipe path depends on the *external*
``parallel_wavegan`` package with a downloaded pretrained model (reference:
egs/vcc20/vae1/run.sh:192-239 — ``parallel-wavegan-normalize`` +
``parallel-wavegan-decode``); nothing vocoder-shaped exists in the reference
repo itself. This module makes the capability native: a non-autoregressive
WaveNet generator (gated dilated convs conditioned on upsampled log-mel,
noise input) and a dilated-conv waveform discriminator, per Yamamoto et al.
(ICASSP 2020). Everything is channels-last static-shape convs, so the whole
generator is one fused XLA program on the MXU — parallel waveform synthesis
is exactly the workload TPUs like.

Architecture keys (published defaults): ``layers`` 30, ``stacks`` 3,
``residual_channels`` 64, ``gate_channels`` 128, ``skip_channels`` 64,
``aux_channels`` (= n_mels) 80, ``kernel_size`` 3, ``upsample_scales``
(product = hop size). Discriminator: ``disc_layers`` 10, ``disc_channels``
64 (kernel 3, dilation = layer index, LeakyReLU 0.2).
"""

from __future__ import annotations

import math
from typing import Any, Mapping, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import WNConv1d


class MelUpsampler(nn.Module):
    """(B, T_mel, C) → (B, T_mel·prod(scales), C) nearest repeat + smoothing.

    Each stage repeats by its scale then smooths with a weight-normed conv of
    kernel ``2·scale + 1`` (the conv analog of the published interpolation +
    Conv2d smoothing stack).
    """
    scales: Sequence[int]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, c):
        for i, s in enumerate(self.scales):
            c = jnp.repeat(c, s, axis=1)
            c = WNConv1d(c.shape[-1], 2 * s + 1, dtype=self.dtype,
                         name=f"smooth_{i}")(c)
        return c


class PWGGenerator(nn.Module):
    """Noise (B, T, 1) + mel (B, T_mel, aux) → waveform (B, T, 1)."""
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, z, c):
        a = dict(self.arch)
        layers = a.get("layers", 30)
        stacks = a.get("stacks", 3)
        res_ch = a.get("residual_channels", 64)
        gate_ch = a.get("gate_channels", 128)
        skip_ch = a.get("skip_channels", 64)
        kernel = a.get("kernel_size", 3)
        scales = a.get("upsample_scales", (4, 4, 4, 4))
        cycle = layers // stacks

        c_up = MelUpsampler(scales, dtype=self.dtype, name="upsample")(
            c.astype(self.dtype))
        # static-shape contract: noise length == T_mel * hop
        assert c_up.shape[1] == z.shape[1], (c_up.shape, z.shape)

        x = WNConv1d(res_ch, 1, dtype=self.dtype, name="in")(
            z.astype(self.dtype))
        skips = 0.0
        for i in range(layers):
            d = 2 ** (i % cycle)
            h = WNConv1d(gate_ch, kernel, dilation=d, dtype=self.dtype,
                         name=f"dil_{i}")(x)
            h = h + WNConv1d(gate_ch, 1, dtype=self.dtype,
                             name=f"cond_{i}")(c_up)
            ha, hb = jnp.split(h, 2, axis=-1)
            g = jnp.tanh(ha) * jax.nn.sigmoid(hb)
            # published residual blocks scale (x + residual) by sqrt(0.5) to
            # keep trunk variance constant across the 30 layers
            x = (x + WNConv1d(res_ch, 1, dtype=self.dtype,
                              name=f"res_{i}")(g)) * jnp.asarray(
                                  math.sqrt(0.5), x.dtype)
            skips = skips + WNConv1d(skip_ch, 1, dtype=self.dtype,
                                     name=f"skip_{i}")(g)
        h = nn.relu(skips * (1.0 / math.sqrt(layers)))
        h = nn.relu(WNConv1d(skip_ch, 1, dtype=self.dtype, name="out_0")(h))
        wav = WNConv1d(1, 1, dtype=self.dtype, name="out_1")(h)
        return wav.astype(jnp.float32)


class PWGDiscriminator(nn.Module):
    """Waveform (B, T, 1) → per-sample logits (B, T, 1) (LSGAN targets)."""
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x):
        a = dict(self.arch)
        layers = a.get("disc_layers", 10)
        ch = a.get("disc_channels", 64)
        kernel = a.get("disc_kernel_size", 3)
        h = x.astype(self.dtype)
        for i in range(layers - 1):
            d = max(i, 1)
            h = WNConv1d(ch, kernel, dilation=d, dtype=self.dtype,
                         name=f"conv_{i}")(h)
            h = nn.leaky_relu(h, 0.2)
        out = WNConv1d(1, kernel, dtype=self.dtype,
                       name=f"conv_{layers - 1}")(h)
        return out.astype(jnp.float32)
