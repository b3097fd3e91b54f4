"""Gaussian (non-quantized) speaker-conditioned VAE.

The reference ships the full Gaussian-VAE toolkit — ``GaussianSampler``,
``GaussianKLD``, ``kl_loss``, ``GaussianLogDensity`` (reference:
vae_npvc/model/layers.py:252-281) — but no shipped config wires it into a
model (SURVEY.md §2.1 "the Gaussian-VAE toolkit, present but unused").
BASELINE.json's benchmark configs include a Gaussian-VAE NPVC run, so this is
the realized model: same encoder/decoder stacks as the flat VQ-VAE, with the
bottleneck replaced by a diagonal-Gaussian reparameterized latent and a KL
term.

Config keys: the flat-model keys plus ``kld_weight`` (β, default 1.0); the
encoder's ``z_channels`` must be ``2 * z_dim`` (mu ‖ logvar).
Loss: ``X like + kld_weight · KLD/(B·T)`` with detail keys
{Total, KLD loss, X like}.
"""

from __future__ import annotations

from typing import Any, Mapping

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..nn.blocks import Conditions
from ..ops.losses import gaussian_sample, kl_loss, log_loss
from .vqvae import Decoder, Encoder


class Model(nn.Module):
    arch: Mapping[str, Any]
    dtype: Any = jnp.float32

    def setup(self):
        a = dict(self.arch)
        self.encoder = Encoder(a.get("encoder", {}), dtype=self.dtype)
        self.decoder = Decoder(a.get("decoder", {}), dtype=self.dtype)
        self.embeds = Conditions(a.get("y_num", 10), a.get("y_dim", 128),
                                 normalize=False, dtype=self.dtype)
        self.z_dim = a.get("z_dim", 128)
        self.kld_weight = a.get("kld_weight", a.get("beta", 1.0))

    def _posterior(self, x, lengths=None):
        h = self.encoder(x.astype(self.dtype), lengths).astype(jnp.float32)
        mu, logvar = h[..., :self.z_dim], h[..., self.z_dim:]
        return mu, logvar

    def __call__(self, x, y_idx, train: bool = True):
        B, T, D = x.shape
        y = self.embeds(y_idx.reshape(y_idx.shape[0], -1)[:, 0])[:, None, :]
        mu, logvar = self._posterior(x)
        if train:
            z = gaussian_sample(self.make_rng("vq"), mu, logvar)
        else:
            z = mu
        xhat = self.decoder(z.astype(self.dtype), y).astype(jnp.float32)
        x_loss = log_loss(xhat, x.astype(jnp.float32))
        kld = kl_loss(mu, logvar) / (B * T)          # frame-mean KL
        loss = x_loss + self.kld_weight * kld
        detail = {"Total": loss, "KLD loss": kld, "X like": x_loss}
        return xhat, loss, detail

    def encode(self, x, lengths=None):
        """Deterministic latent (posterior mean), (B, T, z_dim)."""
        return self._posterior(x, lengths)[0]

    def decode(self, z, y_idx, lengths=None):
        y = self.embeds(y_idx.reshape(y_idx.shape[0], -1)[:, 0])[:, None, :]
        return self.decoder(z.astype(self.dtype), y,
                            lengths).astype(jnp.float32)

    def infer(self, x, y_idx, lengths=None):
        # latent time axis is shorter than the input for strided encoder
        # configs — transform lengths so decoder masks/GroupNorm stats are
        # computed against the latent frame count (as vqvae.Model.infer does)
        z_lengths = (Encoder.out_lengths(dict(self.arch).get("encoder", {}),
                     lengths) if lengths is not None else None)
        return self.decode(self.encode(x, lengths), y_idx, z_lengths)
